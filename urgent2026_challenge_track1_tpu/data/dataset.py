"""Datasets, fs-grouped length-bucketed batching, and a prefetching loader.

Behavioral spec: reference ``baseline_code/dataset.py`` —
``PreSimulatedDataset`` (:104-151), ``GroupedBatchSampler`` (:338-401),
``collate_fn`` (:404-441), ``AudioDataModule`` (:444-524).

TPU-first adaptations:
  * ``collate_fn`` pads each batch's time axis UP TO A STATIC BUCKET LENGTH
    (next multiple of ``pad_quantum`` samples) instead of the exact batch max,
    so the number of distinct compiled (fs, T) programs stays bounded.  The
    reference's exact-max padding would recompile for nearly every batch.
  * batches are numpy (host); the trainer places them on the mesh with
    `parallel.shard_batch` — per-host sharding replaces
    ``torch.distributed.get_rank()`` (``dataset.py:489-490``).
  * workers are a thread pool (audio decode releases the GIL in libsndfile);
    dynamic mixing uses a process pool (see data/dynamic.py).
"""

from __future__ import annotations

import queue
import random
import threading
from collections import defaultdict
from typing import Iterator

import numpy as np
from urgent2026_challenge_track1_tpu.utils import audio_io

from urgent2026_challenge_track1_tpu.data.scp import read_kv_scp

__all__ = [
    "PreSimulatedDataset",
    "GroupedBatchSampler",
    "collate_fn",
    "AudioDataModule",
    "PrefetchLoader",
]


# module-level worker state for process-pool loading (spawn-safe)
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_get(i):
    return _WORKER_DATASET[i]


def read_audio(path: str):
    """(channels, T) float64 + fs (reference simulate_data_from_param.py:347-361)."""
    audio, fs = audio_io.read(path)
    if audio.ndim == 1:
        audio = audio[None, :]
    else:
        audio = audio.T
    return audio, fs


class PreSimulatedDataset:
    """Paired clean/noisy scp dataset with random max_duration cropping."""

    def __init__(self, clean_speech, noisy_speech, utt2fs, speech_length, max_duration=-1):
        self.clean_speech = read_kv_scp(clean_speech)
        self.noisy_speech = read_kv_scp(noisy_speech)
        self.utt2fs = {k: int(v) for k, v in read_kv_scp(utt2fs).items()}
        self.speech_length = {k: int(v) for k, v in read_kv_scp(speech_length).items()}
        self.uid = list(self.clean_speech.keys())
        self.max_duration = max_duration
        self.epoch = 0  # set per epoch; crops are keyed by (uid, epoch) so a
        #                 mid-epoch resume reproduces the same crops
        assert len(self.clean_speech) == len(self.noisy_speech)
        assert len(self.clean_speech) == len(self.utt2fs)
        assert len(self.clean_speech) == len(self.speech_length)

    def get_source_length(self):
        if self.max_duration > 0:
            return [min(self.speech_length[k], self.max_duration) for k in self.uid]
        return [self.speech_length[k] for k in self.uid]

    def get_srs(self):
        return [self.utt2fs[k] for k in self.uid]

    def __len__(self):
        return len(self.clean_speech)

    def __getitem__(self, index):
        uid = self.uid[index]
        audio, fs = read_audio(self.clean_speech[uid])
        assert fs == self.utt2fs[uid]
        noisy, nfs = read_audio(self.noisy_speech[uid])
        assert nfs == self.utt2fs[uid]
        if 0 < self.max_duration < audio.shape[1]:
            rng = random.Random(f"{uid}:{self.epoch}")
            start = rng.randint(0, audio.shape[1] - self.max_duration)
            audio = audio[:, start : start + self.max_duration]
            noisy = noisy[:, start : start + self.max_duration]
        return audio, noisy, fs, audio.shape[1]

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)


class GroupedBatchSampler:
    """Groups by fs, sorts by length, rank-shards, buckets, epoch-shuffles.

    Reproduces the reference sampler exactly (``dataset.py:338-401``): groups
    of one sampling rate, sorted by source length, rank-sliced
    ``[rank::world_size]``, buckets of ``batch_size * bucket_size_mult``,
    shuffles (bucket order / in-bucket / batch order) seeded by epoch+rank.
    The ``seed`` argument is accepted and checkpointed for reference API
    parity but — like the reference, whose ``torch.Generator`` is seeded yet
    never used (``dataset.py:347,370-374``) — does not affect the shuffle in
    this mode.

    ``spmd_rows=True`` is the multi-host SPMD mode (NOT reference behavior,
    which is per-rank-independent DDP): every rank builds the IDENTICAL
    global batch sequence (no rank slicing; shuffle seeded rank-invariantly
    by ``seed + epoch``), so each training step has one agreed (fs, shape)
    across processes — required by the single-program
    ``make_array_from_process_local_data`` assembly (parallel/mesh.py).  The
    per-rank rows of each global batch are selected by the loader.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        rank: int = 0,
        world_size: int = 1,
        seed: int = 0,
        drop_last: bool = False,
        bucket_size_mult: int = 100,
        spmd_rows: bool = False,
    ):
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.bucket_size = batch_size * bucket_size_mult
        self.epoch = 0
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.spmd_rows = spmd_rows

        sr_groups = defaultdict(list)
        for idx, sr in enumerate(dataset.get_srs()):
            sr_groups[sr].append(idx)
        source_length = dataset.get_source_length()
        self._lengths = source_length
        self._srs = dataset.get_srs()
        self.buckets = []
        for sr, indices in sr_groups.items():
            sorted_indices = sorted(indices, key=lambda x: source_length[x])
            if not spmd_rows:
                sorted_indices = sorted_indices[self.rank :: self.world_size]
            for i in range(0, len(sorted_indices), self.bucket_size):
                self.buckets.append(sorted_indices[i : i + self.bucket_size])

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[list[int]]:
        if self.spmd_rows:
            # rank-invariant: all processes must agree on the sequence
            rng = random.Random(self.seed + self.epoch)
        else:
            rng = random.Random(self.epoch + self.rank)
        buckets = [list(b) for b in self.buckets]
        rng.shuffle(buckets)
        all_batches = []
        for bucket in buckets:
            rng.shuffle(bucket)
            for i in range(0, len(bucket), self.batch_size):
                batch = bucket[i : i + self.batch_size]
                if len(batch) < self.batch_size and self.drop_last:
                    continue
                all_batches.append(batch)
        rng.shuffle(all_batches)
        return iter(all_batches)

    def __len__(self):
        total = 0
        for bucket in self.buckets:
            n = len(bucket)
            total += n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return total

    def state_dict(self):
        return {"seed": self.seed, "epoch": self.epoch}


def bucket_length(T: int, fs: int, pad_quantum_ms: int = 1000) -> int:
    """Round T up to a static bucket boundary (compile-count control)."""
    if pad_quantum_ms <= 0:
        return T
    q = max(1, fs * pad_quantum_ms // 1000)
    return -(-T // q) * q


def collate_fn(batch, pad_quantum_ms: int = 1000, pad_to: int = 0):
    """Right-zero-pad to the batch bucket length; single fs per batch.

    Returns (clean (B,1,T), noisy (B,1,T), fs int, lengths (B,)) as numpy,
    matching the reference tuple (``dataset.py:404-441``) with the static
    bucket padding described in the module docstring.  ``pad_to`` overrides
    the local max length (multi-host SPMD: every process must pad its rows
    of a global batch to the same global T).
    """
    srs = [item[2] for item in batch]
    assert all(sr == srs[0] for sr in srs), "mixed sampling rates in one batch"
    sr = int(srs[0])
    max_length = max(max(item[0].shape[1] for item in batch), pad_to)
    T = bucket_length(max_length, sr, pad_quantum_ms)

    def pad(x):
        # truncate-then-pad: a noisy file a few samples longer than its
        # clean pair must not produce a negative pad width (the reference's
        # torch F.pad truncates negative widths the same way)
        x = np.asarray(x, np.float32)[:, :T]
        return np.pad(x, ((0, 0), (0, T - x.shape[1])))

    clean = np.stack([pad(item[0]) for item in batch])
    noisy = np.stack([pad(item[1]) for item in batch])
    lengths = np.asarray([item[3] for item in batch], np.int32)
    return clean, noisy, sr, lengths


class _LoaderError:
    """Producer-thread failure forwarded through the prefetch queue (a dead
    producer must surface its exception, not leave the consumer blocked)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchLoader:
    """Background-pool dataset loader with bounded batch prefetch.

    ``use_processes=True`` runs ``dataset.__getitem__`` in worker processes
    (the dynamic-mixing renderer is CPU-bound numpy/scipy and holds the GIL);
    plain file-reading datasets default to threads (IO releases the GIL).

    ``row_slice=(rank, world)`` is the multi-host SPMD mode: the sampler
    yields GLOBAL batches (identical on every process —
    ``GroupedBatchSampler(spmd_rows=True)``); this loader fetches only rows
    ``idxs[rank::world]`` and pads them to the GLOBAL batch length (computed
    from the sampler's source-length table) so all processes produce
    shape-identical per-host shards for ``make_array_from_process_local_data``.
    """

    def __init__(
        self,
        dataset,
        batch_sampler: GroupedBatchSampler,
        num_workers: int = 4,
        pad_quantum_ms: int = 1000,
        prefetch: int = 4,
        use_processes: bool = False,
        collate=None,
        row_slice=None,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.pad_quantum_ms = pad_quantum_ms
        self.prefetch = prefetch
        self.use_processes = use_processes
        self.collate = collate or collate_fn
        self.row_slice = row_slice

    def _global_pad_to(self, idxs) -> int:
        """Max length over the FULL global batch (multi-host): the sampler's
        length table is already post-crop (``get_source_length`` caps at
        ``max_duration``, dataset.py:81-82)."""
        lengths = self.batch_sampler._lengths
        return max(int(lengths[i]) for i in idxs)

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self):
        from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

        batches = list(iter(self.batch_sampler))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        if self.use_processes:
            import multiprocessing as mp

            def make_pool():
                return ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=mp.get_context("spawn"),
                    initializer=_init_worker,
                    initargs=(self.dataset,),
                )

            submit = lambda pool, i: pool.submit(_worker_get, i)
        else:

            def make_pool():
                return ThreadPoolExecutor(self.num_workers)

            submit = lambda pool, i: pool.submit(self.dataset.__getitem__, i)

        def put_bounded(item) -> bool:
            # bounded put that honors consumer shutdown (a plain q.put could
            # block this daemon thread forever after the consumer exits,
            # pinning the prefetched batches in memory)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            from collections import deque

            try:
                with make_pool() as pool:
                    pending: deque = deque()
                    it = iter(batches)
                    exhausted = False
                    while not stop.is_set():
                        while not exhausted and len(pending) < max(2, self.prefetch):
                            try:
                                idxs = next(it)
                            except StopIteration:
                                exhausted = True
                                break
                            if self.row_slice is not None:
                                rank, world = self.row_slice
                                local = idxs[rank::world]
                                pending.append(
                                    (self._global_pad_to(idxs),
                                     [submit(pool, i) for i in local])
                                )
                            else:
                                pending.append(
                                    (0, [submit(pool, i) for i in idxs])
                                )
                        if not pending:
                            break
                        pad_to, futs = pending.popleft()
                        items = [f.result() for f in futs]
                        if pad_to:
                            batch = self.collate(items, self.pad_quantum_ms,
                                                 pad_to=pad_to)
                        else:
                            batch = self.collate(items, self.pad_quantum_ms)
                        if not put_bounded(batch):
                            return
                put_bounded(None)
            except BaseException as e:  # surface loader failures: a silently
                # dead producer would otherwise hang the train loop forever
                put_bounded(_LoaderError(e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, _LoaderError):
                    raise RuntimeError(
                        "PrefetchLoader producer failed"
                    ) from item.exc
                yield item
        finally:
            stop.set()


class _SkipSampler:
    """Skips the first ``skip`` index-batches of a deterministic sampler
    (mid-epoch resume fast-forward; skipping costs nothing but the RNG)."""

    def __init__(self, sampler, skip: int):
        self.sampler = sampler
        self.skip = skip
        # PrefetchLoader's multi-host global-pad path reads the wrapped
        # sampler's source-length table
        self._lengths = getattr(sampler, "_lengths", None)

    def __iter__(self):
        import itertools

        return itertools.islice(iter(self.sampler), self.skip, None)

    def __len__(self):
        return max(0, len(self.sampler) - self.skip)


class AudioDataModule:
    """Builds train/val datasets + loaders from a Config (reference
    ``dataset.py:444-524``; dynamic-mixing branch wired in data/dynamic.py)."""

    def __init__(self, config):
        self.config = config
        self.train_dir = config.train_set_path
        self.valid_dir = config.valid_set_path
        self.num_worker = config.num_worker
        self.batch_size = config.batch_size
        self.pad_quantum_ms = getattr(config, "length_bucket_ms", 1000)

        self.device_render = bool(
            config.train_set_dynamic_mixing
            and getattr(config, "dynamic_mixing_on_device", False)
        )
        if self.device_render:
            from urgent2026_challenge_track1_tpu.data.dynamic_device import (
                DynamicMixingSourceDataset,
            )

            self.train_dataset = DynamicMixingSourceDataset(
                speech_source_scp=f"{self.train_dir}/speech_sources.scp",
                noise_source_scp=f"{self.train_dir}/noise_scoures.scp",
                speech_length_file=f"{self.train_dir}/source_length.scp",
                rir_scp=f"{self.train_dir}/rirs.scp",
                windnoise_scp=f"{self.train_dir}/wind_noise_scoures.scp",
                retry_when_fails=False,
                max_duration=config.max_duration,
                use_high_pass=config.use_high_pass,
            )
        elif config.train_set_dynamic_mixing:
            from urgent2026_challenge_track1_tpu.data.dynamic import DynamicMixingDataset

            self.train_dataset = DynamicMixingDataset(
                speech_source_scp=f"{self.train_dir}/speech_sources.scp",
                noise_source_scp=f"{self.train_dir}/noise_scoures.scp",
                speech_length_file=f"{self.train_dir}/source_length.scp",
                rir_scp=f"{self.train_dir}/rirs.scp",
                windnoise_scp=f"{self.train_dir}/wind_noise_scoures.scp",
                retry_when_fails=False,
                max_duration=config.max_duration,
                use_high_pass=config.use_high_pass,
            )
        else:
            self.train_dataset = PreSimulatedDataset(
                clean_speech=f"{self.train_dir}/spk1.scp",
                noisy_speech=f"{self.train_dir}/wav.scp",
                utt2fs=f"{self.train_dir}/utt2fs",
                speech_length=f"{self.train_dir}/speech_length.scp",
                max_duration=config.max_duration,
            )
        self.val_dataset = PreSimulatedDataset(
            clean_speech=f"{self.valid_dir}/spk1.scp",
            noisy_speech=f"{self.valid_dir}/wav.scp",
            utt2fs=f"{self.valid_dir}/utt2fs",
            speech_length=f"{self.valid_dir}/speech_length.scp",
        )

    def train_dataloader(
        self, rank: int = 0, world_size: int = 1, epoch: int = 0,
        skip_batches: int = 0,
    ):
        """``skip_batches`` fast-forwards the (deterministic, epoch-seeded)
        sampler on mid-epoch resume without paying the data-production cost
        of the skipped items (Lightning loop-state restore semantics,
        reference train_se.py:67-72).

        Multi-host (``world_size > 1``) uses the SPMD row mode: a GLOBAL
        batch of ``batch_size * world_size`` rows identical on every process
        (same fs/shape sequence — the reference's per-rank-independent DDP
        shuffle would deadlock the single-program collective assembly), each
        host loading its ``[rank::world]`` rows padded to the global bucket.
        Per-host rows stay ``batch_size``, preserving the reference's
        effective global batch and LR semantics."""
        spmd = world_size > 1
        row_slice = None
        if spmd:
            if self.device_render:
                raise NotImplementedError(
                    "dynamic_mixing_on_device with multi-host training is "
                    "not supported yet (the dict collate has no global-pad "
                    "path); use host-side dynamic mixing"
                )
            row_slice = (rank, world_size)
        sampler = GroupedBatchSampler(
            self.train_dataset,
            batch_size=self.batch_size * world_size if spmd else self.batch_size,
            rank=rank,
            world_size=world_size,
            drop_last=True,
            spmd_rows=spmd,
            seed=getattr(self.config, "seed", 0),
        )
        sampler.set_epoch(epoch)
        if hasattr(self.train_dataset, "set_epoch"):
            self.train_dataset.set_epoch(epoch)
        self.train_batch_sampler = sampler
        if skip_batches:
            sampler = _SkipSampler(sampler, skip_batches)
        import os

        # dynamic mixing is CPU-bound numpy -> processes, but only when the
        # host actually has cores to spare (spawn costs ~2 s/worker)
        use_processes = (
            self.config.train_set_dynamic_mixing and (os.cpu_count() or 1) > 2
        )
        collate = None
        if self.device_render:
            from urgent2026_challenge_track1_tpu.data.dynamic_device import (
                collate_device_render,
            )

            collate = collate_device_render
        return PrefetchLoader(
            self.train_dataset,
            sampler,
            self.num_worker,
            self.pad_quantum_ms,
            use_processes=use_processes,
            collate=collate,
            row_slice=row_slice,
        )

    def val_dataloader(self):
        # every rank evaluates the full validation set (reference :510-516)
        sampler = GroupedBatchSampler(
            self.val_dataset, batch_size=self.batch_size, rank=0, world_size=1,
            drop_last=True,
        )
        return PrefetchLoader(
            self.val_dataset, sampler, self.num_worker, self.pad_quantum_ms
        )
