"""On-device dynamic mixing: source dataset -> collate -> device render."""

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.data.dynamic_device import (
    DynamicMixingSourceDataset,
    collate_device_render,
    render_on_device,
)
from urgent2026_challenge_track1_tpu.utils import audio_io


@pytest.fixture()
def dm_sources(tmp_path):
    rng = np.random.default_rng(0)
    fs = 16000

    def wav(name, data):
        p = tmp_path / name
        audio_io.write(str(p), data.astype(np.float32), fs)
        return str(p)

    entries = {"speech": [], "noise": [], "rir": [], "wind": []}
    t = np.arange(fs) / fs
    for i in range(4):
        sp = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        entries["speech"].append((f"sp{i}", fs, wav(f"sp{i}.wav", sp)))
    for i in range(2):
        entries["noise"].append(
            (f"nz{i}", fs, wav(f"nz{i}.wav", 0.2 * rng.standard_normal(fs // 2)))
        )
    rir = np.zeros(2000)
    rir[10] = 1.0
    rir[500] = 0.3
    entries["rir"].append(("rir0", fs, wav("rir0.wav", rir)))
    entries["wind"].append(
        ("wind_noise0", fs, wav("wind0.wav", 0.2 * rng.standard_normal(fs)))
    )
    scps = {}
    for kind, rows in entries.items():
        p = tmp_path / f"{kind}.scp"
        with open(p, "w") as f:
            for uid, fs_, path in rows:
                print(uid, fs_, path, file=f)
        scps[kind] = str(p)
    with open(tmp_path / "length.scp", "w") as f:
        for uid, fs_, path in entries["speech"]:
            print(uid, fs, file=f)
    scps["length"] = str(tmp_path / "length.scp")
    return scps


def test_device_dynamic_mixing_end_to_end(dm_sources):
    np.random.seed(0)
    ds = DynamicMixingSourceDataset(
        speech_source_scp=dm_sources["speech"],
        noise_source_scp=dm_sources["noise"],
        rir_scp=dm_sources["rir"],
        windnoise_scp=dm_sources["wind"],
        speech_length_file=dm_sources["length"],
        max_duration=16000,
        use_high_pass=True,
    )
    items = [ds[i] for i in range(4)]
    batch = collate_device_render(items)
    assert batch["speech"].shape == (4, 16000)
    target, noisy = render_on_device(batch)
    target, noisy = np.asarray(target), np.asarray(noisy)
    assert np.isfinite(target).all() and np.isfinite(noisy).all()
    assert max(np.abs(target).max(), np.abs(noisy).max()) <= 0.9 + 1e-5
    # something was mixed in for every item
    assert np.all(np.abs(noisy - target).max(axis=-1) > 1e-4)


def test_device_dynamic_wind_items_prerendered(dm_sources):
    np.random.seed(1)

    from urgent2026_challenge_track1_tpu.simulation.params import SimulationConfigs

    class AlwaysWindConfig(SimulationConfigs):
        prob_wind_noise = 1.0  # force the host wind path

    ds = DynamicMixingSourceDataset(
        speech_source_scp=dm_sources["speech"],
        noise_source_scp=dm_sources["noise"],
        rir_scp=dm_sources["rir"],
        windnoise_scp=dm_sources["wind"],
        speech_length_file=dm_sources["length"],
        max_duration=16000,
        use_high_pass=True,
        simulation_configs=AlwaysWindConfig,
    )
    items = [ds[0], ds[1]]
    assert all(it["prerendered"] for it in items)
    batch = collate_device_render(items)
    target, noisy = render_on_device(batch)
    # pre-rendered items pass through the device stage untouched
    np.testing.assert_allclose(
        np.asarray(noisy)[0], batch["noisy_pre"][0], atol=1e-6
    )


def test_device_render_on_dp_mesh(dm_sources):
    """render_on_device with a mesh: batch-sharded rendering over dp=8."""
    import jax

    from urgent2026_challenge_track1_tpu.parallel import make_mesh

    np.random.seed(2)
    ds = DynamicMixingSourceDataset(
        speech_source_scp=dm_sources["speech"],
        noise_source_scp=dm_sources["noise"],
        rir_scp=dm_sources["rir"],
        windnoise_scp=dm_sources["wind"],
        speech_length_file=dm_sources["length"],
        max_duration=16000,
        use_high_pass=False,
    )
    items = [ds[i % len(ds)] for i in range(8)]
    batch = collate_device_render(items)
    mesh = make_mesh("dp=8")
    target, noisy = render_on_device(batch, highpass=False, mesh=mesh)
    assert target.shape == (8, 16000)
    assert np.isfinite(np.asarray(target)).all()
    # output carries the dp sharding through the jitted render
    assert "dp" in str(target.sharding)


def test_codec_recipes_take_host_path(dm_sources):
    """Codec augmentation is host-only (libavcodec round-trip): items whose
    recipe contains codec must arrive prerendered, not silently lose the
    augmentation in the device chain."""
    from urgent2026_challenge_track1_tpu.simulation import dsp as sim_dsp

    if not sim_dsp.codecs_available():
        pytest.skip("no codec backend")
    np.random.seed(1)
    ds = DynamicMixingSourceDataset(
        speech_source_scp=dm_sources["speech"],
        noise_source_scp=dm_sources["noise"],
        rir_scp=dm_sources["rir"],
        windnoise_scp=dm_sources["wind"],
        speech_length_file=dm_sources["length"],
        max_duration=16000,
    )
    # force codec augmentation on every item
    ds.augmentations = ["codec"]
    ds.weight_augmentations = np.array([1.0])
    ds.cfg.num_augmentations = {1: 1.0}
    ds.cfg.prob_wind_noise = 0.0
    found_prerendered = False
    for i in range(len(ds)):
        item = ds[i]
        if item["prerendered"]:
            found_prerendered = True
            assert "clean" in item and "noisy" in item
    assert found_prerendered, "codec recipes never took the host-render path"


def test_parse_augmentation_ops_repeated_op_type():
    """A chain repeating an op type must still yield exactly 3 aug_order
    entries (fixed-shape collate) with last-occurrence parameters winning
    (round-3 review finding: 4 entries crashed the loader)."""
    from urgent2026_challenge_track1_tpu.data.dynamic_device import (
        parse_augmentation_ops,
    )

    p = parse_augmentation_ops(
        "bandwidth_limitation-a->8000/bandwidth_limitation-b->4000"
        "/clipping(min=0.1,max=0.9)", 16000
    )
    assert sorted(p["aug_order"]) == [0, 1, 2] and len(p["aug_order"]) == 3
    assert p["bw_fs_new"] == 4000          # last occurrence wins
    assert p["aug_order"][:2] == [0, 1]    # sampled order preserved
    # none augmentation: canonical identity order
    q = parse_augmentation_ops("none", 16000)
    assert q["aug_order"] == [0, 1, 2] and q["bw_fs_new"] == 16000
