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


def test_fused_rendered_train_step_matches_separate(dm_sources):
    """make_train_step_rendered (render fused into the jitted step, one
    dispatch) must produce the same update as render_on_device followed by
    the plain make_train_step on the rendered pair."""
    import jax
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.train import trainer as TR

    np.random.seed(1)
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

    cfg = Config(model_configs={"num_channel": 8, "num_layer": 1},
                 use_high_pass=True)
    bundle = TR.build_model(cfg)
    params = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    opt = TR.make_optimizer(cfg)
    key = jax.random.PRNGKey(2)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

    # separate: render dispatch + plain step
    target, noisy = render_on_device(batch, highpass=True)
    lengths = jnp.asarray(batch["lengths"], np.int32)
    sep_step = TR.make_train_step(bundle, opt, cfg, batch["fs"])
    p_sep, s_sep, _, m_sep = sep_step(
        copy(params), opt.init(copy(params)), None, key, target, noisy, lengths
    )

    # fused: one program
    fused_step = TR.make_train_step_rendered(bundle, opt, cfg, batch["fs"])
    arrays = tuple(jnp.asarray(batch[k]) for k in TR.RENDER_KEYS)
    p_f, s_f, _, m_f = fused_step(
        copy(params), opt.init(copy(params)), None, key, *arrays
    )

    assert np.isfinite(float(m_f["loss"]))
    np.testing.assert_allclose(float(m_f["loss"]), float(m_sep["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_sep), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_trainer_fit_device_dm(dm_sources, tmp_path, monkeypatch):
    """Trainer.fit end-to-end with dynamic_mixing_on_device=True routes
    batches through the fused rendered step and trains finite."""
    import json
    import os
    import shutil

    monkeypatch.chdir(tmp_path)
    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    # AudioDataModule expects the train_sources directory layout
    src = tmp_path / "train_sources"
    src.mkdir()
    shutil.copy(dm_sources["speech"], src / "speech_sources.scp")
    shutil.copy(dm_sources["noise"], src / "noise_scoures.scp")
    shutil.copy(dm_sources["rir"], src / "rirs.scp")
    shutil.copy(dm_sources["wind"], src / "wind_noise_scoures.scp")
    shutil.copy(dm_sources["length"], src / "source_length.scp")
    # tiny pre-simulated val dir
    val = tmp_path / "val"
    val.mkdir()
    rng = np.random.default_rng(3)
    scps = {k: open(val / k, "w")
            for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
    for i in range(2):
        uid = f"v{i}"
        clean = (0.1 * rng.standard_normal(8000)).astype(np.float32)
        noisy = clean + (0.03 * rng.standard_normal(8000)).astype(np.float32)
        cp, npp = val / f"{uid}_c.wav", val / f"{uid}_n.wav"
        audio_io.write(str(cp), clean, 16000)
        audio_io.write(str(npp), noisy, 16000)
        print(uid, cp, file=scps["spk1.scp"])
        print(uid, npp, file=scps["wav.scp"])
        print(uid, 16000, file=scps["utt2fs"])
        print(uid, 8000, file=scps["speech_length.scp"])
    for f in scps.values():
        f.close()

    np.random.seed(2)
    cfg = Config(
        model_configs={"num_channel": 8, "num_layer": 1},
        train_set_dynamic_mixing=True,
        dynamic_mixing_on_device=True,
        train_set_path=str(src),
        valid_set_path=str(val),
        batch_size=2,
        num_train_epochs=1,
        max_duration=16000,
        num_worker=0,
        val_check_interval=1000,
        log_every_steps=1,
        mesh_shape="dp=2",
        train_tag="test_run_devdm",
    )
    dm = AudioDataModule(cfg)
    trainer = Trainer(cfg, dm)
    state = trainer.fit()
    assert state.step == 2
    with open(os.path.join(trainer.exp_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert losses and all(np.isfinite(v) for v in losses)
