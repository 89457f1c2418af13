"""Trainer: full fit loop on synthetic data, checkpoint save/resume, dp mesh."""

import os

import jax
import numpy as np
import pytest
from urgent2026_challenge_track1_tpu.utils import audio_io as sf

from urgent2026_challenge_track1_tpu.config import Config


@pytest.fixture()
def toy_dirs(tmp_path):
    rng = np.random.default_rng(0)

    def make(dirname, n):
        root = tmp_path / dirname
        root.mkdir()
        scps = {k: open(root / k, "w") for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
        for i in range(n):
            fs = 8000
            T = 4000 + 400 * i
            uid = f"{dirname}{i:02d}"
            clean = (0.1 * rng.standard_normal(T)).astype(np.float32)
            noisy = clean + (0.05 * rng.standard_normal(T)).astype(np.float32)
            cp, np_p = root / f"{uid}_c.wav", root / f"{uid}_n.wav"
            sf.write(cp, clean, fs)
            sf.write(np_p, noisy, fs)
            print(uid, cp, file=scps["spk1.scp"])
            print(uid, np_p, file=scps["wav.scp"])
            print(uid, fs, file=scps["utt2fs"])
            print(uid, T, file=scps["speech_length.scp"])
        for f in scps.values():
            f.close()
        return str(root)

    return make("train", 8), make("valid", 4)


def _cfg(toy_dirs, tmp_path, **over):
    train_dir, valid_dir = toy_dirs
    base = dict(
        train_set_path=train_dir,
        valid_set_path=valid_dir,
        train_set_dynamic_mixing=False,
        batch_size=2,
        num_worker=2,
        num_train_epochs=1,
        val_check_interval=4,
        max_duration=6000,
        model_type="discriminative",
        model_configs={"num_channel": 8, "num_layer": 1},
        mesh_shape="dp=2",
        log_every_steps=1,
        save_top_k=2,
        train_tag="test_run",
    )
    base.update(over)
    return Config(**base)


def test_fit_and_resume(toy_dirs, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    cfg = _cfg(toy_dirs, tmp_path)
    dm = AudioDataModule(cfg)
    trainer = Trainer(cfg, dm)
    state = trainer.fit()
    assert state.step == 4  # 8 train utts / batch 2 = 4 steps
    # checkpoint written at val_check_interval=4
    assert trainer.ckpt.latest_step() == 4
    # metrics written
    assert os.path.exists(os.path.join(trainer.exp_dir, "metrics.jsonl"))

    # resume: a fresh trainer restores step AND loader position (epoch,
    # batch_in_epoch), so the continued run does exactly the remaining
    # batches — Lightning loop-state restore semantics (train_se.py:67-72)
    cfg2 = _cfg(toy_dirs, tmp_path, num_train_epochs=2)
    trainer2 = Trainer(cfg2, AudioDataModule(cfg2))
    state2 = trainer2.maybe_resume(trainer2.init_state())
    assert state2.step == 4 and state2.epoch == 0 and state2.batch_in_epoch == 4
    state2 = trainer2.fit(state2)
    # epoch 0 already fully consumed (4 of 4 batches) -> only epoch 1 runs
    assert state2.step == 8 and state2.epoch == 2


def test_mid_epoch_resume_continues_at_next_batch(toy_dirs, tmp_path, monkeypatch):
    """Done-criterion (VERDICT r1 item 7): the first batch after resume is
    the batch an uninterrupted run would have seen next."""
    monkeypatch.chdir(tmp_path)
    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    def record(dm, log):
        orig = dm.train_dataloader

        def wrapped(*a, **kw):
            for batch in orig(*a, **kw):
                log.append(float(np.sum(np.asarray(batch[0]))))
                yield batch

        dm.train_dataloader = wrapped
        return dm

    # uninterrupted run: 4 batches, ckpt at step 2 (mid-epoch)
    cfg = _cfg(toy_dirs, tmp_path, val_check_interval=2, train_tag="resume_a")
    full_log = []
    trainer = Trainer(cfg, record(AudioDataModule(cfg), full_log))
    trainer.fit()
    assert len(full_log) == 4

    # resumed run from the mid-epoch checkpoint (step 2) sees exactly
    # batches 3, 4
    cfg2 = _cfg(toy_dirs, tmp_path, val_check_interval=2, train_tag="resume_a")
    resumed_log = []
    trainer2 = Trainer(cfg2, record(AudioDataModule(cfg2), resumed_log))
    restored, _ = trainer2.ckpt.restore(2, trainer2.init_state())
    assert restored.step == 2 and restored.batch_in_epoch == 2
    trainer2.fit(trainer2._place(restored))
    assert resumed_log == full_log[2:]


def test_flow_fit_updates_ema(toy_dirs, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    cfg = _cfg(
        toy_dirs,
        tmp_path,
        model_type="flowse",
        n_fft=960,
        hop_length=480,
        bsrnn_hidden=8,
        num_layer=1,
        val_check_interval=100,
        train_tag="test_flow",
    )
    dm = AudioDataModule(cfg)
    trainer = Trainer(cfg, dm)
    s0 = trainer.init_state()
    p0 = jax.tree.leaves(s0.params)[0].copy()
    state = trainer.fit(s0)
    assert state.ema_params is not None
    p1 = jax.tree.leaves(state.params)[0]
    e1 = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))  # params moved
    assert not np.allclose(np.asarray(p1), np.asarray(e1))  # ema lags params


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_use_pallas_lstm_typo_fails_fast(toy_dirs, tmp_path):
    """An unrecognized use_pallas_lstm value must raise, not silently train
    on the slow scan path (same fail-fast stance as unknown config keys)."""
    import pytest
    from urgent2026_challenge_track1_tpu.train import trainer as trainer_mod

    cfg = _cfg(toy_dirs, tmp_path, use_pallas_lstm="ture")
    with pytest.raises(ValueError, match="use_pallas_lstm"):
        trainer_mod.build_model(cfg)


def test_validate_logs_per_fs_sisnr(toy_dirs, tmp_path, monkeypatch):
    """Reference d_model.py:82-87 logs {stage}_sisnr_{fs} for validation too
    (VERDICT r2 item 2): per-rate regression must stay visible."""
    monkeypatch.chdir(tmp_path)
    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    cfg = _cfg(toy_dirs, tmp_path)
    trainer = Trainer(cfg, AudioDataModule(cfg))
    state = trainer.init_state()
    vm = trainer.validate(state)
    assert "val_sisnr" in vm
    assert "val_sisnr_8000" in vm  # toy pool is all 8 kHz
    assert np.isfinite(vm["val_sisnr_8000"])


def test_plateau_resume_uses_latest_checkpoint(tmp_path):
    """On a val-loss plateau the top-k manager garbage-collects every newer
    save; resume must still pick the NEWEST step via the save_last tree, or a
    restart-bounded run livelocks re-training the same window forever
    (observed in the round-3 multi-fs soak).  Reference train_se.py:31,67-70
    sets save_last=False — save_last=False reproduces that behavior."""
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.train.trainer import (
        CheckpointIO,
        TrainState,
    )

    def st(step):
        return TrainState(
            params={"w": jnp.full((3,), float(step))},
            opt_state={"m": jnp.zeros((3,))},
            ema_params=None,
            step=step,
            epoch=step // 10,
            batch_in_epoch=step % 10,
        )

    # best val_loss at step 10, then a plateau strictly above it
    ck = CheckpointIO(str(tmp_path / "ck"), save_top_k=1, save_last=True)
    for step, vl in ((10, 0.5), (20, 0.7), (30, 0.7)):
        ck.save(step, st(step), vl, {})
    assert ck.latest_step() == 30
    restored, meta = ck.restore(30, st(0))
    assert restored.step == 30 and float(restored.params["w"][0]) == 30.0
    assert meta["val_loss"] == pytest.approx(0.7)
    # top-k retention itself is unchanged: only the best step survives there
    assert list(ck.manager.all_steps()) == [10]

    # strict reference behavior: resume falls back to the retained best
    ref = CheckpointIO(str(tmp_path / "ref"), save_top_k=1, save_last=False)
    for step, vl in ((10, 0.5), (20, 0.7)):
        ref.save(step, st(step), vl, {})
    assert ref.latest_step() == 10


def test_checkpoint_metric_val_sisnr_keys_on_max(tmp_path):
    """checkpoint_metric="val_sisnr" must retain the HIGHEST-SI-SNR step even
    when val_loss prefers an earlier one (the round-5 reference-geometry CFM
    soak: val_loss bottomed at ~6k steps while the sampler's val SI-SNR kept
    improving through 25k — val_loss mis-selects for flowse)."""
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.train.trainer import (
        CheckpointIO,
        TrainState,
    )

    def st(step):
        return TrainState(
            params={"w": jnp.full((3,), float(step))},
            opt_state={"m": jnp.zeros((3,))},
            ema_params=None,
            step=step,
            epoch=0,
            batch_in_epoch=step,
        )

    ck = CheckpointIO(str(tmp_path / "ck"), save_top_k=1, save_last=False,
                      metric="val_sisnr")
    assert ck.mode == "max"
    # the CFM-soak shape: loss bottoms early, sampler SI-SNR peaks late
    history = ((10, {"val_loss": 0.5, "val_sisnr": 4.0}),
               (20, {"val_loss": 0.8, "val_sisnr": 7.2}),
               (30, {"val_loss": 0.9, "val_sisnr": 6.9}))
    for step, vm in history:
        ck.save(step, st(step), vm, {})
    assert list(ck.manager.all_steps()) == [20]
    # meta keeps its legacy shape (val_loss float) for existing loaders
    _, meta = ck.restore(20, st(0))
    assert meta["val_loss"] == pytest.approx(0.8)

    # a val pass that never produced the metric ranks worst, never best
    ck.save(40, st(40), {"val_loss": 0.1}, {})
    assert list(ck.manager.all_steps()) == [20]

    # default metric stays exact reference behavior (min val_loss), and the
    # legacy float signature still works
    ref = CheckpointIO(str(tmp_path / "ref"), save_top_k=1, save_last=False)
    assert ref.mode == "min"
    for step, vl in ((10, 0.5), (20, 0.3)):
        ref.save(step, st(step), vl, {})
    assert list(ref.manager.all_steps()) == [20]


def test_checkpoint_metric_switch_tolerates_legacy_checkpoints(tmp_path):
    """Re-opening a top-k tree with a DIFFERENT checkpoint_metric must not
    crash: orbax's preservation policy evaluates best_fn on every retained
    checkpoint at the next save, and checkpoints saved before the switch
    lack the new key (round-5 refgeom soak: KeyError 'val_sisnr' crash-loop
    on every resume segment after flipping val_loss -> val_sisnr mid-run).
    Legacy checkpoints rank as worst, never best."""
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.train.trainer import (
        CheckpointIO,
        TrainState,
    )

    def st(step):
        return TrainState(
            params={"w": jnp.full((3,), float(step))},
            opt_state={"m": jnp.zeros((3,))},
            ema_params=None,
            step=step,
            epoch=0,
            batch_in_epoch=step,
        )

    # phase 1: default metric (val_loss) — metrics dicts have no val_sisnr
    old = CheckpointIO(str(tmp_path / "ck"), save_top_k=3, save_last=False)
    for step, vl in ((10, 0.5), (20, 0.4)):
        old.save(step, st(step), vl, {})
    del old

    # phase 2: same tree re-opened keyed on val_sisnr; the next save used to
    # raise KeyError inside orbax's should_preserve
    new = CheckpointIO(str(tmp_path / "ck"), save_top_k=2, save_last=False,
                       metric="val_sisnr")
    new.save(30, st(30), {"val_loss": 0.9, "val_sisnr": 6.0}, {})
    new.save(40, st(40), {"val_loss": 0.8, "val_sisnr": 5.0}, {})
    # both metric-bearing steps survive; a legacy step is the one evicted
    kept = set(new.manager.all_steps())
    assert {30, 40} <= kept and len(kept & {10, 20}) <= 1


def test_nan_step_is_a_true_skip():
    """A NaN batch must not move params OR the optimizer state (the
    reference's Lightning guard skips optimizer.step() entirely; zeroed
    grads alone would still apply momentum + weight decay)."""
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.train.trainer import (
        build_model,
        make_optimizer,
        make_train_step,
    )

    cfg = Config(model_configs={"num_channel": 8, "num_layer": 1})
    bundle = build_model(cfg)
    params = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(bundle, opt, cfg, 8000)
    key = jax.random.PRNGKey(1)
    B, T = 2, 8000
    clean = jnp.zeros((B, T), jnp.float32) + 0.1
    lengths = jnp.asarray([T, T], np.int32)

    # one good step first so Adam moments are nonzero (the momentum that
    # would leak through a fake skip)
    noisy = clean + 0.01
    p1, s1, _, m1 = step(params, opt_state, None, key, clean, noisy, lengths)
    assert np.isfinite(float(m1["loss"]))

    p1_copy = jax.tree.map(lambda x: np.asarray(x).copy(), p1)
    s1_copy = jax.tree.map(lambda x: np.asarray(x).copy(), s1)

    bad_noisy = noisy.at[0, 0].set(np.nan)
    p2, s2, _, m2 = step(p1, s1, None, key, clean, bad_noisy, lengths)
    assert float(m2["nan_grad"]) == 1.0
    assert np.isfinite(float(m2["loss"]))  # NaN-loss fallback logs 0, not NaN
    for a, b in zip(jax.tree.leaves(p1_copy), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(s1_copy), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # and a following good step still trains
    p3, s3, _, m3 = step(p2, s2, None, key, clean, noisy, lengths)
    assert np.isfinite(float(m3["loss"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p1_copy), jax.tree.leaves(p3))
    )
    assert moved


def test_fit_on_mp_mesh(toy_dirs, tmp_path, monkeypatch):
    """End-to-end Trainer.fit over a dp=2,mp=4 mesh: the mp constrain hook
    threads into every train/val step and the run completes finite (the
    step-level numerical parity is pinned in tests/test_model_parallel.py)."""
    monkeypatch.chdir(tmp_path)
    import json

    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    cfg = _cfg(toy_dirs, tmp_path, mesh_shape="dp=2,mp=4",
               train_tag="test_run_mp")
    trainer = Trainer(cfg, AudioDataModule(cfg))
    assert trainer._constrain is not None
    state = trainer.fit()
    assert state.step == 4
    with open(os.path.join(trainer.exp_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert losses and all(np.isfinite(v) for v in losses)


def test_flowse_validate_samples_each_fs(tmp_path, monkeypatch):
    """fs-grouped val sets get a sampler SI-SNR per sampling rate, not just
    batch 0's (round-4 multi-fs flowse soak: only val_sisnr_44100 appeared
    because batch 0 was always the 44.1 kHz bucket).  val_sisnr keeps the
    reference's batch-0 meaning (flow_model.py:220-230)."""
    monkeypatch.chdir(tmp_path)
    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    rng = np.random.default_rng(1)

    def make(dirname, rates):
        root = tmp_path / dirname
        root.mkdir()
        scps = {k: open(root / k, "w")
                for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
        for j, fs in enumerate(rates):
            for i in range(2):
                T = fs // 2
                uid = f"{dirname}{j}{i}"
                clean = (0.1 * rng.standard_normal(T)).astype(np.float32)
                noisy = clean + (0.05 * rng.standard_normal(T)).astype(np.float32)
                cp, np_p = root / f"{uid}_c.wav", root / f"{uid}_n.wav"
                sf.write(cp, clean, fs)
                sf.write(np_p, noisy, fs)
                print(uid, cp, file=scps["spk1.scp"])
                print(uid, np_p, file=scps["wav.scp"])
                print(uid, fs, file=scps["utt2fs"])
                print(uid, T, file=scps["speech_length.scp"])
        for f in scps.values():
            f.close()
        return str(root)

    train_dir = make("tr2", (8000,))
    valid_dir = make("va2", (8000, 16000))
    cfg = Config(
        train_set_path=train_dir,
        valid_set_path=valid_dir,
        train_set_dynamic_mixing=False,
        batch_size=2,
        num_worker=2,
        num_train_epochs=1,
        val_check_interval=100,
        max_duration=16000,
        model_type="flowse",
        n_fft=960,
        hop_length=480,
        bsrnn_hidden=8,
        num_layer=1,
        mesh_shape="dp=2",
        log_every_steps=1,
        save_top_k=1,
        train_tag="test_flow_fsval",
    )
    trainer = Trainer(cfg, AudioDataModule(cfg))
    vm = trainer.validate(trainer.init_state())
    assert "val_sisnr_8000" in vm and "val_sisnr_16000" in vm, vm
    assert np.isfinite(vm["val_sisnr_8000"])
    assert np.isfinite(vm["val_sisnr_16000"])
    # batch-0 semantics: val_sisnr is the FIRST sampled batch's value
    assert vm["val_sisnr"] in (
        vm["val_sisnr_8000"], vm["val_sisnr_16000"]), vm
