"""Checkpoint averaging (scripts/average_checkpoints.py) — additive
capability (espnet-style best-k averaging; the reference serves the single
best val_loss checkpoint, train_se.py:19-32)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from average_checkpoints import average_checkpoints


@pytest.fixture(scope="module")
def three_ckpts(tmp_path_factory):
    """Three saves of the same tiny model with params scaled 1x/2x/4x and
    val losses making steps {1, 3} the best-2."""
    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.train.trainer import (
        CheckpointIO,
        TrainState,
        build_model,
        make_optimizer,
    )

    tmp = tmp_path_factory.mktemp("avg")
    cfg = Config(model_configs={"num_channel": 8, "num_layer": 1})
    bundle = build_model(cfg)
    base = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    opt = make_optimizer(cfg)
    io = CheckpointIO(str(tmp / "checkpoints"), save_top_k=3)
    for step, (scale, loss) in enumerate([(1.0, 0.5), (2.0, 0.9), (4.0, 0.6)],
                                         start=1):
        params = jax.tree_util.tree_map(lambda x: x * scale, base)
        state = TrainState(params, opt.init(params), None, step=step,
                           epoch=step - 1)
        io.save(step, state, val_loss=loss, config_dict=cfg.to_dict())
    return tmp, base, cfg


def test_top_k_selection_and_mean(three_ckpts, tmp_path):
    tmp, base, _ = three_ckpts
    info = average_checkpoints(str(tmp / "checkpoints"),
                               str(tmp_path / "avg"), top_k=2)
    assert info["steps"] == [1, 3]  # losses 0.5 and 0.6 beat 0.9

    from urgent2026_challenge_track1_tpu.utils.checkpoint import (
        load_model_for_inference,
    )

    kind, params, _, _ = load_model_for_inference(str(tmp_path / "avg"))
    assert kind == "discriminative"
    # mean of 1x and 4x = 2.5x the base tree, leaf-wise
    expect = jax.tree_util.tree_map(lambda x: np.asarray(x) * 2.5, base)
    flat_e, _ = jax.tree_util.tree_flatten(expect)
    flat_g, _ = jax.tree_util.tree_flatten(params)
    assert len(flat_e) == len(flat_g)
    for e, g in zip(flat_e, flat_g):
        np.testing.assert_allclose(np.asarray(g), e, rtol=1e-6)


def test_explicit_steps_and_inference(three_ckpts, tmp_path):
    import jax.numpy as jnp

    tmp, base, cfg = three_ckpts
    average_checkpoints(str(tmp / "checkpoints"), str(tmp_path / "avg2"),
                        steps=[1, 2])

    from urgent2026_challenge_track1_tpu.serving import make_enhance_fn
    from urgent2026_challenge_track1_tpu.utils.checkpoint import (
        load_model_for_inference,
    )

    kind, params, mcfg, scfg = load_model_for_inference(str(tmp_path / "avg2"))
    enhance = make_enhance_fn(kind, params, mcfg, scfg)
    y = np.asarray(enhance(jnp.zeros((1, 8000), jnp.float32), 8000,
                           jax.random.PRNGKey(0),
                           jnp.asarray([8000], jnp.int32)))
    assert y.shape == (1, 8000) and np.isfinite(y).all()


def test_missing_step_rejected(three_ckpts, tmp_path):
    tmp, _, _ = three_ckpts
    with pytest.raises(SystemExit, match="not in"):
        average_checkpoints(str(tmp / "checkpoints"), str(tmp_path / "x"),
                            steps=[99])


def test_rank_by_val_sisnr(tmp_path):
    """--by val_sisnr must pick the HIGHEST-SI-SNR steps from metas written
    by a checkpoint_metric run (and refuse when no step stores the metric)."""
    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.train.trainer import (
        CheckpointIO,
        TrainState,
        build_model,
        make_optimizer,
    )

    cfg = Config(model_configs={"num_channel": 8, "num_layer": 1})
    bundle = build_model(cfg)
    base = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    opt = make_optimizer(cfg)
    io = CheckpointIO(str(tmp_path / "ck"), save_top_k=3, save_last=False,
                      metric="val_sisnr")
    # val_loss prefers steps {1, 2}; val_sisnr prefers steps {2, 3}
    history = [(1, {"val_loss": 0.4, "val_sisnr": 5.0}),
               (2, {"val_loss": 0.5, "val_sisnr": 7.0}),
               (3, {"val_loss": 0.9, "val_sisnr": 6.5})]
    for step, vm in history:
        state = TrainState(base, opt.init(base), None, step=step, epoch=0)
        io.save(step, state, vm, cfg.to_dict())
    info = average_checkpoints(str(tmp_path / "ck"), str(tmp_path / "avg"),
                               top_k=2, by="val_sisnr")
    assert info["steps"] == [2, 3]

    with pytest.raises(SystemExit, match="stores metric"):
        average_checkpoints(str(tmp_path / "ck"), str(tmp_path / "avg2"),
                            top_k=2, by="val_pesq")
