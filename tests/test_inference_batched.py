"""Batched serving path of inference.py (VERDICT r2 weak item 6a): group by
(fs, bucket), enhance whole device batches, slice each utterance back to its
true length with the length-exact model (lengths are per-row), peak-
normalize, and write inf.scp.  No reference counterpart (the reference
loops B=1, inference.py:48-64)."""

import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A real orbax checkpoint saved through the Trainer's CheckpointIO."""
    import jax

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.train.trainer import (
        CheckpointIO,
        TrainState,
        build_model,
        make_optimizer,
    )

    tmp = tmp_path_factory.mktemp("ckpt")
    cfg = Config(model_configs={"num_channel": 8, "num_layer": 1})
    bundle = build_model(cfg)
    params = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    opt = make_optimizer(cfg)
    state = TrainState(params, opt.init(params), None, step=1, epoch=0)
    io = CheckpointIO(str(tmp / "checkpoints"), save_top_k=1)
    io.save(1, state, val_loss=1.0, config_dict=cfg.to_dict())
    return tmp / "checkpoints"


def test_batched_inference_cli(tiny_ckpt, tmp_path):
    from urgent2026_challenge_track1_tpu.utils import audio_io

    fs = 8000
    rng = np.random.default_rng(0)
    lengths = [6500, 8000, 7200, 12000, 11500]  # two (fs, bucket) groups
    lines = []
    for i, L in enumerate(lengths):
        w = tmp_path / f"u{i}.wav"
        audio_io.write(str(w), 0.1 * rng.standard_normal(L), fs)
        lines.append(f"u{i} {w}")
    scp = tmp_path / "in.scp"
    scp.write_text("\n".join(lines) + "\n")

    out = tmp_path / "out"
    argv = ["inference.py", "--input_scp", str(scp), "--ckpt_path",
            str(tiny_ckpt), "--output_dir", str(out), "--device", "cpu",
            "--batch_size", "3"]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(str(REPO / "inference.py"), run_name="__main__")
    finally:
        sys.argv = old

    inf = dict(l.split() for l in (out / "inf.scp").read_text().splitlines())
    assert set(inf) == {f"u{i}" for i in range(5)}
    for i, L in enumerate(lengths):
        y, yfs = audio_io.read(inf[f"u{i}"])
        assert yfs == fs
        assert len(y) == L  # sliced back to the true length
        assert 0.85 <= np.abs(y).max() <= 0.901  # 0.9 peak normalization
