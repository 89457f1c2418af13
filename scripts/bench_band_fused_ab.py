#!/bin/env python
"""Same-process A/B: fused both-direction vs per-direction band training
kernels (VERDICT r2 item 10a).

Compiles the FULL discriminative train step twice — once with the standard
one-Pallas-call-per-direction band recurrence, once with
ops/pallas_lstm.FUSED_BIDIR_TRAIN=True (forward AND backward of the band
BLSTM run both directions in a single Pallas call each, halving per-call
overhead on the K~34-step band sequences) — and alternates timing loops so
tunnel drift cancels (CLAUDE.md benchmark discipline).  The time path is
unaffected either way (it routes through bilstm_masked's per-direction
revmasked kernels).  Reference geometry: B=4, 2 s @ 48 kHz, 196x6 bf16,
masked lengths (the real training path).
"""

import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from urgent2026_challenge_track1_tpu.config import Config
from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.ops import pallas_lstm as pl_ops
from urgent2026_challenge_track1_tpu.train.trainer import (
    ModelBundle,
    make_optimizer,
    make_train_step,
)


def main():
    cfg = Config(batch_size=4, compute_dtype="bfloat16", use_pallas_lstm="true")
    mcfg = M.BSRNNConfig(
        input_dim=481, num_channel=196, num_layer=6, causal=False,
        compute_dtype="bfloat16", use_pallas_lstm=True,
    )
    bundle = ModelBundle("discriminative", mcfg, STFTConfig(960, 480))
    optimizer = make_optimizer(cfg)
    fs, T, B = 48000, 96000, 4
    rng = np.random.default_rng(0)
    clean = (0.1 * rng.standard_normal((B, T))).astype(np.float32)
    noisy = clean + (0.05 * rng.standard_normal((B, T))).astype(np.float32)
    lengths = np.asarray([96000, 93000, 90500, 96000], np.int32)

    states = {}
    for name, flag in (("per-direction", False), ("fused-bidir", True)):
        pl_ops.FUSED_BIDIR_TRAIN = flag
        params = M.init_bsrnn(jax.random.PRNGKey(0), mcfg)
        opt_state = optimizer.init(params)
        step = make_train_step(bundle, optimizer, cfg, fs)
        t0 = time.perf_counter()
        params, opt_state, _, m = step(
            params, opt_state, None, jax.random.PRNGKey(1), clean, noisy, lengths
        )
        jax.block_until_ready(m["loss"])
        print(f"{name}: compiled in {time.perf_counter()-t0:.1f}s "
              f"loss={float(m['loss']):.4f}", flush=True)
        states[name] = (flag, step, params, opt_state)
    pl_ops.FUSED_BIDIR_TRAIN = False

    losses = {}
    times = {"per-direction": [], "fused-bidir": []}
    for _ in range(3):
        for name in ("per-direction", "fused-bidir"):
            flag, step, params, opt_state = states[name]
            for _ in range(3):
                t0 = time.perf_counter()
                params, opt_state, _, m = step(
                    params, opt_state, None, jax.random.PRNGKey(2), clean,
                    noisy, lengths,
                )
                jax.block_until_ready(m["loss"])
                times[name].append(time.perf_counter() - t0)
            states[name] = (flag, step, params, opt_state)
            losses[name] = float(m["loss"])
    for name, ts in times.items():
        print(f"{name}: median {1e3*float(np.median(ts)):.1f} ms/step "
              f"(n={len(ts)}, min {1e3*min(ts):.1f}) "
              f"final loss={losses[name]:.6f}")


if __name__ == "__main__":
    main()
