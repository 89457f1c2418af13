#!/bin/env python
"""Training-step throughput on the real TPU (flagship discriminative BSRNN).

Measures the full jitted train step (fwd + bwd + clip + NaN guard + AdamW)
at the BSRNN_baseline config geometry: batch 4 x 2 s @ 48 kHz (max_duration
96000 samples).
"""

import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from urgent2026_challenge_track1_tpu.config import Config
from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.train.trainer import (
    ModelBundle,
    make_optimizer,
    make_train_step,
)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    use_pallas = (sys.argv[2].lower() in ("pallas", "true", "1")) if len(sys.argv) > 2 else False
    remat = (sys.argv[3].lower() not in ("noremat", "false", "0")) if len(sys.argv) > 3 else True
    cfg = Config(batch_size=4)
    bundle = ModelBundle(
        "discriminative",
        M.BSRNNConfig(input_dim=481, num_channel=196, num_layer=6, causal=False,
                      compute_dtype=dtype, use_pallas_lstm=use_pallas, remat=remat),
        STFTConfig(n_fft=960, hop_length=480),
    )
    fs, T, B = 48000, 96000, 4
    params = M.init_bsrnn(jax.random.PRNGKey(0), bundle.model_cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(bundle, optimizer, cfg, fs)

    rng = np.random.default_rng(0)
    clean = (0.1 * rng.standard_normal((B, T))).astype(np.float32)
    noisy = clean + (0.05 * rng.standard_normal((B, T))).astype(np.float32)
    key = jax.random.PRNGKey(1)
    lengths = np.full((B,), T, np.int32)

    # warmup/compile (donated buffers -> must rethread state)
    params, opt_state, _, m = step_fn(params, opt_state, None, key, clean, noisy, lengths)
    jax.block_until_ready(m["loss"])
    print(f"compile ok, loss={float(m['loss']):.4f}", flush=True)

    n = 10
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        params, opt_state, _, m = step_fn(params, opt_state, None, key, clean, noisy, lengths)
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    # median: the remote-TPU tunnel occasionally stalls one dispatch
    dt = float(np.median(times))
    audio_s = B * T / fs
    print(
        f"train step ({dtype}, pallas={use_pallas}, remat={remat}): {dt*1e3:.1f} ms  ({1/dt:.2f} steps/s, "
        f"{audio_s/dt:.1f} audio-s/s, loss={float(m['loss']):.4f}, "
        f"grad_norm={float(m['grad_norm']):.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
