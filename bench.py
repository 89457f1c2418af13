#!/bin/env python
"""Benchmark: flagship BSRNN inference real-time factor on one TPU chip.

Prints ONE JSON line:
  {"metric": "bsrnn_inference_rtf", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

The driver-set north star (BASELINE.json) is RTF >= 100x per chip, so
``vs_baseline = rtf / 100``.  Runs on whatever platform jax picks (the real
TPU under the driver; CPU if forced locally).

The measurement runs in a CHILD process with a hard timeout and one retry:
a wedged remote-TPU tunnel blocks PJRT calls indefinitely (observed live in
round 3 — even ``jax.devices()`` hangs, unkillable from within the
process), and the bench must stay bounded for the driver.  On persistent
failure it still prints exactly one JSON line, with an ``error`` field.
"""

import json
import os
import subprocess
import sys
import time

# seconds per attempt: tunnel compiles take 5-10 min (CLAUDE.md); leave
# headroom without letting a dead tunnel eat the driver's round end
ATTEMPT_TIMEOUT = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1500"))
ATTEMPTS = 2


def measure():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: repeat bench runs skip the multi-minute
    # XLA compile (safe on TPU; ignored where unsupported)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
    from urgent2026_challenge_track1_tpu.models import bsrnn as M

    cfg = M.BSRNNConfig(
        input_dim=481, num_channel=192, num_layer=6, causal=False,
        compute_dtype="bfloat16",  # inference default: f32 residual/cell state
        use_pallas_lstm=True,
    )
    stft_cfg = STFTConfig(n_fft=960, hop_length=480)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)

    fs = 48000
    seconds = 4
    # same-process A/B (B=16/32/64/128, repeated control): throughput rises
    # ~14% from B=16 to B=64 and only ~3% more at B=128 — B=64 is the knee
    B = 64
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, fs * seconds)).astype(np.float32)
        * 0.1
    )

    @jax.jit
    def fn(params, wav):
        out, _ = M.bsrnn_se_apply(params, cfg, stft_cfg, wav, fs)
        return out

    # warmup / compile
    fn(params, wav).block_until_ready()
    fn(params, wav).block_until_ready()
    # median of per-iteration timings: the remote-TPU tunnel occasionally
    # stalls a single dispatch, which a mean over few iters would absorb
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        fn(params, wav).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    audio_seconds = B * seconds
    rtf = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "bsrnn_inference_rtf",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 100.0, 3),
            }
        )
    )


def main():
    if os.environ.get("BENCH_CHILD") == "1":
        measure()
        return
    err = "unknown"
    for attempt in range(ATTEMPTS):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "BENCH_CHILD": "1"},
                capture_output=True,
                text=True,
                timeout=ATTEMPT_TIMEOUT,
            )
        except subprocess.TimeoutExpired:
            err = f"timeout after {ATTEMPT_TIMEOUT}s (TPU tunnel unresponsive)"
            continue
        for line in reversed(r.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                print(line)
                return
        err = f"child exited rc={r.returncode}: {r.stderr.strip()[-300:]}"
    print(
        json.dumps(
            {
                "metric": "bsrnn_inference_rtf",
                "value": 0.0,
                "unit": "x_realtime",
                "vs_baseline": 0.0,
                "error": err,
            }
        )
    )


if __name__ == "__main__":
    main()
