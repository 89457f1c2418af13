#!/bin/env python
"""Pallas vs lax.scan LSTM recurrence on the flagship shapes (TPU)."""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from urgent2026_challenge_track1_tpu.ops.lstm import _scan_dir
from urgent2026_challenge_track1_tpu.ops.pallas_lstm import lstm_scan_pallas


def timeit(fn, *args, n=10):
    fn(*args).block_until_ready()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        times.append(time.perf_counter() - t0)
    # median: the remote-TPU tunnel occasionally stalls one dispatch
    return float(np.median(times))


def main():
    rng = np.random.default_rng(0)
    # (label, B padded, T, H): flagship time-LSTM (B=4*34 bands -> 144) and
    # band-LSTM (B=4*401 frames -> 1616) shapes, bf16
    cases = [("time-LSTM", 144, 401, 384)]  # band-LSTM (1616, 34) blows VMEM: block too large
    for label, B, T, H in cases:
        xp = jnp.asarray(
            rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.3
        ).astype(jnp.bfloat16)
        whh = jnp.asarray(
            rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        scan = jax.jit(lambda x, w: _scan_dir(x, w, H, False))
        t_scan = timeit(scan, xp, whh)
        pallas = jax.jit(lambda x, w: lstm_scan_pallas(x, w, reverse=False))
        t_pl = timeit(pallas, xp, whh)
        # numerics
        a = np.asarray(scan(xp, whh), np.float32)
        b = np.asarray(pallas(xp, whh), np.float32)
        err = np.abs(a - b).max()
        print(
            f"{label}: scan {t_scan*1e3:.2f} ms, pallas {t_pl*1e3:.2f} ms "
            f"({t_scan/t_pl:.2f}x), max err {err:.2e}"
        )


if __name__ == "__main__":
    main()
