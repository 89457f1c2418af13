#!/bin/env python
"""On-device render component attribution at the flagship geometry.

The round-4 supply study (train_supply_r4.json) put device-DM render
overhead at ~70 ms/step over the pre-simulated leg after the pow2-grid
bandwidth fix (it was ~1 s before).  This times each render op standalone,
same-process, at B=4 x 2 s @ 48 kHz (T=96000) so the remaining overhead is
attributed rather than asserted.  Ops are jitted exactly as render_batch
composes them (reference op inventory: simulate_data_from_param.py
pipeline; device path: simulation/jax_dsp.py render_batch).

Each op is timed with the median of --iters blocking calls after a warmup;
the null-dispatch floor (an empty jitted function) is subtracted, matching
bench_train_detail.py's methodology on the remote tunnel.

Usage: python scripts/bench_render_detail.py [--iters 30] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def median_ms(fn, args, iters):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--seconds", type=int, default=2)
    ap.add_argument("--rir_len", type=int, default=16000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="render_detail_r4.json")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.simulation import jax_dsp as dev

    B, T = args.batch, args.fs * args.seconds
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    rir = jnp.asarray(
        (rng.standard_normal((B, args.rir_len)) *
         np.exp(-np.arange(args.rir_len) / 4000.0)).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    freqs = np.fft.rfftfreq(T, 1.0 / args.fs)
    bw_mask = jnp.asarray(np.tile(
        (freqs <= 8000.0).astype(np.float32), (B, 1)))
    packet_mask = jnp.asarray(
        (rng.random((B, T // (args.fs // 50))) > 0.1).astype(np.float32))
    snr = jnp.asarray(rng.uniform(2, 15, B).astype(np.float32))
    clip_lo = jnp.full((B,), 0.02, jnp.float32)
    clip_hi = jnp.full((B,), 0.98, jnp.float32)

    floor = median_ms(jax.jit(lambda a: a), (jnp.zeros(()),), args.iters)

    ops = {
        "rir_convolve_full+early": (
            jax.jit(lambda s, h: (dev.fft_convolve(s, h),
                                  dev.fft_convolve(
                                      s, h * dev.early_rir_mask(h, args.fs)))),
            (x, rir)),
        "mix_at_snr": (jax.jit(dev.mix_at_snr), (x, noise, snr)),
        "bandwidth_mask_apply": (
            jax.jit(dev.bandwidth_mask_apply), (x, bw_mask)),
        "quantile_clip": (
            jax.jit(lambda a, lo, hi: dev.quantile_clip(
                a, lo, hi, lengths=lengths)),
            (x, clip_lo, clip_hi)),
        "apply_packet_loss": (
            jax.jit(dev.apply_packet_loss), (x, packet_mask)),
        "high_pass": (jax.jit(lambda a: dev.high_pass(a, args.fs)), (x,)),
    }
    rows = {}
    for name, (fn, a) in ops.items():
        ms = median_ms(fn, a, args.iters)
        rows[name] = round(max(ms - floor, 0.0), 2)
        print(f"{name:28s} {rows[name]:8.2f} ms (raw {ms:.2f})", flush=True)
    print(f"{'null-dispatch floor':28s} {floor:8.2f} ms")

    result = {
        "geometry": {"B": B, "fs": args.fs, "seconds": args.seconds,
                     "device": "cpu" if args.cpu else "tpu"},
        "floor_ms": round(floor, 2),
        "net_ms": rows,
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
