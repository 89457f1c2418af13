#!/bin/env python
"""Real-time streaming-causal enhancement: on-chip per-chunk latency / RTF.

Measures the stateful streaming step (models/streaming_causal.py) at the
flagship causal geometry: one jitted program consuming chunk_frames*hop new
samples, carrying all model + DSP state on device.  Reports per-step wall
latency (median + p95 over the dispatch loop) against the chunk's audio
duration — the number that decides whether a live stream keeps up.

Usage: python scripts/bench_streaming.py [chunk_frames ...] [--fs 48000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.models import streaming_causal as SC


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("chunks", nargs="*", type=int, default=None)
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--channels", type=int, default=196)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    chunk_list = args.chunks or [2, 4, 8, 16]

    cfg = M.BSRNNConfig(
        num_channel=args.channels, num_layer=args.layers, causal=True,
        streaming_norm=True, compute_dtype=args.dtype,
    )
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    fs = args.fs
    rng = np.random.default_rng(0)

    for C in chunk_list:
        step, n_fft, hop, n_bands = SC.make_streaming_step(
            cfg, stft_cfg, fs, chunk_frames=C
        )
        state = {
            "model": SC.init_model_states(params, cfg, 1, n_bands),
            "in_tail": jnp.zeros((1, n_fft - hop), jnp.float32),
            "ola": jnp.zeros((1, n_fft - hop), jnp.float32),
            "env": jnp.zeros((n_fft - hop,), jnp.float32),
        }
        chunk = jnp.asarray(
            0.1 * rng.standard_normal((1, C * hop)).astype(np.float32)
        )
        nv = jnp.asarray(C, jnp.int32)
        state, out = step(params, state, chunk, nv)  # compile
        out.block_until_ready()
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, out = step(params, state, chunk, nv)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        ms = np.asarray(times) * 1e3
        audio_ms = C * hop / fs * 1e3
        med = float(np.median(ms))
        # device-side per-step cost: chain S steps inside ONE program (the
        # host-observed single-step number above is dominated by the remote
        # tunnel's dispatch round-trip on this image)
        S = 32
        chunks = jnp.asarray(
            0.1 * rng.standard_normal((S, 1, C * hop)).astype(np.float32)
        )

        def many(params, st, chunks):
            def body(s, ch):
                s2, out = step(params, s, ch, nv)
                return s2, out

            return jax.lax.scan(body, st, chunks)

        many_j = jax.jit(many)
        st2, outs = many_j(params, state, chunks)
        outs.block_until_ready()
        t = []
        for _ in range(7):
            t0 = time.perf_counter()
            st2, outs = many_j(params, state, chunks)
            outs.block_until_ready()
            t.append(time.perf_counter() - t0)
        dev_ms = float(np.median(t)) * 1e3 / S
        print(
            f"streaming step C={C:>2} ({audio_ms:6.1f} ms audio): "
            f"host median {med:6.2f} ms (p95 {float(np.percentile(ms, 95)):6.2f})"
            f" -> RTF {audio_ms/med:5.1f}x | device {dev_ms:6.2f} ms/step"
            f" -> RTF {audio_ms/dev_ms:5.1f}x | algorithmic latency "
            f"{(C*hop + n_fft//2)/fs*1e3:5.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
