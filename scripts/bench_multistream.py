#!/bin/env python
"""Measured concurrent real-time streaming capacity (VERDICT r3 item 9).

Round 3 claimed "~14 concurrent real-time 48 kHz streams per chip" by
extrapolating a single-session step time.  This measures it: batched-rows
``StreamingSession`` (the same stateful path ``serve.py /stream`` drives) at
B in {1, 4, 8, 16}, fed real-time-sized chunks of synthesized speech, with
per-feed wall latency (median/p95 over the dispatch loop, including the
session's host-side overlap-add bookkeeping).  A batch of B streams is
real-time iff the p95 feed wall stays under the chunk's audio duration;
per-stream RT factor = B * chunk_s / median_wall.

The r4 capacity ceiling was dispatch-floor-bound: every feed pays the
remote-tunnel dispatch floor (~31-39 ms) regardless of B, so 16 streams
missed real time only at p95 at 80 ms chunks.  The amortization (VERDICT r4
item 5) is chunk chaining: the recurrence is frame-based, so a session at
chunk_frames=16 processes two 80 ms chunks per dispatch — one dispatch
floor per 160 ms budget — at the cost of one extra chunk of algorithmic
latency.  ``--chunk_frames`` therefore accepts a comma list and the sweep
records each (B, chunk) row.

Usage: python scripts/bench_multistream.py [--fs 48000] [--feeds 100]
       [--batches 1,4,8,16] [--chunk_frames 8,16]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.models import streaming_causal as SC
from urgent2026_challenge_track1_tpu.utils.speech_synth import synth_speech


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--channels", type=int, default=192)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--feeds", type=int, default=100)
    ap.add_argument("--chunk_frames", type=str, default="8,16",
                    help="comma list; >8 chains multiple 80 ms chunks into "
                         "one dispatch (amortizes the tunnel dispatch floor "
                         "for +1 chunk latency)")
    ap.add_argument("--batches", type=str, default="1,4,8,16")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="multistream_r5.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    fs = args.fs
    cfg = M.BSRNNConfig(
        input_dim=481, num_channel=args.channels, num_layer=args.layers,
        causal=True, streaming_norm=True, compute_dtype=args.dtype,
        use_pallas_lstm=jax.devices()[0].platform == "tpu",
    )
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)

    rows = []
    grid = [(B, cf)
            for cf in [int(c) for c in str(args.chunk_frames).split(",") if c]
            for B in [int(b) for b in args.batches.split(",") if b]]
    for B, chunk_frames in grid:
        sess = SC.StreamingSession(params, cfg, stft_cfg, fs, batch=B,
                                   chunk_frames=chunk_frames)
        chunk = chunk_frames * sess.hop  # fs-scaled hop (960/480 @48k)
        chunk_ms = 1e3 * chunk / fs
        # B distinct speech streams, long enough for the feed loop
        wav = np.stack([
            synth_speech(np.random.default_rng(i), fs,
                         (args.feeds + 4) * chunk / fs, 100.0 + 9 * i)
            for i in range(B)
        ])
        # warmup (compile) feeds
        for i in range(3):
            sess.feed(wav[:, i * chunk:(i + 1) * chunk])
        laps = []
        for i in range(3, 3 + args.feeds):
            t0 = time.perf_counter()
            out = sess.feed(wav[:, i * chunk:(i + 1) * chunk])
            laps.append(time.perf_counter() - t0)
        med, p95 = float(np.median(laps)), float(np.percentile(laps, 95))
        rtf = B * (chunk / fs) / med
        rows.append({
            "streams": B, "chunk_frames": chunk_frames,
            "chunk_ms": round(chunk_ms, 1),
            "latency_ms": round(1e3 * sess.latency_samples / fs, 1),
            "median_ms": round(med * 1e3, 2), "p95_ms": round(p95 * 1e3, 2),
            "per_stream_rt": p95 < chunk / fs,
            "aggregate_rtf": round(rtf, 1),
        })
        print(f"B={B:3d} cf={chunk_frames:2d}: chunk {chunk_ms:.0f} ms — median "
              f"{med*1e3:.2f} ms, p95 {p95*1e3:.2f} ms, aggregate RTF "
              f"{rtf:.1f}x, real-time={'YES' if p95 < chunk/fs else 'NO'}")

    dev = jax.devices()[0].platform
    out = {"device": dev, "fs": fs,
           "channels": args.channels, "layers": args.layers, "rows": rows}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
