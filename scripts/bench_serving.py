#!/bin/env python
"""Online-serving benchmark: dynamic batching vs B=1 dispatch.

Measures the `serving.BatchingEngine` under offered concurrency —
throughput (x real-time) and p50/p95 request latency — against the naive
one-request-per-dispatch baseline (the reference's serving shape,
``inference.py:48-64``).  Run on the TPU (default) for real numbers; pass
``--device cpu`` with ``--model tiny`` for a host smoke.

Usage:
  python scripts/bench_serving.py [--model flagship|tiny] [--device tpu|cpu]
      [--concurrency 1 4 8 16] [--requests 64] [--seconds 4] [--fs 48000]
"""

import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["flagship", "tiny"], default="flagship")
    ap.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    ap.add_argument("--concurrency", type=int, nargs="*", default=[1, 4, 8, 16])
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: repeat runs skip the tunnel compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.serving import (
        BatchingEngine,
        make_enhance_fn,
    )

    if args.model == "flagship":  # bench.py geometry
        cfg = M.BSRNNConfig(input_dim=481, num_channel=192, num_layer=6,
                            causal=False, compute_dtype="bfloat16",
                            use_pallas_lstm="auto")
    else:
        cfg = M.BSRNNConfig(num_channel=8, num_layer=1)
    stft_cfg = STFTConfig(n_fft=960, hop_length=480)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    enhance = make_enhance_fn("discriminative", params, cfg, stft_cfg)

    T = int(args.seconds * args.fs)
    rng = np.random.default_rng(0)
    wavs = [0.1 * rng.standard_normal(T).astype(np.float32)
            for _ in range(args.requests)]

    def run(max_batch: int, conc: int):
        eng = BatchingEngine(enhance, max_batch=max_batch,
                             max_wait_ms=args.max_wait_ms)
        try:
            # warm the compile caches (pow2 batch shapes up to max_batch)
            b = 1
            while b <= max_batch:
                [f.result() for f in
                 [eng.submit(wavs[0], args.fs) for _ in range(b)]]
                b *= 2
            eng.reset_stats()
            lat = []
            t0 = time.perf_counter()

            def one(w):
                t = time.perf_counter()
                eng.enhance_sync(w, args.fs, timeout=600)
                lat.append(time.perf_counter() - t)

            with ThreadPoolExecutor(conc) as pool:
                list(pool.map(one, wavs))
            wall = time.perf_counter() - t0
            snap = eng.snapshot()
        finally:
            eng.close()
        audio_s = args.requests * args.seconds
        return (audio_s / wall, float(np.percentile(lat, 50)) * 1e3,
                float(np.percentile(lat, 95)) * 1e3,
                snap["mean_batch_occupancy"])

    print(f"model={args.model} fs={args.fs} T={args.seconds}s "
          f"requests={args.requests} max_wait={args.max_wait_ms}ms")
    print(f"{'conc':>5} {'mode':>8} {'RTF':>8} {'p50 ms':>9} {'p95 ms':>9} "
          f"{'occupancy':>9}")
    for conc in args.concurrency:
        for mode, mb in (("B=1", 1), ("batched", args.max_batch)):
            rtf, p50, p95, occ = run(mb, conc)
            print(f"{conc:>5} {mode:>8} {rtf:>7.1f}x {p50:>9.1f} {p95:>9.1f} "
                  f"{occ:>9.2f}", flush=True)


if __name__ == "__main__":
    main()
