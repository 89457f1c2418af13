#!/bin/env python
"""Pre-populate the persistent compilation cache for all sampling rates.

Production warm-up: compiles the train and/or inference program for every
(fs, 1 s-bucket) signature the multi-rate pipeline can emit, so the first
real epoch never stalls on a multi-minute XLA compile.  Run once per model
config / jax version; results land in the persistent cache directory shared
with the trainer and bench.

Usage: python scripts/precompile.py [--mode train|infer|both]
       [--seconds 2] [--batch_size 4] [--channels 196] [--layers 6]
"""

import argparse
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SAMPLE_RATES = (8000, 16000, 22050, 24000, 32000, 44100, 48000)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=("train", "infer", "both"), default="both")
    parser.add_argument("--seconds", type=int, default=2)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--channels", type=int, default=196)
    parser.add_argument("--layers", type=int, default=6)
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--cache_dir", default="/tmp/jax_cache")
    parser.add_argument("--rates", type=str, default="",
                        help="comma-separated fs subset (default: all 7)")
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.train.trainer import (
        build_model,
        make_optimizer,
        make_train_step,
    )

    # derive the model bundle exactly like the trainer does (use_pallas_lstm
    # "auto" resolution, config plumbing) so the cached HLO matches what the
    # first real epoch compiles — a hand-built BSRNNConfig drifted before
    cfg = Config(
        batch_size=args.batch_size, compute_dtype=args.compute_dtype,
        model_configs={"num_channel": args.channels, "num_layer": args.layers},
    )
    bundle = build_model(cfg)
    mcfg, stft_cfg = bundle.model_cfg, bundle.stft_cfg
    params = M.init_bsrnn(jax.random.PRNGKey(0), mcfg)
    # separate copy for inference: the train step donates its buffers
    params_inf = M.init_bsrnn(jax.random.PRNGKey(0), mcfg)
    optimizer = make_optimizer(cfg)

    from urgent2026_challenge_track1_tpu.parallel import make_mesh, replicated, shard_batch

    # place inputs/params exactly like the trainer (dp mesh shardings are
    # part of the lowered HLO; unsharded precompiles would miss the cache)
    mesh = make_mesh(cfg.mesh_shape)
    rep = replicated(mesh)
    rates = ([int(r) for r in args.rates.split(",") if r]
             or list(SAMPLE_RATES))
    rng = np.random.default_rng(0)
    # rethread donated (params, opt_state) across iterations like the
    # trainer does — reusing the originals after a donating call crashes
    # with 'Array has been deleted' on TPU (bench_train.py pattern)
    p_train = jax.device_put(params, rep)
    o_train = jax.device_put(optimizer.init(params), rep)
    ema = None
    for fs in rates:
        T = fs * args.seconds
        x = (0.1 * rng.standard_normal((args.batch_size, T))).astype(np.float32)
        if args.mode in ("train", "both"):
            t0 = time.perf_counter()
            step = make_train_step(bundle, optimizer, cfg, fs)
            batch = shard_batch(mesh, (x, x, np.full((args.batch_size,), T, np.int32)))
            p_train, o_train, ema, m = step(
                p_train, o_train, ema, jax.random.PRNGKey(1), *batch
            )
            jax.block_until_ready(m["loss"])
            print(f"train fs={fs}: compiled in {time.perf_counter()-t0:.1f}s", flush=True)
        if args.mode in ("infer", "both"):
            t0 = time.perf_counter()
            fn = jax.jit(
                lambda p, w, fs=fs: M.bsrnn_se_apply(p, mcfg, stft_cfg, w, fs)[0]
            )
            fn(params_inf, x[:1]).block_until_ready()
            print(f"infer fs={fs}: compiled in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
