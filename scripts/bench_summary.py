#!/bin/env python
"""Driver-adjacent benchmark summary (VERDICT r4 item 7).

bench.py keeps its ONE-json-line contract (discriminative inference RTF);
this script records the other two north-star rates the driver's artifact
was blind to, so regressions are visible round-over-round:

  train_step_ms   flagship masked train step (B=4, 2 s @ 48 kHz, 192x6,
                  bf16, Pallas recurrence) — the r4 attribution baseline
                  was ~109 ms net / ~125 ms wall
  flow_rtf        generative euler N=4 sampler RTF at the reference
                  geometry (384x6, n_fft=1536) on 16 kHz audio, B=8
  inference_rtf   same measurement as bench.py (B=64, 4 s @ 48 kHz)

Writes bench_summary_r5.json (committed to the repo).  Each measurement is
a median of --reps same-process iterations; cross-process comparisons are
noise (CLAUDE.md bimodality note).

Usage: python scripts/bench_summary.py [--out bench_summary_r5.json] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def med_time(fn, reps):
    fn()  # compile
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-geometry CPU plumbing check")
    ap.add_argument("--out", type=str, default="bench_summary_r5.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
    from urgent2026_challenge_track1_tpu.train import trainer as TR

    on_tpu = jax.devices()[0].platform == "tpu"
    cdtype = "bfloat16" if on_tpu else "float32"
    results = {"device": jax.devices()[0].platform}

    # ---- flagship train step ----
    fs, B, T = 48000, 4, 96000
    mcfg = M.BSRNNConfig(
        input_dim=481, num_channel=192 if on_tpu else 16,
        num_layer=6 if on_tpu else 1, causal=False, compute_dtype=cdtype,
        use_pallas_lstm=on_tpu,
    )
    bundle = TR.ModelBundle("discriminative", mcfg, STFTConfig(960, 480))
    cfg = Config(batch_size=B, compute_dtype=cdtype)
    optimizer = TR.make_optimizer(cfg)
    params = M.init_bsrnn(jax.random.PRNGKey(1), mcfg)
    # the train step donates its params/opt buffers — train on copies so
    # `params` survives for the inference measurement below
    tparams = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    opt_state = optimizer.init(tparams)
    step = TR.make_train_step(bundle, optimizer, cfg, fs)
    rng = np.random.default_rng(0)
    clean = jnp.asarray((rng.standard_normal((B, T)) * 0.1).astype(np.float32))
    noisy = clean + jnp.asarray(
        (rng.standard_normal((B, T)) * 0.03).astype(np.float32))
    lengths = jnp.asarray([T, T - 1711, T - 3000, T - 4801], jnp.int32)
    key = jax.random.PRNGKey(0)
    state = {"p": tparams, "o": opt_state}

    def train_once():
        state["p"], state["o"], _, m = step(
            state["p"], state["o"], None, key, clean, noisy, lengths)
        jax.block_until_ready(m["loss"])

    t = med_time(train_once, args.reps)
    results["train_step_ms"] = round(t * 1e3, 1)
    print(f"train_step_ms: {t*1e3:.1f}")
    del state, step, opt_state

    # ---- generative sampler RTF (reference geometry, euler N=4) ----
    fcfg = FM.FlowSEConfig(
        bsrnn_hidden=384 if on_tpu else 32, num_layer=6 if on_tpu else 1,
        compute_dtype=cdtype, use_pallas_lstm=on_tpu,
    )
    fparams = FM.init_flowse(jax.random.PRNGKey(2), fcfg)
    ffs, fB, fsec = 16000, 8, 3
    fwav = jnp.asarray(
        (np.random.default_rng(1).standard_normal((fB, ffs * fsec)) * 0.1
         ).astype(np.float32))
    flengths = jnp.full((fB,), ffs * fsec, jnp.int32)

    @jax.jit
    def flow_fn(p, x):
        return FM.flowse_enhance(p, fcfg, jax.random.PRNGKey(0), x, ffs,
                                 N=4, solver="euler", lengths=flengths)

    t = med_time(lambda: jax.block_until_ready(flow_fn(fparams, fwav)),
                 args.reps)
    results["flow_rtf_euler_n4"] = round(fB * fsec / t, 2)
    results["flow_geometry"] = {"hidden": fcfg.bsrnn_hidden,
                                "layers": fcfg.num_layer, "fs": ffs,
                                "batch": fB, "seconds": fsec}
    print(f"flow_rtf_euler_n4: {results['flow_rtf_euler_n4']}x")
    del fparams

    # ---- discriminative inference RTF (bench.py's measurement) ----
    iB, isec = (64, 4) if on_tpu else (2, 1)
    iwav = jnp.asarray(
        (np.random.default_rng(0).standard_normal((iB, fs * isec)) * 0.1
         ).astype(np.float32))

    @jax.jit
    def inf_fn(p, w):
        out, _ = M.bsrnn_se_apply(p, mcfg, STFTConfig(960, 480), w, fs)
        return out

    t = med_time(lambda: jax.block_until_ready(inf_fn(params, iwav)),
                 args.reps)
    results["inference_rtf"] = round(iB * isec / t, 2)
    print(f"inference_rtf: {results['inference_rtf']}x")

    Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
