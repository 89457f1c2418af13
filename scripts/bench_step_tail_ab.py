#!/bin/env python
"""Same-process A/B of the train step's element-wise tail (VERDICT r4 item 4).

bench_train_detail attributed ~14 ms of the 109 ms flagship step to the
optimizer/NaN-guard chain and ~18 ms to the losses; a 36M-param AdamW update
is ~1 GB of HBM traffic (~1-2 ms at v5e bandwidth), so the tail carries
either redundant full passes or many-small-kernel overhead (~300 param
leaves x several fused loops each).  Variants, all with TRUE-skip NaN
semantics (params AND opt state unchanged on a non-finite-grad step):

  base  the production make_train_step: stacked per-leaf isfinite
        reduction, grad zeroing, update gating, per-leaf state gating
  lean  one stat pass: per-leaf sum-of-squares feeds BOTH the weighted
        grad-norm telemetry and the finiteness flag (a non-finite grad
        makes the norm non-finite); no grad zeroing; gate params/state once
  flat  lean + the optimizer runs on ONE concatenated f32 vector (clip +
        adamw + lr on a single leaf) — collapses the per-leaf kernel zoo;
        mathematically identical (clip is a global scalar; adam is
        element-wise), checkpoint layout differs (flat m/v)

Numerics are cross-checked (one step from identical init must agree) before
timing.  Usage: python scripts/bench_step_tail_ab.py [--reps 15] [--cpu]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from urgent2026_challenge_track1_tpu.config import Config
from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.train import losses
from urgent2026_challenge_track1_tpu.train import trainer as TR


def make_loss(bundle, fs):
    def loss_and_metrics(params, key, clean, noisy, lengths):
        wav, _ = M.bsrnn_se_apply(
            params, bundle.model_cfg, bundle.stft_cfg, noisy, fs, lengths=lengths
        )
        loss = losses.multi_res_l1_spec_loss(clean, wav, lengths).mean()
        loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
        sisnr = jax.lax.stop_gradient(losses.si_snr(clean, wav, lengths).mean())
        return loss, {"sisnr": sisnr}

    return loss_and_metrics


def make_base_step(loss_and_metrics, optimizer):
    """The r4-era production tail (pre-lean): stacked per-leaf isfinite
    reduction, grad zeroing, separate update gating + state gating — kept
    here verbatim as the A/B baseline after trainer.make_train_step moved
    to the lean tail."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, clean, noisy, lengths):
        (loss, extra), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
            params, key, clean, noisy, lengths
        )
        gnorm = TR._weighted_grad_norm(grads)
        grads, bad = TR._zero_nonfinite(grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(
            lambda u: jnp.where(bad, jnp.zeros_like(u), u), updates
        )
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(bad, old, new), opt_state, new_opt_state
        )
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "grad_norm": gnorm, "nan_grad": bad, **extra}
        return params, opt_state, metrics

    return step


def make_flat_optimizer(cfg: Config):
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.gradient_clip),
            optax.adamw(
                learning_rate, eps=cfg.adam_epsilon, weight_decay=cfg.weight_decay
            ),
        )
    )(learning_rate=cfg.learning_rate)
    return opt


def make_flat_step(loss_and_metrics, flat_opt, params0):
    flatdef = [(np.prod(p.shape, dtype=int), p.shape) for p in jax.tree.leaves(params0)]
    treedef = jax.tree.structure(params0)

    def ravel(tree):
        return jnp.concatenate(
            [l.astype(jnp.float32).reshape(-1) for l in jax.tree.leaves(tree)]
        )

    def unravel(vec):
        out, o = [], 0
        for sz, shp in flatdef:
            out.append(vec[o : o + sz].reshape(shp))
            o += sz
        return jax.tree.unflatten(treedef, out)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, clean, noisy, lengths):
        (loss, extra), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
            params, key, clean, noisy, lengths
        )
        g = ravel(grads)
        p = ravel(params)
        sumsq = jnp.sum(jnp.square(g))
        # weighted-norm telemetry needs per-leaf norms; still one data pass
        leaves = jax.tree.leaves(grads)
        n = sum(l.size for l in leaves)
        gnorm = sum(
            jnp.linalg.norm(l.astype(jnp.float32).reshape(-1)) * l.size
            for l in leaves
        ) / (n + 1e-5)
        bad = ~jnp.isfinite(jnp.sqrt(sumsq))
        updates, new_opt_state = flat_opt.update(g, opt_state, p)
        new_p = optax.apply_updates(p, updates)
        p = jnp.where(bad, p, new_p)
        opt_state = jax.tree.map(
            lambda o, nw: jnp.where(bad, o, nw), opt_state, new_opt_state
        )
        metrics = {"loss": loss, "grad_norm": gnorm, "nan_grad": bad, **extra}
        return unravel(p), opt_state, metrics

    def init(params):
        return flat_opt.init(ravel(params))

    return step, init, ravel


def timeit(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="step_tail_ab_r5.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    fs, B = args.fs, args.batch
    T = int(fs * args.seconds)
    cdtype = "float32" if args.cpu else "bfloat16"
    cfg = Config(batch_size=B, compute_dtype=cdtype)
    mcfg = M.BSRNNConfig(
        input_dim=481,
        num_channel=16 if args.cpu else 192,
        num_layer=2 if args.cpu else 6,
        causal=False,
        compute_dtype=cdtype,
        use_pallas_lstm=jax.devices()[0].platform == "tpu",
    )
    bundle = TR.ModelBundle("discriminative", mcfg, dsp.STFTConfig(960, 480))
    loss_fn = make_loss(bundle, fs)

    params0 = M.init_bsrnn(jax.random.PRNGKey(1), mcfg)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    clean = jnp.asarray((rng.standard_normal((B, T)) * 0.1).astype(np.float32))
    noisy = clean + jnp.asarray((rng.standard_normal((B, T)) * 0.03).astype(np.float32))
    lengths = jnp.asarray([T, T - 1711, T - 3000, T - 4801][:B] + [T] * max(0, B - 4),
                          jnp.int32)
    batch = (key, clean, noisy, lengths)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

    optimizer = TR.make_optimizer(cfg)
    # "lean" is the production step (trainer.make_train_step, post-r5 tail)
    lean_step_full = TR.make_train_step(bundle, optimizer, cfg, fs)

    def lean_step(p, o, *b):
        p, o, _, m = lean_step_full(p, o, None, *b)
        return p, o, m

    base_step = make_base_step(loss_fn, optimizer)
    flat_opt = make_flat_optimizer(cfg)
    flat_step, flat_init, ravel = make_flat_step(loss_fn, flat_opt, params0)

    # ---- numerics cross-check: one step from identical init ----
    outs = {}
    outs["base"] = base_step(copy(params0), optimizer.init(copy(params0)), *batch)
    outs["lean"] = lean_step(copy(params0), optimizer.init(copy(params0)), *batch)
    outs["flat"] = flat_step(copy(params0), flat_init(params0), *batch)
    ref = ravel(outs["base"][0])
    checks = {}
    for name in ("lean", "flat"):
        got = ravel(outs[name][0])
        maxdiff = float(jnp.max(jnp.abs(got - ref)))
        checks[name] = maxdiff
        print(f"{name}: max |params - base_params| after 1 step = {maxdiff:.3e}")
        assert maxdiff < 5e-5, (name, maxdiff)

    results = {
        "geometry": {"B": B, "fs": fs, "seconds": args.seconds,
                     "device": jax.devices()[0].platform},
        "max_param_diff_vs_base": checks,
    }

    # ---- same-process timing, interleaved rounds to beat tunnel drift ----
    states = {
        "base": (copy(params0), optimizer.init(copy(params0))),
        "lean": (copy(params0), optimizer.init(copy(params0))),
        "flat": (copy(params0), flat_init(params0)),
    }
    steps = {"base": base_step, "lean": lean_step, "flat": flat_step}
    times = {k: [] for k in steps}
    # warm (compile already done above, but donation consumed those buffers)
    for name in steps:
        p, o = states[name]
        p, o, m = steps[name](p, o, *batch)
        jax.block_until_ready(m["loss"])
        states[name] = (p, o)
    for _ in range(args.reps):
        for name in steps:
            p, o = states[name]
            t0 = time.perf_counter()
            p, o, m = steps[name](p, o, *batch)
            jax.block_until_ready(m["loss"])
            times[name].append(time.perf_counter() - t0)
            states[name] = (p, o)
    for name, ts in times.items():
        med = float(np.median(ts)) * 1e3
        results[name] = {"step_ms": round(med, 2)}
        print(f"{name}: {med:.2f} ms/step (n={len(ts)})")
    results["lean_speedup"] = round(
        results["base"]["step_ms"] / results["lean"]["step_ms"], 3)
    results["flat_speedup"] = round(
        results["base"]["step_ms"] / results["flat"]["step_ms"], 3)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps({k: results[k] for k in ("base", "lean", "flat",
                                              "lean_speedup", "flat_speedup")}))


if __name__ == "__main__":
    main()
