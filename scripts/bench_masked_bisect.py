#!/bin/env python
"""Same-process A/B/C/D bisect of the length-exact training cost.

Round-3 threading of ``lengths`` through the train step moved the measured
step time well above the round-2 unmasked number; cross-run tunnel drift
makes that comparison unreliable, so this compiles FOUR variants of the
discriminative train step in ONE process and alternates timing loops
(CLAUDE.md benchmark discipline):

  legacy        lengths=None in model AND losses (round-2 semantics)
  model-masked  masked model (reflect-tail STFT, masked norms, per-direction
                masked recurrences, masked iSTFT), unmasked losses
  loss-masked   unmasked model (fused bidirectional kernel), masked losses
  masked        the shipping step (both masked)

Reference geometry: B=4, 2 s @ 48 kHz, 196x6 bf16.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from functools import partial

import optax

from urgent2026_challenge_track1_tpu.config import Config
from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.train import losses
from urgent2026_challenge_track1_tpu.train.trainer import make_optimizer


def build_step(mcfg, stft_cfg, optimizer, fs, mask_model, mask_loss):
    def loss_fn(params, clean, noisy, lengths):
        wav, _ = M.bsrnn_se_apply(
            params, mcfg, stft_cfg, noisy, fs,
            lengths=lengths if mask_model else None,
        )
        ll = lengths if mask_loss else None
        return losses.multi_res_l1_spec_loss(clean, wav, ll).mean()

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, clean, noisy, lengths):
        loss, grads = jax.value_and_grad(loss_fn)(params, clean, noisy, lengths)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def main():
    cfg = Config(batch_size=4, compute_dtype="bfloat16", use_pallas_lstm="true")
    mcfg = M.BSRNNConfig(
        input_dim=481, num_channel=196, num_layer=6, causal=False,
        compute_dtype="bfloat16", use_pallas_lstm=True,
    )
    stft_cfg = STFTConfig(960, 480)
    optimizer = make_optimizer(cfg)
    fs, T, B = 48000, 96000, 4
    rng = np.random.default_rng(0)
    clean = (0.1 * rng.standard_normal((B, T))).astype(np.float32)
    noisy = clean + (0.05 * rng.standard_normal((B, T))).astype(np.float32)
    lengths = jnp.asarray([96000, 93000, 90500, 96000], np.int32)

    variants = [
        ("legacy      ", False, False),
        ("model-masked", True, False),
        ("loss-masked ", False, True),
        ("masked      ", True, True),
    ]
    if len(sys.argv) > 1:  # e.g. `bench_masked_bisect.py legacy masked`
        want = {w.strip() for w in sys.argv[1:]}
        variants = [v for v in variants if v[0].strip() in want]
    states = {}
    for name, mm, ml in variants:
        params = M.init_bsrnn(jax.random.PRNGKey(0), mcfg)
        opt_state = optimizer.init(params)
        step = build_step(mcfg, stft_cfg, optimizer, fs, mm, ml)
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, clean, noisy, lengths)
        jax.block_until_ready(loss)
        print(f"{name}: compiled in {time.perf_counter()-t0:.1f}s "
              f"loss={float(loss):.4f}", flush=True)
        states[name] = (step, params, opt_state)

    times = {name: [] for name, _, _ in variants}
    for _ in range(3):
        for name, _, _ in variants:
            step, params, opt_state = states[name]
            for _ in range(3):
                t0 = time.perf_counter()
                params, opt_state, loss = step(
                    params, opt_state, clean, noisy, lengths
                )
                jax.block_until_ready(loss)
                times[name].append(time.perf_counter() - t0)
            states[name] = (step, params, opt_state)
    for name, ts in times.items():
        print(f"{name}: median {1e3*float(np.median(ts)):.1f} ms/step "
              f"(n={len(ts)}, min {1e3*min(ts):.1f})")


if __name__ == "__main__":
    main()
