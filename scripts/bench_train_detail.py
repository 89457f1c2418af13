#!/bin/env python
"""Component-level TPU timing for the masked TRAINING step (VERDICT r3
item 4: attribute the ~125 ms flagship step instead of asserting it's
recurrence-bound).

Times, same-process at the flagship geometry (B=4, 2 s @ 48 kHz, 192 ch x 6
layers, bf16 compute, masked lengths — reference demand analysis in
PARITY.md):

  step      full jitted train step (fwd + bwd + optimizer + EMA-free)
  grad      value_and_grad of the masked loss (no optimizer)
  fwd       loss forward only
  opt       optimizer.update + NaN-gating + apply_updates on fixed grads
  rec       6x dual-path recurrence fwd+bwd alone (masked bilstm path)
  bsdec     band split + both decoder heads + iSTFT fwd+bwd
  stft      STFT encode forward
  loss      MR-L1 + SI-SNR fwd + bwd w.r.t. the enhanced waveform

The residual grad - (rec + bsdec + stft + loss) is XLA fusion overlap /
scheduling slack; a small residual means the breakdown accounts for the
step.  Timings are medians; the tunnel's run-to-run variance makes only
SAME-PROCESS ratios meaningful (CLAUDE.md).

Usage: python scripts/bench_train_detail.py [--seconds 2] [--batch 4]
       [--reps 9] [--fs 48000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from urgent2026_challenge_track1_tpu.config import Config
from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.train import losses
from urgent2026_challenge_track1_tpu.train import trainer as TR


def timeit(fn, *args, reps=9):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke run (plumbing check, not a benchmark)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    fs, B = args.fs, args.batch
    T = int(fs * args.seconds)
    # CPU's DotThunk rejects bf16 x bf16 -> f32; the smoke run uses f32
    cdtype = "float32" if args.cpu else "bfloat16"
    cfg = Config(batch_size=B, compute_dtype=cdtype)
    mcfg = M.BSRNNConfig(
        input_dim=481, num_channel=192 if not args.cpu else 16,
        num_layer=6 if not args.cpu else 2, causal=False,
        compute_dtype=cdtype,
        use_pallas_lstm=jax.devices()[0].platform == "tpu",
    )
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    bundle = TR.ModelBundle("discriminative", mcfg, stft_cfg)
    optimizer = TR.make_optimizer(cfg)

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    noisy = clean + jnp.asarray(
        rng.standard_normal((B, T)).astype(np.float32) * 0.03
    )
    lengths = jnp.asarray(
        [T, T - 1711, T - 3000, T - 4801][:B] + [T] * max(0, B - 4), jnp.int32
    )
    key = jax.random.PRNGKey(0)

    params = M.init_bsrnn(jax.random.PRNGKey(1), mcfg)
    opt_state = optimizer.init(params)

    results = {}

    # --- null dispatch: the remote-tunnel round-trip floor.  Every timed
    # call below pays this constant once; absolute attributions must
    # subtract it (the round-4 first run summed components to 233 ms vs a
    # 145 ms whole precisely because of this) ---
    null_fn = jax.jit(lambda x: x + 1.0)
    results["null"] = timeit(null_fn, jnp.zeros((8,), jnp.float32),
                             reps=args.reps)

    # --- full step (donating: feed copies, chain the state through the loop) ---
    step = TR.make_train_step(bundle, optimizer, cfg, fs)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
    p, o = copy(params), copy(opt_state)
    p, o, _, m = step(p, o, None, key, clean, noisy, lengths)
    jax.block_until_ready(m["loss"])
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        p, o, _, m = step(p, o, None, key, clean, noisy, lengths)
        jax.block_until_ready(m["loss"])
        ts.append(time.perf_counter() - t0)
    results["step"] = float(np.median(ts))
    del p, o

    # --- grad (no optimizer) ---
    def loss_fn(params, clean, noisy, lengths):
        wav, _ = M.bsrnn_se_apply(
            params, mcfg, stft_cfg, noisy, fs, lengths=lengths
        )
        loss = losses.multi_res_l1_spec_loss(clean, wav, lengths).mean()
        sisnr = jax.lax.stop_gradient(losses.si_snr(clean, wav, lengths).mean())
        return loss, sisnr

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    results["grad"] = timeit(grad_fn, params, clean, noisy, lengths,
                             reps=args.reps)

    # --- forward only ---
    fwd_fn = jax.jit(loss_fn)
    results["fwd"] = timeit(fwd_fn, params, clean, noisy, lengths,
                            reps=args.reps)

    # --- optimizer update alone (fixed grads; includes the NaN gate) ---
    (_, _), grads = grad_fn(params, clean, noisy, lengths)
    jax.block_until_ready(grads)

    @jax.jit
    def opt_fn(grads, opt_state, params):
        gnorm = TR._weighted_grad_norm(grads)
        grads, bad = TR._zero_nonfinite(grads)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(
            lambda u: jnp.where(bad, jnp.zeros_like(u), u), updates
        )
        new_opt = jax.tree.map(
            lambda old, new: jnp.where(bad, old, new), opt_state, new_opt
        )
        import optax

        return optax.apply_updates(params, updates), new_opt, gnorm

    results["opt"] = timeit(opt_fn, grads, opt_state, params, reps=args.reps)

    # --- component graphs (same shapes as inside the step) ---
    spec = dsp.stft_encode(noisy, fs, stft_cfg)
    jax.block_until_ready(spec)
    n_frames, F = spec.shape[1], spec.shape[2]
    K = M.band_count(mcfg.input_dim, mcfg.target_fs, fs, F)
    frames, fm = M.frame_validity(lengths, n_frames, stft_cfg.n_fft,
                                  stft_cfg.hop_length)
    eps = mcfg.norm_eps
    z0 = M._band_split_apply(params["band_split"], spec, mcfg, K, eps)
    jax.block_until_ready(z0)

    # recurrence fwd+bwd (masked path, exactly as in training)
    def rec_loss(params, z0):
        z = M._run_layers(params, z0, mcfg, None, eps, frames=frames, fm=fm)
        return jnp.abs(z * fm[:, :, None, None]).mean()

    rec_fn = jax.jit(jax.value_and_grad(rec_loss, argnums=(0, 1)))
    results["rec"] = timeit(rec_fn, params, z0, reps=args.reps)

    # band split + decoder heads + iSTFT fwd+bwd
    def bsdec_loss(params, spec):
        z = M._band_split_apply(params["band_split"], spec, mcfg, K, eps)
        m = M._mask_decoder_head(params["mask_decoder"]["mask"], z, mcfg, K,
                                 F, eps)
        r = M._mask_decoder_head(params["mask_decoder"]["residual"], z, mcfg,
                                 K, F, eps)
        wav = dsp.stft_decode(m * spec + r, fs, stft_cfg, length=T)
        return jnp.abs(wav).mean()

    bsdec_fn = jax.jit(jax.value_and_grad(bsdec_loss, argnums=(0, 1)))
    results["bsdec"] = timeit(bsdec_fn, params, spec, reps=args.reps)

    # STFT encode forward
    stft_fn = jax.jit(lambda w: dsp.stft_encode(w, fs, stft_cfg))
    results["stft"] = timeit(stft_fn, noisy, reps=args.reps)

    # losses fwd+bwd w.r.t. the enhanced waveform
    def loss_only(wav):
        loss = losses.multi_res_l1_spec_loss(clean, wav, lengths).mean()
        sisnr = jax.lax.stop_gradient(losses.si_snr(clean, wav, lengths).mean())
        return loss, sisnr

    loss_fn2 = jax.jit(jax.value_and_grad(loss_only, has_aux=True))
    enhanced = clean + 0.01 * noisy
    results["loss"] = timeit(loss_fn2, enhanced, reps=args.reps)

    # --- report ---
    dev = jax.devices()[0].platform
    null = results["null"]
    print(f"\n== masked train step breakdown ({dev}, B={B}, {args.seconds}s "
          f"@ {fs} Hz, frames={n_frames}, K={K}; dispatch floor "
          f"{null*1e3:.1f} ms subtracted in 'net') ==")
    step_net = results["step"] - null
    for k in ("step", "grad", "fwd", "opt", "rec", "bsdec", "stft", "loss"):
        net = results[k] - null
        print(f"  {k:6s} {results[k]*1e3:8.1f} ms  net {net*1e3:8.1f} ms"
              f"   ({100*net/step_net:5.1f}% of net step)")
    acc = sum(results[k] - null for k in ("rec", "bsdec", "stft", "loss"))
    print(f"  net components (rec+bsdec+stft+loss): {acc*1e3:.1f} ms "
          f"vs net grad {(results['grad']-null)*1e3:.1f} ms "
          f"(residual {(results['grad']-null-acc)*1e3:+.1f} ms)")
    print(f"  net bwd/fwd ratio: "
          f"{(results['grad']-null)/(results['fwd']-null):.2f}; "
          f"net optimizer+guards: {(results['opt']-null)*1e3:.1f} ms")
    import json

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
