#!/bin/env python
"""Component-level TPU timing for the flagship BSRNN (analysis tool).

Times: full model, STFT only, band split + decoder only (no LSTMs), and the
dual-path recurrence alone, to locate the bottleneck before kernel work.
"""

import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M


def timeit(fn, *args, n=5):
    out = fn(*args)  # warmup/compile (single call)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        (out[0] if isinstance(out, tuple) else out).block_until_ready()
        times.append(time.perf_counter() - t0)
    # median: the remote-TPU tunnel occasionally stalls one dispatch
    return float(np.median(times))


def main():
    cfg = M.BSRNNConfig(input_dim=481, num_channel=192, num_layer=6, causal=False,
                        compute_dtype="bfloat16", use_pallas_lstm=True)
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    fs, seconds, B = 48000, 4, 4
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, fs * seconds)).astype(np.float32) * 0.1
    )
    audio_s = B * seconds

    full = jax.jit(lambda p, w: M.bsrnn_se_apply(p, cfg, stft_cfg, w, fs)[0])
    t_full = timeit(full, params, wav)
    print(f"full model: {t_full*1e3:.1f} ms  (RTF {audio_s/t_full:.0f}x)")

    stft_only = jax.jit(
        lambda w: dsp.stft_decode(dsp.stft_encode(w, fs, stft_cfg), fs, stft_cfg, length=w.shape[-1])
    )
    t_stft = timeit(stft_only, wav)
    print(f"stft+istft: {t_stft*1e3:.1f} ms")

    spec = dsp.stft_encode(wav, fs, stft_cfg)
    K = M.band_count(cfg.input_dim, cfg.target_fs, fs, spec.shape[-1])

    bs_dec = jax.jit(
        lambda p, s: M._mask_decoder_head(
            p["mask_decoder"]["mask"],
            M._band_split_apply(p["band_split"], s, cfg, K, cfg.norm_eps),
            cfg, K, s.shape[-1], cfg.norm_eps,
        )
    )
    t_bs = timeit(bs_dec, params, spec)
    print(f"band split + one decoder head: {t_bs*1e3:.1f} ms")

    z0 = M._band_split_apply(params["band_split"], spec, cfg, K, cfg.norm_eps)
    layers = jax.jit(lambda p, z: M._run_layers(p, z, cfg, None, cfg.norm_eps))
    t_layers = timeit(layers, params, z0)
    print(f"6x dual-path recurrence: {t_layers*1e3:.1f} ms "
          f"({100*t_layers/t_full:.0f}% of full)")
    print(f"T frames: {z0.shape[1]}, K bands: {z0.shape[2]}")


def bench_variants():
    """Compare f32 vs bf16 recurrence + report per-variant RTF."""
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    fs, seconds, B = 48000, 4, 4
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, fs * seconds)).astype(np.float32) * 0.1
    )
    audio_s = B * seconds
    for dtype in ("float32", "bfloat16"):
        cfg = M.BSRNNConfig(input_dim=481, num_channel=192, num_layer=6,
                            causal=False, compute_dtype=dtype)
        params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
        fn = jax.jit(lambda p, w: M.bsrnn_se_apply(p, cfg, stft_cfg, w, fs)[0])
        t = timeit(fn, params, wav)
        print(f"{dtype}: {t*1e3:.1f} ms (RTF {audio_s/t:.0f}x)")


def bench_pallas_model():
    """Full-model RTF with and without the Pallas time-LSTM kernel (bf16)."""
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    fs, seconds, B = 48000, 4, 4
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, fs * seconds)).astype(np.float32) * 0.1
    )
    audio_s = B * seconds
    outs = {}
    for use_pallas in (False, True):
        cfg = M.BSRNNConfig(input_dim=481, num_channel=192, num_layer=6,
                            causal=False, compute_dtype="bfloat16",
                            use_pallas_lstm=use_pallas)
        params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
        fn = jax.jit(lambda p, w: M.bsrnn_se_apply(p, cfg, stft_cfg, w, fs)[0])
        t = timeit(fn, params, wav)
        outs[use_pallas] = np.asarray(fn(params, wav))
        print(f"pallas={use_pallas}: {t*1e3:.1f} ms (RTF {audio_s/t:.0f}x)", flush=True)
    err = np.abs(outs[True] - outs[False]).max()
    print(f"max output diff: {err:.2e}", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "variants":
        bench_variants()
        raise SystemExit
    if len(sys.argv) > 1 and sys.argv[1] == "pallas":
        bench_pallas_model()
        raise SystemExit
    main()