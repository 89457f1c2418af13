#!/bin/env python
"""Inference CLI — reference-compatible surface (baseline_code/inference.py).

Usage:
  python inference.py --input_scp in.scp --ckpt_path <ckpt> --output_dir out/

Per-utterance: load wav -> enhance (discriminative single pass, or flow
sampler N=15 Euler steps) -> peak-normalize to 0.9 -> write
``out/wav/{uid}.wav`` + ``out/inf.scp``.

TPU notes: inputs are padded to 1 s buckets so the number of compiled
programs stays bounded across arbitrary-length utterances; outputs are
sliced back to the true length before normalization.
"""

import argparse
import os

import numpy as np
from urgent2026_challenge_track1_tpu.utils import audio_io as sf


def _enhance_fns(kind, params, model_cfg, stft_cfg, nfe=15, solver="euler"):
    # shared with the serving daemon (serve.py); lengths make the bucket
    # padding EXACT — out[b, :lengths[b]] equals the reference's
    # exact-length processing (tests/test_length_masking.py pins this)
    from urgent2026_challenge_track1_tpu.serving import make_enhance_fn

    return make_enhance_fn(kind, params, model_cfg, stft_cfg,
                           nfe=nfe, solver=solver)


def main(args):
    import jax

    if args.device == "cpu":
        # must precede first backend use; env vars are clobbered by TPU
        # plugin sitecustomizes
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.utils.checkpoint import (
        load_model_for_inference,
    )

    kind, params, model_cfg, stft_cfg = load_model_for_inference(args.ckpt_path)
    print(f"Loaded {kind} model from {args.ckpt_path}")
    enhance = _enhance_fns(kind, params, model_cfg, stft_cfg,
                           nfe=args.nfe, solver=args.solver)

    input_audios = {}
    with open(args.input_scp) as f:
        for line in f:
            utt, wav = line.strip().split()
            input_audios[utt] = wav

    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(args.output_dir + "/wav", exist_ok=True)
    key = jax.random.PRNGKey(0)

    from urgent2026_challenge_track1_tpu.models.streaming import enhance_streaming

    if args.batch_size > 1:
        return _main_batched(args, enhance, input_audios)

    with open(args.output_dir + "/inf.scp", "w") as f:
        for uid in input_audios:
            wav, sr = sf.read(input_audios[uid])
            if wav.ndim > 1:
                wav = wav[:, 0]
            T = wav.shape[0]
            key, sub = jax.random.split(key)
            if T > args.chunk_seconds * sr:
                # long-form: fixed-shape chunked overlap-add (one program)
                enhanced = enhance_streaming(
                    # full chunks skip masking (fused inference kernel);
                    # only the zero-padded final chunk masks its tail
                    lambda x, n: np.asarray(
                        enhance(jnp.asarray(x), int(sr), sub,
                                None if n == x.shape[1]
                                else jnp.asarray([n], jnp.int32))
                    ),
                    wav.astype(np.float32), int(sr),
                    chunk_seconds=args.chunk_seconds,
                )
            else:
                # pad to 1 s buckets: bounded compile count over lengths;
                # the lengths argument makes the padding numerically exact
                bucket = -(-T // sr) * sr
                x = np.zeros((1, bucket), np.float32)
                x[0, :T] = wav
                enhanced = np.asarray(
                    enhance(jnp.asarray(x), int(sr), sub,
                            jnp.asarray([T], jnp.int32))
                )[0, :T]
            enhanced = enhanced / (np.abs(enhanced).max() or 1.0) * 0.9
            out_path = f"{args.output_dir}/wav/{uid}.wav"
            sf.write(out_path, enhanced, sr)
            print(f"{uid} {out_path}", file=f)

    print("done")


def _main_batched(args, enhance, input_audios):
    """Bulk serving mode: group utterances by (fs, 1 s length bucket) and
    enhance whole batches per compiled program (no reference counterpart —
    the reference loops B=1)."""
    import jax
    import jax.numpy as jnp
    from collections import defaultdict

    from urgent2026_challenge_track1_tpu.utils import audio_io

    from urgent2026_challenge_track1_tpu.models.streaming import enhance_streaming

    groups = defaultdict(list)
    long_items = []
    for uid, path in input_audios.items():
        frames, fs = audio_io.info(path)
        if frames > args.chunk_seconds * fs:
            # very long inputs stream in fixed chunks even in batch mode
            # (a 10-minute file would otherwise force a huge padded batch)
            long_items.append((uid, path, frames, fs))
            continue
        bucket = -(-frames // fs) * fs
        groups[(fs, bucket)].append((uid, path, frames))

    key = jax.random.PRNGKey(0)
    with open(args.output_dir + "/inf.scp", "w") as f:
        for uid, path, frames, fs in long_items:
            wav, _ = audio_io.read(path)
            if wav.ndim > 1:
                wav = wav[:, 0]
            key, sub = jax.random.split(key)
            y = enhance_streaming(
                lambda x, n: np.asarray(
                    enhance(jnp.asarray(x), int(fs), sub,
                            None if n == x.shape[1]
                            else jnp.asarray([n], jnp.int32))
                ),
                wav.astype(np.float32), int(fs), chunk_seconds=args.chunk_seconds,
            )
            y = y / (np.abs(y).max() or 1.0) * 0.9
            out_path = f"{args.output_dir}/wav/{uid}.wav"
            audio_io.write(out_path, y, fs)
            print(f"{uid} {out_path}", file=f)
        for (fs, bucket), items in sorted(groups.items()):
            for i in range(0, len(items), args.batch_size):
                chunk = items[i : i + args.batch_size]
                x = np.zeros((args.batch_size, bucket), np.float32)
                # filler rows get full length: their all-zero audio is
                # processed harmlessly (length 0 would zero norm denominators)
                lens = np.full((args.batch_size,), bucket, np.int32)
                for j, (uid, path, frames) in enumerate(chunk):
                    wav, _ = audio_io.read(path)
                    if wav.ndim > 1:
                        wav = wav[:, 0]
                    x[j, : len(wav)] = wav
                    lens[j] = len(wav)
                key, sub = jax.random.split(key)
                out = np.asarray(
                    enhance(jnp.asarray(x), int(fs), sub, jnp.asarray(lens))
                )
                for j, (uid, path, frames) in enumerate(chunk):
                    y = out[j, :frames]
                    y = y / (np.abs(y).max() or 1.0) * 0.9
                    out_path = f"{args.output_dir}/wav/{uid}.wav"
                    audio_io.write(out_path, y, fs)
                    print(f"{uid} {out_path}", file=f)
    print("done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_scp", type=str, required=True,
                        help="Path to the scp file listing input audio")
    parser.add_argument("--output_dir", "--output", type=str, default="./tmp/se",
                        help="Output directory for enhanced speech (the "
                             "reference readme spells it --output)")
    parser.add_argument("--ckpt_path", type=str, required=True,
                        help="Checkpoint: orbax dir or torch .ckpt")
    parser.add_argument("--device", type=str, default="tpu",
                        help="kept for reference-CLI parity; jax picks devices")
    parser.add_argument("--batch_size", type=int, default=1,
                        help=">1 groups utterances by (fs, length bucket) "
                             "and enhances them in device batches")
    parser.add_argument("--nfe", type=int, default=15,
                        help="flow-model sampler steps (reference default 15, "
                             "flow_model.py:189); ignored for discriminative ckpts")
    parser.add_argument("--solver", type=str, default="euler",
                        choices=["euler", "midpoint", "heun"],
                        help="fixed-grid ODE solver for the flow sampler")
    parser.add_argument("--chunk_seconds", type=float, default=30.0,
                        help="inputs longer than this are enhanced as "
                             "fixed-shape overlapping chunks with crossfade")
    main(parser.parse_args())
