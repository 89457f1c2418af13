#!/bin/env python
"""Estimate effective audio bandwidth per file.

Reference: ``utils/estimate_audio_bandwidth.py`` — the bandwidth is the
highest frequency whose mean STFT power across the file exceeds the spectrum
peak minus ``--threshold`` dB (default -50).  Accepts audio directories,
wav.scp files, or segment JSONs; writes ``uid bandwidth path`` lines (or a
JSON) and caches raw results in a .pkl next to the outfile.
"""

import json
import pickle
import sys
from functools import partial
from multiprocessing import get_context
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402


def estimate_bandwidth(audios, threshold=-50.0, nfft=512, hop=256, sample_rate=16000):
    uid, audio_path = audios
    if isinstance(audio_path, dict):
        st = int(audio_path["start"] * sample_rate)
        et = int(audio_path["end"] * sample_rate)
        idx = slice(st, et)
        audio_path = audio_path["audio_path"]
    else:
        idx = slice(None)
    try:
        audio, fs = audio_io.read(audio_path)
    except Exception:
        print(f"Error: cannot open audio file '{audio_path}'. Skipping it", flush=True)
        return None
    audio = audio[idx].T if audio.ndim > 1 else audio[None, idx]
    n_fft = int(nfft / sample_rate * fs)
    hop_len = int(hop / sample_rate * fs)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n = max(0, (audio.shape[1] - n_fft) // hop_len + 1)
    if n == 0:
        return None
    fidx = np.arange(n_fft)[None, :] + hop_len * np.arange(n)[:, None]
    frames = audio[:, fidx] * win
    spec = np.fft.rfft(frames, axis=-1)
    freq = np.fft.rfftfreq(n_fft, d=1 / fs)
    power = spec.real**2 + spec.imag**2  # (C, T, F)
    mean_power = power.mean(1)  # (C, F)
    peak = mean_power.max(1)
    min_energy = peak.min() * 10 ** (threshold / 10)
    for i in range(len(freq) - 1, -1, -1):
        if mean_power[:, i].min() > min_energy:
            return uid, [str(audio_path), float(freq[i])]
    return None


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--audio_dir", type=str, required=True, nargs="+",
                        help="audio directory / wav.scp / segments json")
    parser.add_argument("--outfile", type=str, required=True)
    parser.add_argument("--threshold", type=float, default=-50)
    parser.add_argument("--audio_format", type=str, default="wav")
    parser.add_argument("--nj", type=int, default=8)
    parser.add_argument("--chunksize", type=int, default=1000)
    args = parser.parse_args()

    Path(args.outfile).parent.mkdir(parents=True, exist_ok=True)
    all_audios = []
    for audio_dir in args.audio_dir:
        p = Path(audio_dir)
        if p.is_dir():
            paths = sorted(p.rglob("*." + args.audio_format))
            all_audios += [(q.stem, q) for q in paths]
        elif p.is_file() and p.suffix == ".scp":
            with open(p) as f:
                all_audios += [tuple(l.strip().split(maxsplit=1)) for l in f]
        elif p.is_file() and p.suffix == ".json":
            with open(p) as f:
                all_audios += list(json.load(f).items())
        else:
            raise ValueError(f"Invalid format: {audio_dir}")

    pkl_file = Path(args.outfile).with_suffix(".pkl")
    if pkl_file.exists():
        print(f"Loading existing pkl file: {pkl_file}")
        with pkl_file.open("rb") as f:
            ret0 = pickle.load(f)
    else:
        from urgent2026_challenge_track1_tpu.utils import capped_nj

        fn = partial(estimate_bandwidth, threshold=args.threshold)
        nj = capped_nj(args.nj)
        if nj <= 1:
            ret0 = [fn(a) for a in all_audios]
        else:
            with get_context("spawn").Pool(nj) as pool:
                ret0 = list(pool.imap(fn, all_audios, chunksize=args.chunksize))
        with pkl_file.open("wb") as f:
            pickle.dump(ret0, f)

    ret = {}
    for uid_val in ret0:
        if uid_val is None:
            continue
        uid, val = uid_val
        i, uid2 = 1, uid
        while uid2 in ret:
            i += 1
            uid2 = f"{uid}({i})"
        ret[uid2] = val

    if args.outfile.endswith(".json"):
        with open(args.outfile, "w") as f:
            json.dump(ret, f, indent=2)
    else:
        with open(args.outfile, "w") as f:
            for uid, (audio_path, bandwidth) in ret.items():
                f.write(f"{uid} {bandwidth} {audio_path}\n")
