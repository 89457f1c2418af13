#!/bin/env python
"""Resample each file to the smallest standard fs >= 2x its bandwidth.

Reference: ``utils/resample_to_estimated_bandwidth.py`` — fs set
(8k/16k/22.05k/24k/32k/44.1k/48k), hex-sharded output subdirectories,
skip-if-exists resume, writes ``uid fs path`` scp lines.
"""

import json
import math
import sys
from functools import partial
from multiprocessing import get_context
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from urgent2026_challenge_track1_tpu.simulation.dsp import resample  # noqa: E402
from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402

sampling_rates = (8000, 16000, 22050, 24000, 32000, 44100, 48000)


def resample_one(item, max_files_per_dir, num_digits, outdir):
    (uid, audio_path, est_bandwidth), idx = item
    for sr in sampling_rates:
        if float(est_bandwidth) * 2 <= sr:
            est_fs = sr
            break
    else:
        est_fs = sampling_rates[-1]
    subdir = f"{idx // max_files_per_dir:0{num_digits}x}"
    # .flac like the reference (resample_to_estimated_bandwidth.py:59-61);
    # audio_io dispatches to the native FLAC encoder on this extension
    outfile = Path(outdir) / subdir / (uid + ".flac")
    if outfile.exists():
        return uid, outfile, est_fs
    outfile.parent.mkdir(parents=True, exist_ok=True)
    try:
        audio, fs = audio_io.read(audio_path)
    except Exception:
        print(f"Error: cannot open audio file '{audio_path}'. Skipping it", flush=True)
        return None
    if est_fs == fs:
        return uid, audio_path, fs
    audio = resample(audio.T if audio.ndim > 1 else audio[None], fs, est_fs, "soxr_hq")
    audio_io.save_audio(audio, str(outfile), est_fs)
    return uid, outfile, est_fs


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--bandwidth_data", type=str, required=True,
                        help="json/scp with audio paths + bandwidths")
    parser.add_argument("--out_scpfile", type=str, required=True)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--nj", type=int, default=1)
    parser.add_argument("--chunksize", type=int, default=1)
    parser.add_argument("-m", "--max_files", type=int, default=10000)
    args = parser.parse_args()

    audios = []
    if Path(args.bandwidth_data).suffix == ".json":
        with open(args.bandwidth_data) as f:
            for uid, (path, bandwidth) in json.load(f).items():
                audios.append((uid, path, bandwidth))
    else:
        with open(args.bandwidth_data) as f:
            for line in f:
                uid, bandwidth, path = line.strip().split(maxsplit=2)
                audios.append((uid, path, bandwidth))

    num_digits = max(1, math.ceil(math.log(max(len(audios), 2) / args.max_files, 16)))
    Path(args.outdir).mkdir(parents=True, exist_ok=True)
    items = list(zip(audios, range(len(audios))))
    fn = partial(resample_one, max_files_per_dir=args.max_files,
                 num_digits=num_digits, outdir=args.outdir)
    from urgent2026_challenge_track1_tpu.utils import capped_nj

    nj = capped_nj(args.nj)
    if nj <= 1:
        ret = [fn(it) for it in items]
    else:
        with get_context("spawn").Pool(nj) as pool:
            ret = list(pool.imap(fn, items, chunksize=args.chunksize))

    Path(args.out_scpfile).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out_scpfile, "w") as f:
        for item in ret:
            if item is None:
                continue
            uid, audio_path, fs = item
            f.write(f"{uid} {fs} {audio_path}\n")
