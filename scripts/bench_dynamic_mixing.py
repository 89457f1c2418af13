#!/bin/env python
"""Dynamic-mixing throughput benchmark (north star: >5k audio samples/sec
per worker feeding training; BASELINE.md).

Builds a synthetic source pool, then measures end-to-end loader throughput
(simulate + collate) in utterances/sec and audio samples/sec.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from urgent2026_challenge_track1_tpu.data.dataset import GroupedBatchSampler, PrefetchLoader
from urgent2026_challenge_track1_tpu.data.dynamic import DynamicMixingDataset
from urgent2026_challenge_track1_tpu.utils import audio_io


def build_sources(root: Path, n_speech=64, fs=16000, seconds=4):
    rng = np.random.default_rng(0)
    rows = {"speech": [], "noise": [], "rir": [], "wind": []}

    def wav(name, data):
        p = root / name
        audio_io.write(str(p), data.astype(np.float32), fs)
        return str(p)

    t = np.arange(fs * seconds) / fs
    for i in range(n_speech):
        sp = 0.3 * np.sin(2 * np.pi * (120 + 10 * i) * t) * (
            np.clip(np.sin(2 * np.pi * 3 * t), 0, None) + 0.1
        )
        rows["speech"].append((f"sp{i}", fs, wav(f"sp{i}.wav", sp)))
    for i in range(8):
        rows["noise"].append(
            (f"nz{i}", fs, wav(f"nz{i}.wav", 0.2 * rng.standard_normal(fs * seconds)))
        )
    for i in range(4):
        rir = np.zeros(4000)
        rir[10] = 1.0
        rir[500 + 100 * i] = 0.4
        rows["rir"].append((f"rir{i}", fs, wav(f"rir{i}.wav", rir)))
    rows["wind"].append(
        ("wind_noise0", fs, wav("wind0.wav", 0.2 * rng.standard_normal(fs * seconds)))
    )
    scps = {}
    for kind, rs in rows.items():
        p = root / f"{kind}.scp"
        with open(p, "w") as f:
            for uid, fs_, path in rs:
                print(uid, fs_, path, file=f)
        scps[kind] = str(p)
    with open(root / "length.scp", "w") as f:
        for uid, fs_, path in rows["speech"]:
            print(uid, fs * seconds, file=f)
    scps["length"] = str(root / "length.scp")
    return scps, fs, seconds


def main():
    import argparse
    import tempfile

    parser = argparse.ArgumentParser()
    parser.add_argument("--num_workers", type=int, default=os.cpu_count() or 8)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--processes", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="--no-processes benchmarks the thread-pool mode "
                             "(what AudioDataModule picks on hosts with <=2 CPUs)")
    args = parser.parse_args()

    with tempfile.TemporaryDirectory() as td:
        scps, fs, seconds = build_sources(Path(td))
        ds = DynamicMixingDataset(
            speech_source_scp=scps["speech"],
            noise_source_scp=scps["noise"],
            rir_scp=scps["rir"],
            windnoise_scp=scps["wind"],
            speech_length_file=scps["length"],
            max_duration=fs * seconds,
            use_high_pass=True,
        )
        sampler = GroupedBatchSampler(ds, batch_size=args.batch_size)
        loader = PrefetchLoader(
            ds, sampler, num_workers=args.num_workers, use_processes=args.processes
        )
        # first batch spins up the worker pool — start timing after it
        # so pool startup is not amortized into the throughput number
        n_utt, n_samples = 0, 0
        t0 = None
        for clean, noisy, fs_, lengths in loader:
            if t0 is None:
                t0 = time.perf_counter()
                continue
            n_utt += clean.shape[0]
            n_samples += int(lengths.sum())
        if t0 is None or n_utt == 0:
            sys.exit("need >= 2 batches: the first is consumed as pool warmup")
        dt = time.perf_counter() - t0
        print(
            f"{n_utt} utts in {dt:.2f}s: {n_utt/dt:.1f} utt/s, "
            f"{n_samples/dt/1e3:.0f}k audio samples/s "
            f"({args.num_workers} workers, processes={args.processes})"
        )


if __name__ == "__main__":
    main()
