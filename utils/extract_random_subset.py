#!/bin/env python
"""Random subset selection with 2-15 s duration filter
(reference utils/extract_random_subset.py)."""

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402


def select_audio(scp_file, num_data):
    with open(scp_file) as f:
        lines = f.readlines()
    random.shuffle(lines)
    selected = []
    for line in lines:
        utt_id, fs, audio_path = line.strip().split()
        duration = audio_io.info_frames(audio_path) / int(fs)
        if duration < 2.0 or duration > 15.0:
            continue
        selected.append(line)
        if len(selected) == num_data:
            break
    return selected


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--speech_scps", type=str, nargs="+", required=True)
    parser.add_argument("--num_data_per_dataset", type=int, nargs="+", required=True)
    parser.add_argument("--outfile", type=str, required=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    assert len(args.speech_scps) == len(args.num_data_per_dataset)
    random.seed(args.seed)
    selected = []
    for scp, n in zip(args.speech_scps, args.num_data_per_dataset):
        selected += select_audio(scp, n)
    with open(args.outfile, "w") as f:
        f.writelines(selected)
