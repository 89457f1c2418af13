#!/bin/env python
"""Write per-utterance sample counts (reference utils/utt2numsamples.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_scp", type=str, required=True,
                        help="scp with 2 (uid path) or 3 (uid fs path) columns")
    parser.add_argument("--outfile", type=str, required=True)
    args = parser.parse_args()

    with open(args.input_scp) as f, open(args.outfile, "w") as out:
        for line in f:
            parts = line.strip().split()
            uid, path = (parts[0], parts[2]) if len(parts) == 3 else (parts[0], parts[1])
            print(uid, audio_io.info_frames(path), file=out)
