#!/bin/env python
"""spk2utt -> utt2spk (Kaldi utils/spk2utt_to_utt2spk.pl equivalent)."""

import sys

if __name__ == "__main__":
    src = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    for line in src:
        parts = line.strip().split()
        for utt in parts[1:]:
            print(utt, parts[0])
