#!/bin/env python
"""utt2spk -> spk2utt (Kaldi utils/utt2spk_to_spk2utt.pl equivalent)."""

import sys
from collections import defaultdict

if __name__ == "__main__":
    src = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    spk2utt = defaultdict(list)
    for line in src:
        utt, spk = line.strip().split()
        spk2utt[spk].append(utt)
    for spk in sorted(spk2utt):
        print(spk, " ".join(spk2utt[spk]))
