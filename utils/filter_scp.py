#!/bin/env python
"""Filter scp lines by a uid list (Kaldi utils/filter_scp.pl equivalent).

Usage: filter_scp.py [--exclude] [--field 1] id_list < in.scp > out.scp
"""

import argparse
import sys

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("id_list")
    parser.add_argument("--exclude", action="store_true")
    parser.add_argument("--field", "-f", type=int, default=1,
                        help="1-based field to match against the id list")
    args = parser.parse_args()
    with open(args.id_list) as f:
        ids = {line.strip().split()[0] for line in f if line.strip()}
    for line in sys.stdin:
        parts = line.strip().split()
        if not parts:
            continue
        hit = parts[args.field - 1] in ids
        if hit != args.exclude:
            sys.stdout.write(line)
