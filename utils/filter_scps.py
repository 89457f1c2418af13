#!/bin/env python
"""Multi-filter scp split (Kaldi utils/filter_scps.pl equivalent).

Usage: filter_scps.py [-f N] JOB=1:10 split10/JOB/spk2utt feats.scp split10/JOB/feats.scp

Reads one id-list per job (the JOB placeholder is substituted), then writes
one filtered copy of the input scp per job, preserving the input's line
order within each output.  Warns (like the reference) when input lines are
uncovered by every filter or covered by several.
Reference: /root/reference/utils/filter_scps.pl.
"""

import argparse
import re
import sys
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-f", "--field", type=int, default=1,
                        help="1-based field of the input scp to filter on")
    parser.add_argument("--no-warn", action="store_true")
    parser.add_argument("jobspec", help="JOB=1:N range spec")
    parser.add_argument("idlist", help="per-job id-list pattern (contains JOB)")
    parser.add_argument("infile")
    parser.add_argument("outfile", help="per-job output pattern (contains JOB)")
    args = parser.parse_args(argv)

    m = re.fullmatch(r"(\w+)=(\d+):(\d+)", args.jobspec)
    assert m, f"bad job spec {args.jobspec} (expected NAME=1:N)"
    name, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
    if hi > lo and name not in args.idlist:
        sys.exit(f"filter_scps.py: multiple jobs but a single filter file {args.idlist}")
    if hi > lo and name not in args.outfile:
        sys.exit(f"filter_scps.py: multiple jobs but a single output file {args.outfile}")

    id2jobs: dict[str, list[int]] = {}
    for j in range(lo, hi + 1):
        for line in Path(args.idlist.replace(name, str(j))).read_text().splitlines():
            parts = line.split()
            if parts:
                id2jobs.setdefault(parts[0], []).append(j)

    outputs = {j: [] for j in range(lo, hi + 1)}
    uncovered = multiply = 0
    with open(args.infile) as f:
        for line in f:
            parts = line.split()
            if len(parts) < args.field:
                continue
            jobs = id2jobs.get(parts[args.field - 1], [])
            if not jobs:
                uncovered += 1
            elif len(jobs) > 1:
                multiply += 1
            for j in jobs:
                outputs[j].append(line)

    for j, lines in outputs.items():
        out = Path(args.outfile.replace(name, str(j)))
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text("".join(lines))

    if not args.no_warn:
        if uncovered:
            print(f"filter_scps.py: warning: {uncovered} input lines uncovered "
                  "by any filter", file=sys.stderr)
        if multiply:
            print(f"filter_scps.py: warning: {multiply} input lines covered "
                  "by multiple filters", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
