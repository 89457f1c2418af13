#!/bin/env python
"""Local job-array launcher (Kaldi utils/run.pl equivalent).

Usage: run_jobs.py JOB=1:N log/do.JOB.log cmd --job JOB ...
Substitutes JOB in the command and log path, runs the N jobs with a local
process pool, and writes per-job logs.  SLURM/SGE analogs of queue.pl /
slurm.pl reduce to submitting the same rendered commands with sbatch/qsub;
use --print to emit the rendered commands for any scheduler.
"""

import argparse
import re
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("jobspec", help="JOB=1:N range spec")
    parser.add_argument("log", help="log path containing the JOB placeholder")
    parser.add_argument("cmd", nargs=argparse.REMAINDER)
    parser.add_argument("--max-jobs-run", type=int, default=None)
    parser.add_argument("--print", dest="print_only", action="store_true")
    args = parser.parse_args()

    m = re.fullmatch(r"(\w+)=(\d+):(\d+)", args.jobspec)
    assert m, f"bad job spec {args.jobspec} (expected NAME=1:N)"
    name, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))

    def render(tokens, j):
        return [t.replace(name, str(j)) for t in tokens]

    def run_one(j):
        log = Path(args.log.replace(name, str(j)))
        log.parent.mkdir(parents=True, exist_ok=True)
        cmd = render(args.cmd, j)
        with open(log, "w") as lf:
            r = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT)
        return j, r.returncode

    jobs = list(range(lo, hi + 1))
    if args.print_only:
        for j in jobs:
            print(" ".join(render(args.cmd, j)))
        sys.exit(0)
    workers = args.max_jobs_run or len(jobs)
    with ThreadPoolExecutor(workers) as pool:
        results = list(pool.map(run_one, jobs))
    failed = [j for j, rc in results if rc != 0]
    if failed:
        sys.exit(f"jobs failed: {failed} (see {args.log})")
