"""Shared plumbing for the evaluation-metric CLIs.

Every CLI follows the reference skeleton (e.g.
``/root/reference/evaluation_metrics/calculate_nonintrusive_dnsmos.py:58-110``):
read ``inf.scp`` (+ optional refs/labels), shard by ``--nsplits/--job`` for
multi-node runs (output scps suffixed ``.{job}``), score per utterance,
write per-metric ``{METRIC}.scp`` + ``RESULTS.txt`` nanmean.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402

__all__ = [
    "audio_io",
    "base_parser",
    "read_pairs",
    "shard",
    "write_results",
    "EXIT_BACKEND_UNAVAILABLE",
    "exit_backend_unavailable",
]

# Distinct exit code for "the pretrained-model backend for this metric is not
# installed/downloadable here" so orchestrators (eval_all.sh) can
# skip-and-report that metric while still aborting on real failures.
EXIT_BACKEND_UNAVAILABLE = 86


def exit_backend_unavailable(exc) -> "None":
    print(f"SKIPPED (backend unavailable): {exc}", file=sys.stderr, flush=True)
    raise SystemExit(EXIT_BACKEND_UNAVAILABLE)


def base_parser(need_ref=False, need_meta=False):
    parser = argparse.ArgumentParser()
    parser.add_argument("--inf_scp", type=str, required=True,
                        help="Path to the scp file containing enhanced signals")
    if need_ref:
        parser.add_argument("--ref_scp", type=str, required=True,
                            help="Path to the scp file containing reference signals")
    if need_meta:
        parser.add_argument("--meta_tsv", type=str, required=True,
                            help="Path to label file (two columns: uid label)")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--device", type=str, default="cpu")
    parser.add_argument("--nsplits", type=int, default=1)
    parser.add_argument("--job", type=int, default=1)
    return parser


def read_pairs(args, need_ref=False):
    """[(uid, [ref_path,] inf_path)] from the scp files."""
    refs = {}
    if need_ref:
        with open(args.ref_scp, "r") as f:
            for line in f:
                uid, path = line.strip().split()
                refs[uid] = path
    pairs = []
    with open(args.inf_scp, "r") as f:
        for line in f:
            uid, path = line.strip().split()
            pairs.append((uid, refs[uid], path) if need_ref else (uid, path))
    return pairs


def shard(pairs, args):
    """Contiguous --nsplits/--job slice + output suffix."""
    size = len(pairs)
    assert 1 <= args.job <= args.nsplits <= size
    interval = size // args.nsplits
    start = (args.job - 1) * interval
    end = size if args.job == args.nsplits else start + interval
    out = pairs[start:end]
    print(
        f"[Job {args.job}/{args.nsplits}] Processing ({len(out)}/{size}) samples",
        flush=True,
    )
    suffix = "" if args.nsplits == args.job == 1 else f".{args.job}"
    return out, suffix


def write_results(outdir, metrics, ret, suffix=""):
    """Write {METRIC}{suffix}.scp per metric + RESULTS.txt (suffix-free run)."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for metric in metrics:
        with (outdir / f"{metric}{suffix}.scp").open("w") as w:
            for uid, score in ret:
                w.write(f"{uid} {score[metric]}\n")
    if suffix == "":
        with (outdir / "RESULTS.txt").open("w") as f:
            for metric in metrics:
                vals = [
                    float(s[metric]) for _, s in ret
                    if isinstance(s[metric], (int, float, np.floating))
                ]
                f.write(f"{metric}: {np.nanmean(vals):.4f}\n")
        print(f"Overall results have been written in {outdir / 'RESULTS.txt'}",
              flush=True)
