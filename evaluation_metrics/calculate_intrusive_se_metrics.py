#!/bin/env python
"""Intrusive SE metrics: PESQ + ESTOI (active set), SDR helper available.

Reference surface: ``evaluation_metrics/calculate_intrusive_se_metrics.py``
(same flags, same output layout).  Backends are this repo's native
implementations (metrics/pesq.py, metrics/stoi.py, metrics/sdr.py) — no
pesq/pystoi/fast_bss_eval C dependencies.
"""

import logging
from functools import partial
from multiprocessing import get_context
from pathlib import Path

import numpy as np

from _shared import audio_io, base_parser, read_pairs, shard
from urgent2026_challenge_track1_tpu.utils import capped_nj

METRICS = ("PESQ", "ESTOI")


def estoi_metric(ref, inf, fs=16000):
    from urgent2026_challenge_track1_tpu.metrics.stoi import stoi

    np.random.seed(0)  # parity with the reference's determinism guard
    return stoi(ref, inf, fs_sig=fs, extended=True)


def pesq_metric(ref, inf, fs=8000):
    from urgent2026_challenge_track1_tpu.metrics.pesq import pesq_metric as _pesq

    score = _pesq(ref, inf, fs=fs)
    if np.isnan(score):
        logging.warning("[PESQ] Error: No utterances detected. Skipping this sample.")
        return None
    return score


def sdr_metric(ref, inf):
    from urgent2026_challenge_track1_tpu.metrics.sdr import sdr_metric as _sdr

    return _sdr(ref, inf)


def process_one_pair(data_pair):
    uid, ref_path, inf_path = data_pair
    ref, fs = audio_io.read(ref_path, dtype="float32")
    inf, fs2 = audio_io.read(inf_path, dtype="float32")
    assert fs == fs2, (fs, fs2)
    assert ref.shape == inf.shape, (ref.shape, inf.shape)

    scores = {}
    for metric in METRICS:
        if metric == "PESQ":
            s = pesq_metric(ref, inf, fs=fs)
            scores[metric] = s if s is not None else np.nan
        elif metric == "ESTOI":
            scores[metric] = estoi_metric(ref, inf, fs=fs)
        else:
            raise NotImplementedError(metric)
    return uid, scores


def main(args):
    pairs = read_pairs(args, need_ref=True)
    # every CLI in this directory shards by --nsplits/--job (eval_all.sh job
    # arrays); without this, N jobs would each score the FULL list and
    # clobber each other's unsuffixed outputs
    pairs, suffix = shard(pairs, args)
    nj = capped_nj(args.nj)
    if nj <= 1:
        ret = [process_one_pair(p) for p in pairs]
    else:
        with get_context("spawn").Pool(nj) as pool:
            ret = list(pool.imap(process_one_pair, pairs, chunksize=args.chunksize))

    outdir = Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    writers = {m: (outdir / f"{m}{suffix}.scp").open("w") for m in METRICS}
    for uid, score in ret:
        for metric, value in score.items():
            writers[metric].write(f"{uid} {value}\n")
    for metric in METRICS:
        writers[metric].close()
    if args.nsplits == args.job == 1:
        with (outdir / "RESULTS.txt").open("w") as f:
            for metric in METRICS:
                mean_score = np.nanmean([score[metric] for _, score in ret])
                f.write(f"{metric}: {mean_score:.4f}\n")
        print(f"Overall results have been written in {outdir / 'RESULTS.txt'}", flush=True)
    else:
        print(f"[Job {args.job}/{args.nsplits}] results written under {outdir}", flush=True)


if __name__ == "__main__":
    parser = base_parser(need_ref=True)
    parser.add_argument("--nj", type=int, default=8)
    parser.add_argument("--chunksize", type=int, default=1000)
    main(parser.parse_args())
