#!/bin/env python
"""Per-group score breakdowns over a simulation meta.tsv.

Groups a per-utterance result scp six ways — sampling rate, 5 dB SNR bin,
5 s duration bin, source corpus, RIR presence, augmentation family — and
prints the per-group mean (or, for calculate_wer.py's JSON edit-operation
records, the aggregate corpus-level WER).

Output format matches the reference breakdown tool so downstream parsing
keeps working.
"""

import argparse
import json
from collections import defaultdict

import numpy as np

# grouping spec: (name, sorted_output, uid->group function)
GROUPERS = [
    ("fs", True, lambda m: f"fs={int(m['fs'])}Hz"),
    ("snr", True, lambda m: f"snr={int(float(m['snr_dB']) / 5) * 5:02d}dB"),
    (
        "duration",
        True,
        lambda m: f"duration={int(float(m['length']) / float(m['fs']) / 5) * 5:02d}s",
    ),
    ("corpus", False, lambda m: "corpus=" + m["speech_sid"].split("_", 1)[0]),
    ("rir", False, lambda m: "with_rir" if m["rir_uid"] != "none" else "no_rir"),
    (
        "augmentation",
        False,
        lambda m: next(
            (fam for fam in ("bandwidth_limitation", "clipping")
             if m["augmentation"].startswith(fam)),
            m["augmentation"],
        ),
    ),
]


def load_results(path):
    """uid -> float score, or uid -> edit-op dict for WER records."""
    scores, is_wer = {}, None
    with open(path) as f:
        for line in f:
            uid, payload = line.strip().split(maxsplit=1)
            if is_wer is None:
                try:
                    float(payload)
                    is_wer = False
                except ValueError:
                    is_wer = True
            # normalize uids that carry path-derived prefixes
            if not uid.startswith("fileid") and "fileid" in uid:
                uid = "fileid" + uid.split("fileid", 1)[1]
            scores[uid] = json.loads(payload) if is_wer else float(payload)
    return scores, bool(is_wer)


def load_meta(path):
    meta = {}
    with open(path) as f:
        headers = next(f).rstrip("\n").split("\t")
        for line in f:
            row = dict(zip(headers, line.rstrip("\n").split("\t")))
            meta[row["id"]] = row
    return meta


def summarize(values, is_wer):
    if not is_wer:
        return f"Average score: {np.nanmean(values)}\n"
    ops = {"delete": 0, "insert": 0, "replace": 0, "equal": 0}
    for rec in values:
        for op in ops:
            ops[op] += rec.get(op, 0)
    errors = ops["replace"] + ops["delete"] + ops["insert"]
    ref_len = ops["replace"] + ops["delete"] + ops["equal"]
    lines = [f"WER: {errors / max(ref_len, 1):.4f}"]
    lines += [f"    {op}: {count}" for op, count in ops.items()]
    return "\n".join(lines) + "\n"


def main(args):
    scores, is_wer = load_results(args.result_scp)
    meta = load_meta(args.meta_tsv)
    for name, sort_groups, group_fn in GROUPERS:
        buckets = defaultdict(list)
        for uid, score in scores.items():
            buckets[group_fn(meta[uid])].append(score)
        keys = sorted(buckets) if sort_groups else list(buckets)
        print(f"\n====== Group by {name} =====\n")
        for group in keys:
            print(f"[Group] {group}\n\t" + summarize(buckets[group], is_wer))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("result_scp", help="per-sample evaluation result scp")
    parser.add_argument("--meta_tsv", required=True,
                        help="simulation meta.tsv with per-sample metadata")
    main(parser.parse_args())
