#!/bin/env python
"""Per-group score breakdowns (reference evaluation_metrics/get_breakdown.py).

Groups a per-utterance result scp by sampling rate / 5 dB SNR bin / 5 s
duration bin / corpus / RIR presence / augmentation type using the
simulation meta.tsv, printing nanmean per group (or aggregate WER from the
JSON edit-operation dicts written by calculate_wer.py).
"""

import json
from collections import defaultdict

import numpy as np


def group_by_fs(meta):
    return f"fs={int(meta['fs'])}Hz"


def group_by_snr(meta):
    snr = int(float(meta["snr_dB"]) / 5) * 5
    return f"snr={snr:02d}dB"


def group_by_duration(meta):
    length = int((float(meta["length"]) / float(meta["fs"])) / 5) * 5
    return f"duration={length:02d}s"


def group_by_corpus(meta):
    corpus = meta["speech_sid"].split("_", maxsplit=1)[0]
    return f"corpus={corpus}"


def group_by_rir(meta):
    return "with_rir" if meta["rir_uid"] != "none" else "no_rir"


def group_by_augmentation(meta):
    augmentation = meta["augmentation"]
    if augmentation.startswith("bandwidth_limitation"):
        return "bandwidth_limitation"
    if augmentation.startswith("clipping"):
        return "clipping"
    return augmentation


def group_score_by_field(result_dic, meta_dic, group_func):
    ret = defaultdict(list)
    for uid, score in result_dic.items():
        ret[group_func(meta_dic[uid])].append(score)
    return dict(ret)


def get_average_score(result_lst, is_wer=False):
    if is_wer:
        dic = {"delete": 0, "insert": 0, "replace": 0, "equal": 0}
        for score in result_lst:
            for k in dic.keys():
                dic[k] = dic[k] + score.get(k, 0)
        numerator = dic["replace"] + dic["delete"] + dic["insert"]
        denominator = dic["replace"] + dic["delete"] + dic["equal"]
        wer = numerator / max(denominator, 1)
        msg = f"WER: {wer:.4f}\n"
        for op, count in dic.items():
            msg += f"    {op}: {count}\n"
    else:
        msg = f"Average score: {np.nanmean(result_lst)}\n"
    return msg


def main(args):
    result_dic = {}
    is_wer = None
    with open(args.result_scp, "r") as f:
        for line in f:
            uid, score = line.strip().split(maxsplit=1)
            if is_wer is None:
                try:
                    float(score)
                    is_wer = False
                except ValueError:
                    is_wer = True
            score = json.loads(score) if is_wer else float(score)
            if not uid.startswith("fileid"):
                uid = "fileid" + uid.split("fileid", maxsplit=1)[1]
            result_dic[uid] = score

    meta_dic = {}
    with open(args.meta_tsv, "r") as f:
        headers = next(f).strip().split("\t")
        for line in f:
            tup = line.strip().split("\t")
            meta_dic[tup[0]] = dict(zip(headers, tup))

    for group_func in (
        group_by_fs,
        group_by_snr,
        group_by_duration,
        group_by_corpus,
        group_by_rir,
        group_by_augmentation,
    ):
        name = group_func.__name__.replace("group_by_", "")
        groups = group_score_by_field(result_dic, meta_dic, group_func)
        if group_func in (group_by_fs, group_by_snr, group_by_duration):
            groups = {k: groups[k] for k in sorted(groups.keys())}
        print(f"\n====== Group by {name} =====\n")
        for group, dic in groups.items():
            print(f"[Group] {group}\n\t" + get_average_score(dic, is_wer=is_wer))


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("result_scp", type=str,
                        help="scp of per-sample evaluation results")
    parser.add_argument("--meta_tsv", type=str, required=True,
                        help="simulation meta.tsv with per-sample metadata")
    main(parser.parse_args())
