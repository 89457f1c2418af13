#!/bin/env python
"""Emotion-embedding cosine similarity (reference
calculate_emotion_similarity.py) using emotion2vec base; resamples to 16 kHz.
"""

import numpy as np

from _backends import BackendUnavailable, cosine_similarity
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("EmotionSimilarity",)
TARGET_FS = 16000


def load_emotion2vec(device):
    try:
        from funasr import AutoModel
    except ImportError as e:
        raise BackendUnavailable(
            "EmotionSimilarity",
            "funasr is not installed (needed for emotion2vec base)",
        ) from e
    return AutoModel(model="emotion2vec/emotion2vec_base", device=device)


def main(args):
    model = load_emotion2vec(args.device)
    pairs = read_pairs(args, need_ref=True)
    pairs, suffix = shard(pairs, args)
    ret = []
    for uid, ref_path, inf_path in pairs:
        ref, fs1 = audio_io.read(ref_path)
        inf, fs2 = audio_io.read(inf_path)
        assert ref.ndim == 1 and inf.ndim == 1, (ref.shape, inf.shape)
        if fs1 != TARGET_FS:
            ref = resample(ref[None], fs1, TARGET_FS, "soxr_hq")[0]
        if fs2 != TARGET_FS:
            inf = resample(inf[None], fs2, TARGET_FS, "soxr_hq")[0]
        emb_ref = model.generate(ref.astype(np.float32), granularity="utterance")[0]["feats"]
        emb_inf = model.generate(inf.astype(np.float32), granularity="utterance")[0]["feats"]
        ret.append((uid, {"EmotionSimilarity": cosine_similarity(emb_ref, emb_inf)}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    try:
        main(base_parser(need_ref=True).parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
