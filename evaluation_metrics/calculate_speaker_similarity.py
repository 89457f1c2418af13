#!/bin/env python
"""Speaker-embedding cosine similarity (reference
calculate_speaker_similarity.py) using espnet voxcelebs12_rawnet3; resamples
to 16 kHz.
"""

import numpy as np

from _backends import BackendUnavailable, cosine_similarity
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("SpeakerSimilarity",)
TARGET_FS = 16000
MODEL_TAG = "espnet/voxcelebs12_rawnet3"


def main(args):
    try:
        from espnet2.bin.spk_inference import Speech2Embedding
    except ImportError as e:
        raise BackendUnavailable(
            "SpeakerSimilarity", f"espnet is not installed (model: {MODEL_TAG})"
        ) from e
    model = Speech2Embedding.from_pretrained(model_tag=MODEL_TAG, device=args.device)
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
        emb_ref = np.asarray(model(ref).squeeze())
        emb_inf = np.asarray(model(inf).squeeze())
        ret.append((uid, {"SpeakerSimilarity": cosine_similarity(emb_ref, emb_inf)}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    try:
        main(base_parser(need_ref=True).parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
