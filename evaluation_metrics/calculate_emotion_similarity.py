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


def _make_embedder(args):
    """(wave_16k: np.ndarray) -> utterance embedding; funasr emotion2vec by
    default, or an offline TorchScript export via --model_path
    (forward(wave_1xT @ 16 kHz) -> (1, D) or (D,) embedding)."""
    if args.model_path:
        import torch

        from _backends import load_torchscript

        predictor = load_torchscript(args.model_path, args.device).eval()

        def embed(wave):
            with torch.no_grad():
                e = predictor(
                    torch.from_numpy(np.asarray(wave, np.float32))[None])
            return np.asarray(e).squeeze()

        return embed
    model = load_emotion2vec(args.device)
    return lambda wave: model.generate(
        wave.astype(np.float32), granularity="utterance")[0]["feats"]


def main(args):
    embed = _make_embedder(args)
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
        ret.append((uid, {"EmotionSimilarity":
                          cosine_similarity(embed(ref), embed(inf))}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser(need_ref=True)
    parser.add_argument("--model_path", type=str, default=None,
                        help="TorchScript export of an emotion embedder "
                             "(forward(wave_1xT @ 16 kHz) -> embedding); "
                             "bypasses funasr for offline deployments")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
