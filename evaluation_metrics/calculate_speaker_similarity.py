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


def _make_embedder(args):
    """(wave_16k: np.ndarray) -> embedding; espnet RawNet3 by default, or an
    offline TorchScript export via --model_path (forward(wave_1xT @ 16 kHz)
    -> (1, D) or (D,) embedding)."""
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
    try:
        from espnet2.bin.spk_inference import Speech2Embedding
    except ImportError as e:
        raise BackendUnavailable(
            "SpeakerSimilarity", f"espnet is not installed (model: {MODEL_TAG})"
        ) from e
    model = Speech2Embedding.from_pretrained(model_tag=MODEL_TAG, device=args.device)
    return lambda wave: np.asarray(model(wave).squeeze())


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
        ret.append((uid, {"SpeakerSimilarity":
                          cosine_similarity(embed(ref), embed(inf))}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser(need_ref=True)
    parser.add_argument("--model_path", type=str, default=None,
                        help="TorchScript export of a speaker embedder "
                             "(forward(wave_1xT @ 16 kHz) -> embedding); "
                             "bypasses espnet for offline deployments")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
