#!/bin/env python
"""Non-intrusive SCOREQ MOS (reference calculate_nonintrusive_scoreq.py).

Uses the SCOREQ package (natural-speech no-reference mode); resamples to
16 kHz.
"""

import numpy as np

from _backends import BackendUnavailable
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("SCOREQ",)


TARGET_FS = 16000


def main(args):
    pairs = read_pairs(args)
    pairs, suffix = shard(pairs, args)
    ret = []
    if args.model_path:
        # offline TorchScript route: forward(wave_1xT @ 16 kHz) -> MOS
        import torch

        from _backends import load_torchscript

        predictor = load_torchscript(args.model_path, args.device).eval()
        for uid, path in pairs:
            audio, fs = audio_io.read(path)
            if fs != TARGET_FS:
                audio = resample(audio[None], fs, TARGET_FS, "soxr_hq")[0]
            with torch.no_grad():
                score = predictor(
                    torch.from_numpy(np.asarray(audio, np.float32))[None])
            ret.append((uid, {"SCOREQ": float(score.reshape(-1)[0])}))
        write_results(args.output_dir, METRICS, ret, suffix)
        return
    try:
        import scoreq
    except ImportError as e:
        raise BackendUnavailable(
            "SCOREQ",
            "the scoreq package is not importable — clone "
            "https://github.com/alessandroragano/scoreq and install it.",
        ) from e
    model = scoreq.Scoreq(data_domain="natural", mode="nr")
    for uid, path in pairs:
        score = model.predict(test_path=path, ref_path=None)
        ret.append((uid, {"SCOREQ": float(score)}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser()
    parser.add_argument("--model_path", type=str, default=None,
                        help="TorchScript export of the SCOREQ nr-mode model "
                             "(forward(wave_1xT @ 16 kHz) -> score); bypasses "
                             "the scoreq package for offline deployments")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
