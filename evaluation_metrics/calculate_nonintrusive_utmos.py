#!/bin/env python
"""Non-intrusive UTMOS (reference calculate_nonintrusive_utmos.py).

Uses torch.hub tarepan/SpeechMOS:v1.2.0 utmos22_strong; resamples to 16 kHz.
"""

import numpy as np

from _backends import BackendUnavailable, load_torch_hub
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("UTMOS",)


def load_predictor(args):
    """utmos22_strong via torch.hub, or a TorchScript export for offline
    deployments (--model_path; same forward(tensor, fs) contract)."""
    import torch

    if args.model_path:
        from _backends import load_torchscript

        return load_torchscript(args.model_path, args.device)
    return load_torch_hub("tarepan/SpeechMOS:v1.2.0", "utmos22_strong", "UTMOS")


def main(args):
    import torch

    pairs = read_pairs(args)
    pairs, suffix = shard(pairs, args)
    predictor = load_predictor(args).to(args.device).eval()
    ret = []
    for uid, path in pairs:
        audio, fs = audio_io.read(path)
        with torch.no_grad():
            score = predictor(
                torch.from_numpy(np.asarray(audio, np.float32))[None].to(args.device),
                fs,
            )
        ret.append((uid, {"UTMOS": float(score.cpu().item())}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser()
    parser.add_argument("--model_path", type=str, default=None,
                        help="TorchScript export of the UTMOS predictor "
                             "(forward(wave_BxT, fs) -> score); bypasses "
                             "torch.hub for offline deployments")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
