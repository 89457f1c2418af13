#!/bin/env python
"""Non-intrusive NISQA MOS (reference calculate_nonintrusive_nisqa.py).

Loads a NISQA v2 checkpoint (torch) and predicts overall MOS per utterance.
Provide --nisqa_ckpt pointing at nisqa.tar (from the NISQA repo release).
"""

import numpy as np

from _backends import BackendUnavailable
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable

METRICS = ("NISQA_MOS",)


def load_nisqa(ckpt_path: str, device: str):
    try:
        import torch
    except ImportError as e:
        raise BackendUnavailable("NISQA", "torch is not installed") from e
    from pathlib import Path

    if not Path(ckpt_path).exists():
        raise BackendUnavailable(
            "NISQA",
            f"checkpoint '{ckpt_path}' not found — download nisqa.tar from "
            "https://github.com/gabrielmittag/NISQA/releases and pass "
            "--nisqa_ckpt.",
        )
    try:
        from nisqa.NISQA_model import nisqaModel  # NISQA repo on PYTHONPATH
    except ImportError as e:
        raise BackendUnavailable(
            "NISQA",
            "the NISQA package is not importable — clone "
            "https://github.com/gabrielmittag/NISQA and add it to PYTHONPATH.",
        ) from e
    args = {"mode": "predict_file", "pretrained_model": ckpt_path,
            "deg": None, "data_dir": None, "output_dir": None,
            "csv_file": None, "num_workers": 0, "bs": 1, "ms_channel": None,
            "tr_bs_val": 1, "tr_num_workers": 0}
    return nisqaModel(args)


def main(args):
    pairs = read_pairs(args)
    pairs, suffix = shard(pairs, args)
    ret = []
    if args.model_path:
        # offline TorchScript route: forward(wave_1xT, fs) -> MOS
        import torch

        from _backends import load_torchscript

        predictor = load_torchscript(args.model_path, args.device).eval()
        for uid, path in pairs:
            audio, fs = audio_io.read(path)
            with torch.no_grad():
                score = predictor(
                    torch.from_numpy(np.asarray(audio, np.float32))[None], fs)
            ret.append((uid, {"NISQA_MOS": float(score.reshape(-1)[0])}))
        write_results(args.output_dir, METRICS, ret, suffix)
        return
    model = load_nisqa(args.nisqa_ckpt, args.device)
    for uid, path in pairs:
        model.args["deg"] = path
        model._loadDatasetsFile()
        score = float(model.predict()["mos_pred"].iloc[0])
        ret.append((uid, {"NISQA_MOS": score}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser()
    parser.add_argument("--nisqa_ckpt", type=str, default="./NISQA/weights/nisqa.tar")
    parser.add_argument("--model_path", type=str, default=None,
                        help="TorchScript export of a NISQA predictor "
                             "(forward(wave_1xT, fs) -> MOS); bypasses the "
                             "NISQA repo for offline deployments")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
