#!/bin/env python
"""Language-ID accuracy (reference calculate_lid_accuracy.py) using OWSM-CTC
v4 1B greedy decoding with the <nolang> prompt; resamples to 16 kHz.
"""

import numpy as np

from _backends import BackendUnavailable
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("LIDAccuracy",)
TARGET_FS = 16000
MODEL_TAG = "espnet/owsm_ctc_v4_1B"


def load_model(args):
    """OWSM-CTC via espnet, or a TorchScript export for offline deployments
    (--model_path; forward(wave_T, lang_sym, task_sym) -> str whose first
    token is the language tag, see _backends.ScriptedSpeech2Text)."""
    if args.model_path:
        from _backends import ScriptedSpeech2Text, load_torchscript

        return ScriptedSpeech2Text(
            load_torchscript(args.model_path, args.device), args.device
        )
    try:
        from espnet2.bin.s2t_ctc_inference import Speech2TextGreedySearch
    except ImportError as e:
        raise BackendUnavailable(
            "LIDAccuracy", f"espnet is not installed (model: {MODEL_TAG})"
        ) from e
    return Speech2TextGreedySearch.from_pretrained(
        model_tag=MODEL_TAG, device=args.device, lang_sym="<nolang>", task_sym="<asr>"
    )


def main(args):
    model = load_model(args)

    labels = {}
    with open(args.meta_tsv, "r") as f:
        for line in f:
            uid, lang = line.strip().split(maxsplit=1)
            labels[uid] = lang

    pairs = read_pairs(args)
    pairs, suffix = shard(pairs, args)
    ret = []
    for uid, path in pairs:
        audio, fs = audio_io.read(path)
        assert audio.ndim == 1, audio.shape
        if fs != TARGET_FS:
            audio = resample(audio[None], fs, TARGET_FS, "soxr_hq")[0]
        result = model(audio.astype(np.float32))
        # (text, tokens, ...): the first TOKEN is the language tag, e.g.
        # '<eng>' (reference predict_language_id returns tokens[0] and strips
        # the brackets, calculate_lid_accuracy.py:74,160-162); parsing the
        # detokenized text would glue adjacent special tokens together
        pred_lang = (
            result[0][1][0].replace("<", "").replace(">", "") if result else "unk"
        )
        ret.append((uid, {"LIDAccuracy": float(pred_lang == labels[uid])}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser(need_meta=True)
    parser.add_argument("--model_path", type=str, default=None,
                        help="TorchScript export (forward(wave_T, lang_sym, "
                             "task_sym) -> str whose first token is the "
                             "language tag, e.g. '<eng>'); bypasses the "
                             "espnet hub model for offline deployments")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
