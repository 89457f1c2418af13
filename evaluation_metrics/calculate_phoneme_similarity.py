#!/bin/env python
"""Levenshtein phoneme similarity (reference calculate_phoneme_similarity.py).

Phoneme sequences from wav2vec2-lv-60-espeak-cv-ft CTC (needs espeak-ng for
the tokenizer); similarity = 1 - normalized Levenshtein distance.
"""

import numpy as np

from _backends import BackendUnavailable
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.metrics.text import levenshtein_distance
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("LPS",)
TARGET_FS = 16000
MODEL_ID = "facebook/wav2vec2-lv-60-espeak-cv-ft"


def _phonemes(model, processor, audio, device):
    """Space-stripped phoneme string — the reference scores at CHARACTER
    level over ``predictor(x)[0].replace(" ", "")``
    (calculate_phoneme_similarity.py:60-66)."""
    import torch

    inputs = processor(audio, sampling_rate=TARGET_FS, return_tensors="pt")
    with torch.no_grad():
        logits = model(inputs.input_values.to(device)).logits
    ids = torch.argmax(logits, dim=-1)
    return processor.batch_decode(ids)[0].replace(" ", "")


def main(args):
    try:
        import transformers

        processor = transformers.AutoProcessor.from_pretrained(args.model_path)
        model = transformers.Wav2Vec2ForCTC.from_pretrained(args.model_path)
    except Exception as e:
        if args.model_path != MODEL_ID:
            # explicit local --model_path that fails to load is a real error,
            # not an environment limitation — don't report it as SKIPPED
            raise SystemExit(
                f"ERROR: could not load '{args.model_path}' "
                f"({type(e).__name__}: {e})"
            ) from e
        raise BackendUnavailable(
            "LPS",
            f"could not load '{args.model_path}' (needs an HF cache, egress + "
            "espeak-ng, or a local --model_path directory saved via "
            "save_pretrained)",
        ) from e
    model = model.to(args.device).eval()
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
        ph_ref = _phonemes(model, processor, ref, args.device)
        ph_inf = _phonemes(model, processor, inf, args.device)
        if len(ph_ref) == 0:
            # silent/noise-only reference: NaN (excluded by nanmean), not a
            # huge negative score (reference :63-64)
            ret.append((uid, {"LPS": float("nan")}))
            continue
        dist = levenshtein_distance(list(ph_ref), list(ph_inf))
        score = 1.0 - dist / len(ph_ref)
        ret.append((uid, {"LPS": score}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser(need_ref=True)
    parser.add_argument("--model_path", type=str, default=MODEL_ID,
                        help="HF hub id or a local save_pretrained directory "
                             "(offline deployments)")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
