#!/bin/env python
"""SpeechBERTScore precision (reference calculate_speechbert_score.py).

Cosine-similarity precision between mHuBERT-147 layer-8 features of the
enhanced and reference signals (DiscreteSpeechMetrics recipe), computed
natively over transformers features; resamples to 16 kHz.
"""

import numpy as np

from _backends import BackendUnavailable, load_hf_model
from _shared import audio_io, base_parser, read_pairs, shard, write_results, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("SpeechBERTScore",)
TARGET_FS = 16000
LAYER = 8
MODEL_ID = "utter-project/mHuBERT-147"


def _features(model, audio, device):
    import torch

    with torch.no_grad():
        x = torch.from_numpy(np.asarray(audio, np.float32))[None].to(device)
        out = model(x, output_hidden_states=True)
    return out.hidden_states[LAYER][0].cpu().numpy()  # (T, D)


def bert_score_precision(ref_feats, inf_feats):
    """max-similarity precision over inf frames (SpeechBERTScore)."""
    a = ref_feats / (np.linalg.norm(ref_feats, axis=1, keepdims=True) + 1e-12)
    b = inf_feats / (np.linalg.norm(inf_feats, axis=1, keepdims=True) + 1e-12)
    sim = b @ a.T  # (T_inf, T_ref)
    return float(sim.max(axis=1).mean())


def main(args):
    try:
        import transformers
        model = transformers.AutoModel.from_pretrained(args.model_path)
    except Exception as e:
        if args.model_path != MODEL_ID:
            # explicit local --model_path that fails to load is a real error,
            # not an environment limitation — don't report it as SKIPPED
            raise SystemExit(
                f"ERROR: could not load '{args.model_path}' "
                f"({type(e).__name__}: {e})"
            ) from e
        raise BackendUnavailable(
            "SpeechBERTScore",
            f"could not load '{args.model_path}' (needs an HF cache, egress, "
            "or a local --model_path directory saved via save_pretrained)",
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
        score = bert_score_precision(
            _features(model, ref, args.device), _features(model, inf, args.device)
        )
        ret.append((uid, {"SpeechBERTScore": score}))
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
