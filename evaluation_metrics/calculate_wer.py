#!/bin/env python
"""WER + CER via OWSM v3.1 ASR (reference calculate_wer.py + owsm_utils.py).

Per utterance: resample to 16 kHz, decode with espnet OWSM v3.1 ebf (beam 5,
long-form chunked decoding for >30 s audio), normalize both texts with the
Whisper basic normalizer, and account edit operations with Levenshtein
opcodes.  Scores are JSON dicts per utterance (delete/insert/replace/equal +
texts) so get_breakdown.py can aggregate corpus-level WER exactly.
"""

import json
from pathlib import Path

import numpy as np

from _backends import BackendUnavailable
from _shared import audio_io, base_parser, read_pairs, shard
from urgent2026_challenge_track1_tpu.metrics.text import (
    opcodes,
    whisper_basic_normalize,
)
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("WER", "CER")
TARGET_FS = 16000
BEAMSIZE = 5
CHUNK_S = 30


def _decode_segment(model, seg, fs, lang_sym, task_sym):
    """One <=30 s OWSM decode with the reference's conditioning: per-utterance
    language/task symbols, ~10 tokens/s maxlenratio, zero-pad to the 30 s
    window (owsm_utils.py:80-83)."""
    import torch

    model.maxlenratio = -min(300, max(10, int(len(seg) / fs * 10)))
    pad = CHUNK_S * fs
    if len(seg) < pad:
        seg = np.pad(seg, (0, pad - len(seg)))
    with torch.no_grad():
        return model(seg, "<na>", lang_sym=lang_sym, task_sym=task_sym)[0][-2]


def owsm_predict(model, speech, fs, src_lang="eng", long_form=False):
    """OWSM ASR with greedy long-form chunking for >30 s audio
    (owsm_utils.py:30-83; the reference's model.decode_long is espnet
    internals — fixed 30 s chunks approximate it)."""
    model.beam_search.beam_size = BEAMSIZE
    lang_sym = f"<{src_lang}>"
    task_sym = "<asr>"
    if long_form:
        texts = []
        chunk = CHUNK_S * fs
        for st in range(0, len(speech), chunk):
            seg = speech[st : st + chunk]
            if len(seg) < fs // 2:
                break
            texts.append(_decode_segment(model, seg, fs, lang_sym, task_sym))
        return " ".join(texts)
    return _decode_segment(model, speech, fs, lang_sym, task_sym)


def _account(ref_tokens, inf_tokens, ref_txt, inf_txt):
    ret = {"hyp_text": inf_txt, "ref_text": ref_txt,
           "delete": 0, "insert": 0, "replace": 0, "equal": 0}
    for op, ref_st, ref_et, inf_st, inf_et in opcodes(ref_tokens, inf_tokens):
        if op == "insert":
            ret[op] += inf_et - inf_st
        else:
            ret[op] += ref_et - ref_st
    total = ret["delete"] + ret["replace"] + ret["equal"]
    assert total == len(ref_tokens), (total, len(ref_tokens))
    total = ret["insert"] + ret["replace"] + ret["equal"]
    assert total == len(inf_tokens), (total, len(inf_tokens))
    return ret


def levenshtein_metric(model, ref_txt, inf, lang_id, fs=16000):
    if ref_txt == "<not-available>":
        return dict(WER={}, CER={})
    if fs != TARGET_FS:
        inf = resample(inf[None], fs, TARGET_FS, "soxr_hq")[0]
        fs = TARGET_FS
    inf_txt = owsm_predict(
        model, inf.astype(np.float64), fs, src_lang=lang_id,
        long_form=len(inf) > CHUNK_S * fs,
    )
    ref_txt = whisper_basic_normalize(ref_txt)
    inf_txt = whisper_basic_normalize(inf_txt)
    ret_wer = _account(ref_txt.split(), inf_txt.split(), ref_txt, inf_txt)
    ret_cer = _account(list(ref_txt), list(inf_txt), ref_txt, inf_txt)
    return dict(WER=ret_wer, CER=ret_cer)


def main(args):
    try:
        from espnet2.bin.s2t_inference import Speech2Text
    except ImportError as e:
        raise BackendUnavailable(
            "WER", "espnet is not installed (model: espnet/owsm_v3.1_ebf)"
        ) from e

    transcripts = {}
    language_id = {}
    with open(args.meta_tsv, "r") as f:
        for line in f:
            uid, txt = line.strip().split(maxsplit=1)
            transcripts[uid] = txt
    with open(args.utt2lang, "r") as f:
        for line in f:
            uid, lang = line.strip().split(maxsplit=1)
            assert uid in transcripts, uid
            language_id[uid] = lang

    pairs = []
    with open(args.inf_scp, "r") as f:
        for line in f:
            uid, path = line.strip().split()
            pairs.append((uid, transcripts[uid], path, language_id[uid]))
    pairs, suffix = shard(pairs, args)

    model = Speech2Text.from_pretrained(
        model_tag="espnet/owsm_v3.1_ebf",
        device=args.device,
        task_sym="<asr>",
        beam_size=BEAMSIZE,
        predict_time=False,
    )

    outdir = Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    writers = {m: (outdir / f"{m}{suffix}.scp").open("w") for m in METRICS}
    for uid, ref_txt, path, lang in pairs:
        inf, fs = audio_io.read(path)
        assert inf.ndim == 1, inf.shape
        scores = levenshtein_metric(model, ref_txt, inf, lang, fs=fs)
        for m in METRICS:
            writers[m].write(f"{uid} {json.dumps(scores[m])}\n")
    for m in METRICS:
        writers[m].close()
    print(f"Results written under {outdir}", flush=True)


if __name__ == "__main__":
    parser = base_parser(need_meta=True)
    parser.add_argument("--utt2lang", type=str, required=True)
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        raise SystemExit(f"ERROR: {e}")
