#!/bin/env python
"""WER + CER via OWSM v3.1 ASR (reference calculate_wer.py + owsm_utils.py).

Per utterance: resample to 16 kHz, decode with espnet OWSM v3.1 ebf (beam 5,
long-form chunked decoding for >30 s audio), normalize both texts with the
Whisper basic normalizer, and account edit operations with Levenshtein
opcodes.  Scores are JSON dicts per utterance (delete/insert/replace/equal +
texts) so get_breakdown.py can aggregate corpus-level WER exactly.
"""

import json
import re
from pathlib import Path

import numpy as np

from _backends import BackendUnavailable
from _shared import audio_io, base_parser, read_pairs, shard, exit_backend_unavailable
from urgent2026_challenge_track1_tpu.metrics.text import (
    opcodes,
    whisper_basic_normalize,
)
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("WER", "CER")
TARGET_FS = 16000
BEAMSIZE = 5
CHUNK_S = 30


END_TIME_THRESHOLD = 29.00  # reference end_time_threshold="<29.00>"
MIN_ADVANCE_S = 2.0  # smallest boundary-resume step; below this, advance a
#                      full chunk (bounds the number of beam decodes)
_TS_RE = re.compile(r"<(\d+\.\d+)>")


def _decode_segment(model, seg, fs, lang_sym, task_sym, maxlenratio=None):
    """One <=30 s OWSM decode with the reference's conditioning: per-utterance
    language/task symbols, ~10 tokens/s maxlenratio, zero-pad to the 30 s
    window (owsm_utils.py:80-83)."""
    import torch

    model.maxlenratio = (
        maxlenratio if maxlenratio is not None
        else -min(300, max(10, int(len(seg) / fs * 10)))
    )
    pad = CHUNK_S * fs
    if len(seg) < pad:
        seg = np.pad(seg, (0, pad - len(seg)))
    with torch.no_grad():
        return model(seg, "<na>", lang_sym=lang_sym, task_sym=task_sym)[0][-2]


def parse_timestamped(text):
    """OWSM timestamped output -> ([(t1, t2, seg_text)], last_ts).

    ``"<0.00> hello there<4.52><4.60> second segment<8.00>"`` yields two
    segments; text outside any timestamp pair is attached as a (None, None)
    segment so no words are dropped.  Returns (segments, last timestamp or
    None)."""
    matches = list(_TS_RE.finditer(text))
    if not matches:
        stripped = text.strip()
        return ([(None, None, stripped)] if stripped else []), None
    segments = []
    head = text[: matches[0].start()].strip()
    if head:
        segments.append((None, None, head))
    for m, m_next in zip(matches, matches[1:]):
        seg = text[m.end() : m_next.start()].strip()
        if seg:
            segments.append((float(m.group(1)), float(m_next.group(1)), seg))
    tail = text[matches[-1].end() :].strip()
    if tail:
        segments.append((float(matches[-1].group(1)), None, tail))
    return segments, float(matches[-1].group(1))


def format_timestamp(seconds, always_include_hours=False, decimal_marker="."):
    """Whisper-style timestamp (reference owsm_utils.py:88-107)."""
    assert seconds >= 0, "non-negative timestamp expected"
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1_000)
    hm = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return f"{hm}{minutes:02d}:{secs:02d}{decimal_marker}{ms:03d}"


def decode_long(model, speech, fs, lang_sym, task_sym):
    """Segmenting long-form decode (reference owsm_utils.py:52-72 semantics,
    espnet ``model.decode_long`` behavior): decode a sliding 30 s window
    with timestamps, advance the window to the LAST predicted segment
    boundary when it lies before the 29 s threshold (so segments never cut
    words at window edges), emit (abs_start, abs_end, text) tuples."""
    chunk = CHUNK_S * fs
    pos = 0
    utts = []
    while pos < len(speech):
        window = speech[pos : pos + chunk]
        text = _decode_segment(
            model, window, fs, lang_sym, task_sym, maxlenratio=-300
        )
        segments, last_ts = parse_timestamped(text)
        offset = pos / fs
        win_seconds = len(window) / fs
        is_last_window = pos + chunk >= len(speech)
        # resume exactly at the final segment boundary — but only when that
        # makes real progress: a near-zero last timestamp (mostly-silent
        # window) would otherwise re-run a full beam decode every few
        # hundred samples, and the whole window WAS already decoded, so a
        # full-chunk advance drops nothing
        advance_to_ts = (
            not is_last_window
            and last_ts is not None
            and MIN_ADVANCE_S <= last_ts < END_TIME_THRESHOLD
        )
        for t1, t2, seg in segments:
            if advance_to_ts and t1 is not None and t2 is None:
                # unclosed tail after the final timestamp: that audio is
                # re-decoded from last_ts next window — emitting it here
                # would duplicate its words in the transcript
                continue
            a = offset + (t1 if t1 is not None else 0.0)
            b = offset + (t2 if t2 is not None else win_seconds)
            utts.append((a, b, seg))
        if is_last_window:
            break
        pos += int(last_ts * fs) if advance_to_ts else chunk
    return utts


def owsm_predict(model, speech, fs, src_lang="eng", long_form=False):
    """OWSM ASR (owsm_utils.py:30-83): long-form inputs use the segmenting
    timestamped decode with the reference's fallback to a plain first-30 s
    decode when long-form decoding raises."""
    model.beam_search.beam_size = BEAMSIZE
    lang_sym = f"<{src_lang}>"
    task_sym = "<asr>"
    if long_form:
        try:
            utts = decode_long(model, speech, fs, lang_sym, task_sym)
            return "\n".join(
                f"[{format_timestamp(seconds=t1)} --> "
                f"{format_timestamp(seconds=t2)}] {res}"
                for t1, t2, res in utts
            )
        except Exception:
            print(
                "An exception occurred in long-form decoding. "
                "Fall back to standard decoding (only first 30s)", flush=True
            )
            speech = speech[: CHUNK_S * fs]
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


def load_model(args):
    """espnet OWSM v3.1 ebf, or a TorchScript ASR export for offline
    deployments (--model_path; forward(wave_T, lang_sym, task_sym) -> str,
    see _backends.ScriptedSpeech2Text)."""
    if args.model_path:
        from _backends import ScriptedSpeech2Text, load_torchscript

        return ScriptedSpeech2Text(
            load_torchscript(args.model_path, args.device), args.device
        )
    try:
        from espnet2.bin.s2t_inference import Speech2Text
    except ImportError as e:
        raise BackendUnavailable(
            "WER", "espnet is not installed (model: espnet/owsm_v3.1_ebf)"
        ) from e
    return Speech2Text.from_pretrained(
        model_tag="espnet/owsm_v3.1_ebf",
        device=args.device,
        task_sym="<asr>",
        beam_size=BEAMSIZE,
        predict_time=False,
    )


def main(args):
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

    model = load_model(args)

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
    parser.add_argument("--model_path", type=str, default=None,
                        help="TorchScript ASR export (forward(wave_T, "
                             "lang_sym, task_sym) -> transcript str); "
                             "bypasses the espnet hub model for offline "
                             "deployments")
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        exit_backend_unavailable(e)
