"""OWSM long-form decode semantics (VERDICT r2 item 7), stub-model tested.

Reference behavior (/root/reference/evaluation_metrics/owsm_utils.py:52-78):
>30 s audio decodes through espnet's ``model.decode_long`` — a sliding 30 s
window with timestamped segments, the window advancing to the LAST predicted
segment boundary when it falls before the <29.00> end-time threshold, output
formatted as "[mm:ss.mmm --> mm:ss.mmm] text" lines, with a fallback to a
plain first-30 s decode when long-form decoding raises.
"""

import importlib.util
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "evaluation_metrics"))
_spec = importlib.util.spec_from_file_location(
    "calc_wer", Path(__file__).parent.parent / "evaluation_metrics" / "calculate_wer.py"
)
wer = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(wer)

FS = 16000


class StubOWSM:
    """Callable with the espnet Speech2Text surface calculate_wer uses."""

    def __init__(self, scripted):
        self.scripted = list(scripted)
        self.windows = []
        self.beam_search = SimpleNamespace(beam_size=0)
        self.maxlenratio = 0
        self.device = "cpu"

    def __call__(self, seg, prev, lang_sym=None, task_sym=None):
        self.windows.append(np.asarray(seg))
        nxt = self.scripted.pop(0)
        if isinstance(nxt, Exception):
            raise nxt
        return [(None, None, None, nxt, None)]


def test_parse_timestamped():
    segs, last = wer.parse_timestamped(
        "<0.00> hello world<10.00><10.50> second part<20.00>"
    )
    assert segs == [(0.0, 10.0, "hello world"), (10.5, 20.0, "second part")]
    assert last == 20.0
    # no timestamps: whole text is one segment, no advance hint
    segs, last = wer.parse_timestamped("  plain text ")
    assert segs == [(None, None, "plain text")] and last is None
    # dangling tail after the final timestamp is kept
    segs, last = wer.parse_timestamped("<0.00> a<5.00> trailing")
    assert segs == [(0.0, 5.0, "a"), (5.0, None, "trailing")] and last == 5.0


def test_format_timestamp_matches_whisper():
    assert wer.format_timestamp(0.0) == "00:00.000"
    assert wer.format_timestamp(10.5) == "00:10.500"
    assert wer.format_timestamp(3671.25) == "01:01:11.250"


def test_decode_long_advances_to_segment_boundary():
    speech = np.zeros(70 * FS, np.float64)
    stub = StubOWSM([
        "<0.00> hello world<10.00><10.50> second part<20.00>",  # -> advance 20 s
        "<0.00> third bit<25.00>",                               # -> advance 25 s
        "<0.00> final words<20.00>",                             # last window
    ])
    text = wer.owsm_predict(stub, speech, FS, src_lang="eng", long_form=True)
    # three windows: 0-30, 20-50, 45-70 (each zero-padded to 30 s)
    assert len(stub.windows) == 3
    assert all(w.shape[0] == 30 * FS for w in stub.windows)
    lines = text.split("\n")
    assert lines[0] == "[00:00.000 --> 00:10.000] hello world"
    assert lines[1] == "[00:10.500 --> 00:20.000] second part"
    # absolute offsets: window 2 starts at 20 s, window 3 at 45 s
    assert lines[2] == "[00:20.000 --> 00:45.000] third bit"
    assert lines[3] == "[00:45.000 --> 01:05.000] final words"


def test_decode_long_full_window_advance_past_threshold():
    speech = np.zeros(60 * FS, np.float64)
    stub = StubOWSM([
        "<0.00> continuous speech<29.50>",  # last ts >= 29.00 -> advance 30 s
        "<0.00> more speech<28.00>",
    ])
    wer.owsm_predict(stub, speech, FS, src_lang="eng", long_form=True)
    assert len(stub.windows) == 2


def test_long_form_fallback_on_exception():
    speech = np.zeros(40 * FS, np.float64)
    stub = StubOWSM([RuntimeError("boom"), "fallback text"])
    text = wer.owsm_predict(stub, speech, FS, src_lang="eng", long_form=True)
    assert text == "fallback text"
    # fallback decodes only the first 30 s (zero-padded window)
    assert stub.windows[-1].shape[0] == 30 * FS


def test_levenshtein_metric_long_form_end_to_end():
    """Timestamped long-form output through the full WER accounting.

    Reference quirk preserved on purpose: Whisper's BasicTextNormalizer
    bracket regex ``[<\\[][^>\\]]*[>\\]]`` stops at the first ``>`` — which is
    the ``-->`` arrow — so "[a --> b]" loses only "[a --" and the END
    timestamp survives as digit tokens in the scored hypothesis (the
    reference pipes decode_long output through the same normalizer,
    calculate_wer.py:153-162)."""
    speech = 0.01 * np.ones(40 * FS, np.float64)
    stub = StubOWSM([
        "<0.00> hello world<20.00>",
        "<0.00> again<10.00>",
    ])
    ret = wer.levenshtein_metric(stub, "Hello world again!", speech, "eng", fs=FS)
    # hyp normalizes to "00 20 000 hello world 00 30 000 again":
    # the 3 reference words all match; 6 timestamp-residue tokens insert
    assert ret["WER"]["equal"] == 3
    assert ret["WER"]["insert"] == 6
    assert ret["WER"]["replace"] == ret["WER"]["delete"] == 0


def test_decode_long_unclosed_tail_not_duplicated():
    """Text after the final timestamp is re-decoded from the boundary next
    window; emitting it in BOTH windows duplicated its words (round-3
    review finding)."""
    speech = np.zeros(60 * FS, np.float64)
    stub = StubOWSM([
        "<0.00> foo<15.00> bar",            # unclosed tail -> resume at 15 s
        "<0.00> bar continues<28.00>",      # re-decodes the 'bar' audio
        "<0.00> tail words<10.00>",         # last window
    ])
    text = wer.owsm_predict(stub, speech, FS, src_lang="eng", long_form=True)
    lines = text.split("\n")
    assert lines[0] == "[00:00.000 --> 00:15.000] foo"
    assert lines[1] == "[00:15.000 --> 00:43.000] bar continues"
    # the dangling 'bar' from window 1 must NOT appear as its own line
    assert sum("] bar" in ln and "continues" not in ln for ln in lines) == 0
    assert len(stub.windows) == 3


def test_decode_long_min_advance_floor():
    """A near-zero last timestamp must not shrink the window advance to a
    few hundred samples (one full beam decode per 0.02 s of audio); below
    MIN_ADVANCE_S the window advances a full chunk instead."""
    speech = np.zeros(60 * FS, np.float64)
    stub = StubOWSM([
        "<0.00> x<0.50>",       # tiny boundary -> full-chunk advance
        "<0.00> y<5.00>",       # last window
    ])
    text = wer.owsm_predict(stub, speech, FS, src_lang="eng", long_form=True)
    assert len(stub.windows) == 2
    lines = text.split("\n")
    assert lines[0] == "[00:00.000 --> 00:00.500] x"
    assert lines[1] == "[00:30.000 --> 00:35.000] y"
