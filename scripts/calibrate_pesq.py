#!/bin/env python
"""Calibrate metrics/pesq.py frequency-integration scales + validate the
response across the degradation families this challenge actually produces.

P.862's per-band disturbance integration normalisation is the one element of
the ITU code not reproducible in this environment; everything else in
metrics/pesq.py is the published algorithm.  This script:

1. FITS the two scale factors (FREQ_SCALE_D, FREQ_SCALE_A) so the
   implementation's response to additive white Gaussian noise matches the C
   implementation's well-documented MOS-LQO curve on speech-like material:
     nb (P.862.1): 30 dB -> ~3.2, 20 dB -> ~2.5, 10 dB -> ~1.8, 0 dB -> ~1.3
2. VALIDATES the calibrated scales over a matrix of challenge degradations
   (band-limitation, quantile clipping, packet loss, reverb, real mp3/
   vorbis codec via the native libavcodec shim) at nb AND wb: per-family
   monotonicity (more severe -> lower MOS), clean self-score near the P.862
   maximum, and the AWGN anchor rmse.  No oracle exists in-image for the
   non-AWGN families, so they are validated structurally and FROZEN as
   self-golden vectors (tests/data/pesq_goldens.json) that pin the behavior
   against regressions (tests/test_metrics.py::test_pesq_cross_condition_goldens).

Run after any change to the perceptual model; paste the printed constants
into metrics/pesq.py, then rerun with --goldens to refresh the frozen
vectors.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import urgent2026_challenge_track1_tpu.metrics.pesq as P

ANCHORS_NB = [(30.0, 3.2), (20.0, 2.5), (10.0, 1.8), (0.0, 1.3)]
GOLDENS_PATH = Path(__file__).resolve().parent.parent / "tests" / "data" / "pesq_goldens.json"


def speech_like(T, fs, seed=0):
    """Aperiodic speech-shaped test signal: syllabically-modulated filtered
    noise bursts (noise carrier avoids the periodicity ambiguity a harmonic
    complex would create for the alignment histogram)."""
    r = np.random.default_rng(seed)
    t = np.arange(T) / fs
    env = np.clip(np.sin(2 * np.pi * 1.7 * t) ** 3, 0, None)
    env += 0.4 * np.clip(np.sin(2 * np.pi * 0.9 * t + 1.1), 0, None) ** 2
    carrier = r.standard_normal(T)
    # crude speech-shaped spectrum: -6 dB/oct above 500 Hz via one-pole LP
    a = np.exp(-2 * np.pi * 500.0 / fs)
    shaped = np.empty(T)
    s = 0.0
    for i in range(T):
        s = (1 - a) * carrier[i] + a * s
        shaped[i] = s
    x = env * shaped
    return 0.3 * x / np.abs(x).max()


import functools


@functools.lru_cache(maxsize=4)
def _conditions(fs):
    """(x, noise, activity): depends only on fs + fixed seeds — hoisted out
    of the 400-point calibration grid (speech_like has a per-sample loop)."""
    x = speech_like(fs * 4, fs, seed=1)
    act = np.std(x[np.abs(x) > 0.01])
    noise = np.random.default_rng(2).standard_normal(len(x))
    return x, noise, act


def score_conditions(fs, scales):
    P.FREQ_SCALE_D, P.FREQ_SCALE_A = scales
    x, noise, act = _conditions(fs)
    out = []
    for snr, _ in ANCHORS_NB:
        n = act * 10 ** (-snr / 20) * noise
        out.append(P.pesq_metric(x, x + n, fs))
    return out


# ---------------------------------------------------------------------------
# Cross-condition degradation matrix (challenge families, both bands)
# ---------------------------------------------------------------------------


def _degrade_awgn(x, fs, snr_db):
    act = np.std(x[np.abs(x) > 0.01])
    noise = np.random.default_rng(7).standard_normal(len(x))
    return x + act * 10 ** (-snr_db / 20) * noise


def _degrade_bandwidth(x, fs, fs_new):
    from urgent2026_challenge_track1_tpu.simulation.dsp import resample

    y = resample(x[None], fs, fs_new, "polyphase")
    return resample(y, fs_new, fs, "polyphase")[0][: len(x)]


def _degrade_clip(x, fs, lo, hi):
    return np.clip(x, np.quantile(x, lo), np.quantile(x, hi))


def _degrade_packet_loss(x, fs, frac):
    y = x.copy()
    pk = 20 * fs // 1000
    n = len(x) // pk
    rng = np.random.default_rng(11)
    lost = rng.choice(n, size=max(1, int(frac * n)), replace=False)
    for p in lost:
        y[p * pk : (p + 1) * pk] = 0.0
    return y


def _degrade_reverb(x, fs, t60):
    rng = np.random.default_rng(13)
    L = int(t60 * fs)
    rir = rng.standard_normal(L) * np.exp(-6.9 * np.arange(L) / L)
    rir[0] = 1.0
    y = np.convolve(x, rir)[: len(x)]
    return 0.95 * y / np.max(np.abs(y)) * np.max(np.abs(x)) / 0.95


def _degrade_codec(x, fs, fmt, qscale):
    from urgent2026_challenge_track1_tpu.utils import codec_av

    y = codec_av.roundtrip(x.astype(np.float32), fs, fmt, qscale=qscale)
    y = np.asarray(y, np.float64)
    if len(y) < len(x):
        y = np.pad(y, (0, len(x) - len(y)))
    return y[: len(x)]


# (family, [(label, degrade_fn_args)] ordered mild -> severe)
MATRIX = [
    ("awgn", _degrade_awgn, [("snr30", (30.0,)), ("snr20", (20.0,)),
                             ("snr10", (10.0,)), ("snr0", (0.0,))]),
    ("bandwidth", _degrade_bandwidth, [("bw3000", (3000,)), ("bw2000", (2000,)),
                                       ("bw1000", (1000,))]),
    # ladder spans the challenge's sampled ranges (min_quantile [0, 0.1],
    # max_quantile [0.9, 1.0], conf/simulation_train.yaml:49-50); quantile
    # clipping on syllabic speech is already severe at q=0.9
    ("clipping", _degrade_clip, [("clip0-995", (0.0, 0.995)),
                                 ("clip2-96", (0.02, 0.96)),
                                 ("clip10-90", (0.10, 0.90))]),
    ("packet_loss", _degrade_packet_loss, [("pl2", (0.02,)), ("pl10", (0.10,)),
                                           ("pl30", (0.30,))]),
    ("reverb", _degrade_reverb, [("t60_0.2", (0.2,)), ("t60_0.5", (0.5,)),
                                 ("t60_1.0", (1.0,))]),
]


def run_matrix(fs):
    x = speech_like(fs * 4, fs, seed=1)
    rows = []
    for family, fn, ladder in MATRIX:
        for label, fargs in ladder:
            y = fn(x, fs, *fargs)
            rows.append((family, label, float(P.pesq_metric(x, y, fs))))
    # codec (real libavcodec shim; skipped gracefully if the libs are absent)
    try:
        for label, cargs in (("mp3_q9", ("mp3", 9)), ("mp3_q1", ("mp3", 1))):
            y = _degrade_codec(x, fs, *cargs)
            rows.append(("codec", label, float(P.pesq_metric(x, y, fs))))
    except Exception as e:
        print(f"  [codec skipped: {e}]")
    clean = float(P.pesq_metric(x, x, fs))
    rows.insert(0, ("clean", "identity", clean))
    return rows


def validate_and_report(write_goldens=False):
    goldens = []
    ok = True
    for fs, band in ((8000, "nb"), (16000, "wb")):
        print(f"\n== condition matrix {band} (fs={fs}) ==")
        rows = run_matrix(fs)
        by_family = {}
        for family, label, mos in rows:
            by_family.setdefault(family, []).append((label, mos))
            print(f"  {family:12s} {label:12s} MOS {mos:.3f}")
            goldens.append({"fs": fs, "family": family, "label": label,
                            "mos": round(mos, 6)})
        # structural checks
        clean = by_family["clean"][0][1]
        cmax = 4.55 if band == "nb" else 4.64
        if not (cmax - 0.35 <= clean <= cmax + 0.1):
            print(f"  !! clean self-score {clean:.3f} outside {cmax}+-0.35")
            ok = False
        for family, vals in by_family.items():
            if family in ("clean", "codec"):
                continue  # codec qualities are not strictly ordered a priori
            mono = all(a[1] >= b[1] - 0.05 for a, b in zip(vals, vals[1:]))
            if not mono:
                print(f"  !! {family} not monotone: {vals}")
                ok = False
    print(f"\nstructural validation: {'OK' if ok else 'FAILED'}")
    if write_goldens:
        GOLDENS_PATH.parent.mkdir(parents=True, exist_ok=True)
        GOLDENS_PATH.write_text(json.dumps(
            {"freq_scale_d": P.FREQ_SCALE_D, "freq_scale_a": P.FREQ_SCALE_A,
             "goldens": goldens}, indent=1))
        print(f"froze {len(goldens)} self-golden vectors -> {GOLDENS_PATH}")
    return ok


def fit():
    best = None
    for sd in np.geomspace(0.5, 60, 20):
        for sa in np.geomspace(0.5, 60, 20):
            mos = score_conditions(8000, (sd, sa))
            err = sum((m - t) ** 2 for m, (_, t) in zip(mos, ANCHORS_NB))
            if best is None or err < best[0]:
                best = (err, sd, sa, mos)
    err, sd, sa, mos = best
    print(f"FREQ_SCALE_D = {sd:.4f}")
    print(f"FREQ_SCALE_A = {sa:.4f}")
    print(f"awgn-anchor rmse={np.sqrt(err / len(ANCHORS_NB)):.3f}")
    for (snr, tgt), m in zip(ANCHORS_NB, mos):
        print(f"  nb {snr:4.0f} dB: got {m:.3f}  target {tgt:.2f}")
    # wideband check (not fitted)
    P.FREQ_SCALE_D, P.FREQ_SCALE_A = sd, sa
    x = speech_like(16000 * 4, 16000, seed=1)
    act = np.std(x[np.abs(x) > 0.01])
    noise = np.random.default_rng(2).standard_normal(len(x))
    for snr in (30, 20, 10, 0):
        m = P.pesq_metric(x, x + act * 10 ** (-snr / 20) * noise, 16000)
        print(f"  wb {snr:4.0f} dB: got {m:.3f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fit", action="store_true", help="re-fit the scales on "
                    "the AWGN anchors (default: validate only)")
    ap.add_argument("--goldens", action="store_true",
                    help="freeze the cross-condition self-golden vectors")
    args = ap.parse_args()
    if args.fit:
        fit()
    ok = validate_and_report(write_goldens=args.goldens)
    raise SystemExit(0 if ok else 1)
