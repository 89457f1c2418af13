#!/bin/env python
"""Calibrate metrics/pesq.py frequency-integration scales.

P.862's per-band disturbance integration normalisation is the one element of
the ITU code not reproducible in this environment; everything else in
metrics/pesq.py is the published algorithm.  This script fits the two scale
factors (FREQ_SCALE_D, FREQ_SCALE_A) so the implementation's response to
additive white Gaussian noise matches the C implementation's well-documented
MOS-LQO curve on speech-like material:

  nb (P.862.1): 30 dB -> ~3.2, 20 dB -> ~2.5, 10 dB -> ~1.8, 0 dB -> ~1.3

Run after any change to the perceptual model; paste the printed constants
into metrics/pesq.py.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import urgent2026_challenge_track1_tpu.metrics.pesq as P

ANCHORS_NB = [(30.0, 3.2), (20.0, 2.5), (10.0, 1.8), (0.0, 1.3)]


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


def main():
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
    print(f"rmse={np.sqrt(err / len(ANCHORS_NB)):.3f}")
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
    main()
