"""The formant synthesizer must make ESTOI discriminate (VERDICT r3 weak #2).

The round-3 pools' harmonic-complex signal kept ESTOI at its ~0.35 floor for
noisy AND enhanced material; these tests pin the property every quality study
now relies on: clean-vs-degraded ESTOI spread well above the VERDICT's
required 0.15, monotone in SNR, across the challenge sampling rates
(reference metric surface:
evaluation_metrics/calculate_intrusive_se_metrics.py:15,34-47).
"""

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.metrics.stoi import stoi
from urgent2026_challenge_track1_tpu.utils.speech_synth import synth_speech

ALL_RATES = (8000, 16000, 22050, 24000, 32000, 44100, 48000)


@pytest.mark.parametrize("fs", ALL_RATES)
def test_synth_speech_basic(fs):
    x = synth_speech(np.random.default_rng(3), fs, 1.5, 110.0)
    assert x.shape == (int(fs * 1.5),)
    assert x.dtype == np.float32
    assert np.isfinite(x).all()
    assert abs(np.abs(x).max() - 0.3) < 1e-3
    # speech-like activity: neither silence nor a wall of sound
    frac_active = float(np.mean(np.abs(x) > 0.01))
    assert 0.15 < frac_active < 0.95, frac_active


def test_synth_speech_deterministic():
    a = synth_speech(np.random.default_rng(7), 16000, 1.0)
    b = synth_speech(np.random.default_rng(7), 16000, 1.0)
    np.testing.assert_array_equal(a, b)


def _estoi_at_snr(clean, noise, fs, snr_db):
    act = np.std(clean[np.abs(clean) > 0.01])
    y = clean + act * 10 ** (-snr_db / 20) * noise
    return stoi(clean.astype(np.float64), y.astype(np.float64), fs,
                extended=True)


@pytest.mark.parametrize("fs", [8000, 16000, 48000])
def test_estoi_discriminates(fs):
    clean = synth_speech(np.random.default_rng(1), fs, 3.0, 120.0)
    rng = np.random.default_rng(2)
    # 1/f-ish colored noise (matches the soak pools' degradation family)
    n = rng.standard_normal(clean.size)
    for k in range(1, n.size):
        n[k] += 0.6 * n[k - 1]
    n /= np.abs(n).max()
    hi = _estoi_at_snr(clean, n, fs, 20.0)
    mid = _estoi_at_snr(clean, n, fs, 0.0)
    lo = _estoi_at_snr(clean, n, fs, -5.0)
    assert hi > mid > lo, (hi, mid, lo)
    assert hi - lo >= 0.20, (hi, lo)          # VERDICT asks >= 0.15
    assert hi >= 0.85, hi                     # clean-ish scores near ceiling
    self_score = stoi(clean.astype(np.float64), clean.astype(np.float64),
                      fs, extended=True)
    assert self_score >= 0.999, self_score
