"""Simulation engine: DSP units, param/meta round-trip, dynamic mixing e2e."""

import re

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.simulation import dsp, params, render
from urgent2026_challenge_track1_tpu.simulation.wind import WindNoiseGenerator, lsf2poly
from urgent2026_challenge_track1_tpu.utils import audio_io


def test_detect_non_silence_masks_silence():
    fs = 16000
    x = np.zeros((1, fs), dtype=np.float64)
    x[0, 4000:8000] = np.random.default_rng(0).standard_normal(4000)
    mask = dsp.detect_non_silence(x)
    assert mask.shape == x.shape
    assert mask[0, 5000:7000].all()
    assert not mask[0, :2000].any()


def test_high_pass_removes_dc_keeps_speech():
    fs = 16000
    t = np.arange(fs) / fs
    low = np.sin(2 * np.pi * 20 * t)  # below 70 Hz cutoff
    high = np.sin(2 * np.pi * 300 * t)
    out_low = dsp.high_pass_filter(low[None], fs)
    out_high = dsp.high_pass_filter(high[None], fs)
    assert np.abs(out_low).max() < 0.1
    assert np.abs(out_high).max() > 0.9


@pytest.mark.parametrize("res_type", ["kaiser_best", "kaiser_fast", "scipy", "polyphase"])
def test_resample_preserves_tone(res_type):
    fs, fs_new = 48000, 16000
    t = np.arange(fs) / fs
    x = np.sin(2 * np.pi * 440 * t)[None]
    y = dsp.resample(x, fs, fs_new, res_type)
    assert abs(y.shape[-1] - fs_new) <= 2
    # energy preserved within 1 dB for an in-band tone
    ratio = (y**2).mean() / (x**2).mean()
    assert 0.8 < ratio < 1.3, ratio


def test_bandwidth_limitation_removes_high_band():
    fs = 32000
    t = np.arange(fs) / fs
    x = (np.sin(2 * np.pi * 440 * t) + np.sin(2 * np.pi * 10000 * t))[None]
    y = dsp.bandwidth_limitation(x, fs, 16000, "kaiser_best")
    assert y.shape == x.shape
    spec = np.abs(np.fft.rfft(y[0]))
    freqs = np.fft.rfftfreq(fs, 1 / fs)
    hi = spec[freqs > 9000].max()
    lo = spec[np.abs(freqs - 440) < 5].max()
    assert hi < lo * 1e-2


def test_mix_noise_snr():
    rng = np.random.default_rng(0)
    speech = rng.standard_normal((1, 32000))
    noise = rng.standard_normal((1, 32000))
    noisy, scaled = dsp.mix_noise(speech, noise, snr=10.0, rng=rng)
    snr_emp = 10 * np.log10((speech**2).mean() / (scaled**2).mean())
    assert abs(snr_emp - 10.0) < 0.7


def test_wind_noise_mix_ducks_speech():
    rng = np.random.default_rng(1)
    fs = 16000
    speech = 0.5 * np.sin(2 * np.pi * 220 * np.arange(fs) / fs)[None]
    noise = rng.standard_normal((1, fs)) * 0.5
    noisy, scaled = dsp.wind_noise_mix(
        speech, noise, fs, threshold=0.2, ratio=10, attack=10, release=50,
        sc_gain=1.0, clipping=True, clipping_threshold=0.9, snr=0.0, rng=rng,
    )
    assert noisy.shape == speech.shape
    assert np.isfinite(noisy).all()


def test_estimate_early_rir():
    fs = 16000
    rir = np.zeros((1, fs))
    rir[0, 100] = 1.0  # direct path
    rir[0, 5000] = 0.5  # late reflection
    early = dsp.estimate_early_rir(rir, fs=fs)
    assert early[0, 100] == 1.0
    assert early[0, 5000] == 0.0  # beyond 50 ms after onset


def test_clipping_quantiles():
    x = np.linspace(-1, 1, 1000)[None]
    y = dsp.clipping(x, 0.1, 0.9)
    assert y.min() >= np.quantile(x, 0.1) - 1e-9
    assert y.max() <= np.quantile(x, 0.9) + 1e-9


def test_packet_loss_zeroes_packets():
    fs = 16000
    x = np.ones((1, fs))
    y = dsp.packet_loss_apply(x, fs, [3, 7], 20)
    assert y[0, 3 * 320 : 4 * 320].sum() == 0
    assert y[0, 0:320].sum() == 320


def test_lsf2poly_known():
    # LSFs of a stable filter give a monic polynomial with real coeffs
    lsf = np.array([0.5, 1.0, 1.5, 2.0, 2.5])
    a = lsf2poly(lsf)
    assert a.shape == (6,)
    assert abs(a[0] - 1.0) < 1e-9
    # roots inside unit circle (stability)
    assert np.all(np.abs(np.roots(a)) < 1.0)


def test_wind_noise_generator():
    gen = WindNoiseGenerator(fs=8000, duration=1, gustiness=3, start_seed=0)
    wn, profile = gen.generate_wind_noise()
    assert wn.shape == (8000,)
    assert abs(np.abs(wn).max() - 0.95) < 1e-6
    assert profile.shape == (8000,)
    # deterministic under the same seed
    gen2 = WindNoiseGenerator(fs=8000, duration=1, gustiness=3, start_seed=0)
    wn2, _ = gen2.generate_wind_noise()
    np.testing.assert_allclose(wn, wn2)


def test_meta_string_roundtrip():
    """Sampled augmentation strings parse with the renderer's regexes."""
    np.random.seed(0)
    noise_dic = {16000: {"noise1": "n1.wav"}}
    wind_dic = {16000: {"wind_noise1": "w1.wav"}}
    rir_dic = {16000: {"rir1": "r1.wav"}}
    for use_wind in (False, True):
        for augs in ("none", ["bandwidth_limitation", "packet_loss"], ["clipping"]):
            meta = params.sample_meta(
                params.SimulationConfigs,
                16000,
                16000,
                noise_dic={k: dict(v) for k, v in noise_dic.items()},
                used_noise_dic=None,
                wind_noise_dic={k: dict(v) for k, v in wind_dic.items()},
                used_wind_noise_dic=None,
                use_wind_noise=use_wind,
                snr_range=(-5, 20),
                wind_noise_snr_range=(-10, 15),
                rir_dic={k: dict(v) for k, v in rir_dic.items()},
                used_rir_dic=None,
                augmentations=augs,
            )
            for aug in meta["augmentation"].split("/"):
                if aug in ("none", ""):
                    continue
                assert re.fullmatch(
                    r"(wind_noise|bandwidth_limitation|clipping|codec|packet_loss)"
                    r"([(-].*)?",
                    aug,
                ), aug


def test_select_sample_fallback_to_higher_fs():
    np.random.seed(0)
    dic = {8000: {}, 48000: {"u48": "p48"}}
    used = {8000: {}, 48000: {}}
    uid, sample = params.select_sample(8000, dic, used_sample_dic=used)
    assert uid == "u48"
    assert "u48" in used[48000] and "u48" not in dic[48000]
    # exhausted + reuse -> falls back to used pool
    uid2, _ = params.select_sample(8000, dic, used_sample_dic=used, reuse_sample=True)
    assert uid2 == "u48"


@pytest.fixture()
def dm_sources(tmp_path):
    """Tiny speech/noise/rir/wind corpora + scps for dynamic mixing."""
    rng = np.random.default_rng(0)
    fs = 16000

    def wav(name, data):
        p = tmp_path / name
        audio_io.write(str(p), data.astype(np.float32), fs)
        return str(p)

    entries = {"speech": [], "noise": [], "rir": [], "wind": []}
    for i in range(3):
        t = np.arange(fs) / fs
        sp = 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        entries["speech"].append((f"sp{i}", fs, wav(f"sp{i}.wav", sp)))
    for i in range(2):
        entries["noise"].append(
            (f"nz{i}", fs, wav(f"nz{i}.wav", 0.2 * rng.standard_normal(fs // 2)))
        )
    rir = np.zeros(2000)
    rir[10] = 1.0
    rir[500] = 0.3
    entries["rir"].append(("rir0", fs, wav("rir0.wav", rir)))
    entries["wind"].append(
        ("wind_noise0", fs, wav("wind0.wav", 0.2 * rng.standard_normal(fs)))
    )

    scps = {}
    for kind, rows in entries.items():
        p = tmp_path / f"{kind}.scp"
        with open(p, "w") as f:
            for uid, fs_, path in rows:
                print(uid, fs_, path, file=f)
        scps[kind] = str(p)
    with open(tmp_path / "length.scp", "w") as f:
        for uid, fs_, path in entries["speech"]:
            print(uid, fs, file=f)
    scps["length"] = str(tmp_path / "length.scp")
    return scps


def test_dynamic_mixing_end_to_end(dm_sources):
    from urgent2026_challenge_track1_tpu.data.dynamic import DynamicMixingDataset

    np.random.seed(0)
    ds = DynamicMixingDataset(
        speech_source_scp=dm_sources["speech"],
        noise_source_scp=dm_sources["noise"],
        rir_scp=dm_sources["rir"],
        windnoise_scp=dm_sources["wind"],
        speech_length_file=dm_sources["length"],
        max_duration=16000,
        use_high_pass=True,
    )
    assert len(ds) == 3
    assert ds.get_srs() == [16000] * 3
    for i in range(3):
        clean, noisy, fs, length = ds[i]
        assert fs == 16000
        assert clean.shape == noisy.shape == (1, 16000)
        assert np.isfinite(clean).all() and np.isfinite(noisy).all()
        peak = max(np.abs(clean).max(), np.abs(noisy).max())
        assert peak <= 0.9 + 1e-6
        # noisy differs from clean (something was mixed in)
        assert np.abs(noisy - clean).max() > 1e-4


@pytest.mark.parametrize("res_type", ["soxr_hq", "kaiser_best", "kaiser_fast", "polyphase", "scipy"])
@pytest.mark.parametrize("orig,tgt", [(16000, 48000), (44100, 16000), (16000, 22050)])
def test_resample_unity_gain(res_type, orig, tgt):
    """scipy.resample_poly multiplies array windows by `up` itself; a
    pre-scaled filter made upsampling gain up-fold (e.g. 160x for
    44.1k->16k), corrupting every bandwidth-limited render."""
    t = np.arange(orig) / orig
    x = np.sin(2 * np.pi * 440 * t)[None]
    y = dsp.resample(x, orig, tgt, res_type)
    peak = float(np.abs(y).max())
    assert 0.9 < peak < 1.1, (res_type, orig, tgt, peak)
