"""Codec augmentation + compressed-file decode via the libavcodec shim.

Covers the reference's torchaudio/libavcodec codec path
(simulate_data_from_param.py:296-330: mp3 / ogg-vorbis / ogg-opus with
qscale) and its compressed-corpus reads (CommonVoice mp3 etc.,
simulate_data_from_param.py:347-361).
"""

import os

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.simulation import dsp as sim_dsp
from urgent2026_challenge_track1_tpu.utils import audio_io, codec_av

pytestmark = pytest.mark.skipif(
    not codec_av.available(), reason="FFmpeg libraries not present"
)

# real MP3 files baked into the image (read-only use; content irrelevant)
SAMPLE_MP3 = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"


def _speechlike(fs, seconds=1.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs * seconds)) / fs
    x = 0.25 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return (x + 0.02 * rng.standard_normal(t.size)).astype(np.float64)


def _snr(ref, deg):
    n = min(ref.size, deg.size)
    ref, deg = ref[:n], deg[:n]
    return 10 * np.log10(np.sum(ref**2) / (np.sum((ref - deg) ** 2) + 1e-12))


@pytest.mark.parametrize("fs", [8000, 22050, 48000])
@pytest.mark.parametrize(
    "fmt,enc,q",
    [("mp3", None, 4), ("ogg", "vorbis", 5), ("ogg", "opus", 5)],
)
def test_roundtrip_all_reference_codecs(fs, fmt, enc, q):
    x = _speechlike(fs)
    y = codec_av.roundtrip(x, fs, fmt, enc, q)
    # gapless alignment: length matches within one codec frame and the
    # distortion is mild but nonzero
    assert abs(y.size - x.size) <= fs  # callers pad/trim to T
    assert _snr(x, y) > 8.0, "codec destroyed the signal"
    assert not np.allclose(x[: y.size], y[: x.size]), "no distortion applied"


def test_mp3_qscale_controls_distortion():
    fs = 16000
    x = _speechlike(fs)
    snr_hi = _snr(x, codec_av.roundtrip(x, fs, "mp3", None, 1))
    snr_lo = _snr(x, codec_av.roundtrip(x, fs, "mp3", None, 10))
    assert snr_hi > snr_lo + 2.0, (snr_hi, snr_lo)


def test_codec_compression_wrapper_shape():
    fs = 16000
    x = _speechlike(fs)[None, :]  # (C, T) renderer layout
    y = sim_dsp.codec_compression(x, fs, format="mp3", encoder=None, qscale=5)
    assert y.shape == x.shape
    assert _snr(x[0], y[0]) > 8.0
    assert sim_dsp.codecs_available()


def test_render_codec_augmentation_string():
    """The meta.tsv chain 'codec(format=...,encoder=...,qscale=...)' renders."""
    from urgent2026_challenge_track1_tpu.simulation import render

    fs = 16000
    x = _speechlike(fs)[None, :]
    out = render.apply_augmentations(
        x, fs, "codec(format=ogg,encoder=opus,qscale=3)"
    )
    assert out.shape == x.shape
    assert not np.allclose(out, x)


@pytest.mark.skipif(not os.path.exists(SAMPLE_MP3), reason="no sample mp3 in image")
def test_decode_real_mp3_file():
    data, fs = codec_av.decode_file(SAMPLE_MP3)
    assert fs in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000)
    assert data.ndim in (1, 2) and data.shape[0] > fs // 2
    assert np.abs(data).max() <= 1.5  # float decode, sane amplitude
    n, pfs, ch = codec_av.probe_file(SAMPLE_MP3)
    assert pfs == fs and ch in (1, 2)
    # container estimate within 10% of the decoded length
    frames = data.shape[0]
    assert abs(n - frames) < 0.1 * frames + 4096


@pytest.mark.skipif(not os.path.exists(SAMPLE_MP3), reason="no sample mp3 in image")
def test_audio_io_reads_mp3():
    data, fs = audio_io.read(SAMPLE_MP3)
    assert data.shape[0] > 0 and fs > 0
    frames, ifs = audio_io.info(SAMPLE_MP3)
    assert ifs == fs


def test_dynamic_mixing_pool_includes_codec():
    """With the shim present the online sampler keeps the codec augmentation
    (reference weights, no renormalization deviation)."""
    from urgent2026_challenge_track1_tpu.simulation.params import SimulationConfigs

    cfg = SimulationConfigs()
    assert "codec" in cfg.augmentations_name
    assert sim_dsp.codecs_available()


def test_roundtrip_rejects_unknown_codec():
    with pytest.raises(RuntimeError):
        codec_av.roundtrip(_speechlike(16000), 16000, "definitely-not-a-format")


@pytest.mark.skipif(not os.path.exists(SAMPLE_MP3), reason="no sample mp3 in image")
def test_info_frames_exact_for_compressed():
    """info() must return the EXACT decoded length for mp3/ogg (the meta.tsv
    length column and inference batch packing assert on it; container headers
    only estimate)."""
    data, fs = audio_io.read(SAMPLE_MP3)
    frames, ifs = audio_io.info(SAMPLE_MP3)
    assert ifs == fs
    assert frames == data.shape[0]
    assert audio_io.info_frames(SAMPLE_MP3) == data.shape[0]
