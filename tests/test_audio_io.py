"""Native WAV codec: roundtrips, header probe, format coverage."""

import struct

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.utils import audio_io


def test_pcm16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (0.5 * rng.standard_normal(12345)).astype(np.float32).clip(-1, 1)
    p = tmp_path / "a.wav"
    audio_io.write(str(p), x, 16000)
    y, fs = audio_io.read(str(p))
    assert fs == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-9)


def test_float_subtype_roundtrip(tmp_path):
    x = np.linspace(-1, 1, 1000).astype(np.float32)
    p = tmp_path / "f.wav"
    audio_io.write(str(p), x, 8000, subtype="FLOAT")
    y, fs = audio_io.read(str(p))
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_stereo_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = (0.25 * rng.standard_normal((500, 2))).astype(np.float32).clip(-0.99, 0.99)
    p = tmp_path / "s.wav"
    audio_io.write(str(p), x, 44100)
    y, fs = audio_io.read(str(p))
    assert fs == 44100 and y.shape == (500, 2)
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-9)


def test_info_header_only(tmp_path):
    x = np.zeros(4321, np.float32)
    p = tmp_path / "i.wav"
    audio_io.write(str(p), x, 22050)
    frames, fs = audio_io.info(str(p))
    assert frames == 4321 and fs == 22050
    assert audio_io.info_frames(str(p)) == 4321


def test_pcm24_decode(tmp_path):
    """Hand-craft a 24-bit PCM file and decode it."""
    fs, vals = 8000, [0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)]
    raw = b""
    for v in vals:
        raw += struct.pack("<i", v << 8)[1:]  # low 3 bytes of a shifted int32
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, fs, fs * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(raw))
    p = tmp_path / "p24.wav"
    p.write_bytes(hdr + raw)
    y, fs_ = audio_io.read(str(p))
    assert fs_ == fs
    expected = np.array(vals, np.float64) / (1 << 23)
    np.testing.assert_allclose(y, expected, atol=1e-9)


def test_reference_shaped_helpers(tmp_path):
    x = np.stack([np.ones(100, np.float32) * 0.5])  # (1, T) channel-first
    p = tmp_path / "h.wav"
    audio_io.save_audio(x, str(p), 8000)
    audio, fs = audio_io.read_audio(str(p))
    assert audio.shape == (1, 100) and fs == 8000


def test_flac_write_rejects_float_subtype(tmp_path):
    import pytest
    from urgent2026_challenge_track1_tpu.utils import audio_io

    with pytest.raises(ValueError, match="FLAC"):
        audio_io.write(str(tmp_path / "x.flac"), np.zeros(100), 16000, subtype="FLOAT")
