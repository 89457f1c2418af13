"""FLAC codec: encoder/decoder round-trip, native vs python decoder parity,
audio_io dispatch (behavior spec: libsndfile FLAC as used by the reference's
prep + dynamic mixing, e.g. resample_to_estimated_bandwidth.py:59-61)."""

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.utils import audio_io, flac


def _tone(T, fs, f0=440.0, amp=0.5, ch=1, seed=0):
    t = np.arange(T) / fs
    rng = np.random.default_rng(seed)
    x = amp * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(T)
    if ch == 1:
        return x
    return np.stack([x, np.roll(x, 7)], axis=-1)


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("T", [4096, 10000, 191])
def test_roundtrip_python_decoder(ch, T):
    fs = 16000
    x = _tone(T, fs, ch=ch)
    buf = flac.encode(x, fs, bits=16)
    y = flac._decode_py(buf).astype(np.float64) / 32768.0
    if ch == 1:
        y = y[:, 0]
    assert y.shape == x.shape
    # 16-bit quantization bound
    np.testing.assert_allclose(y, np.clip(x, -1, 32767 / 32768), atol=1.1 / 32768)


@pytest.mark.skipif(not flac.native_available(), reason="no g++ toolchain")
@pytest.mark.parametrize("ch", [1, 2])
def test_native_matches_python_decoder(ch):
    fs = 22050
    x = _tone(30000, fs, f0=1234.5, ch=ch, seed=3)
    buf = flac.encode(x, fs, bits=16)
    y_py = flac._decode_py(buf)
    y_nat, fs_out = flac.decode(buf)
    assert fs_out == fs
    y_nat_int = np.round(np.atleast_2d(y_nat.T).T * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(y_nat_int.reshape(y_py.shape), y_py)


def test_probe_matches_streaminfo():
    fs = 48000
    x = _tone(12345, fs)
    buf = flac.encode(x, fs, bits=16)
    total, fs_p, ch, bits = flac.probe(buf)
    assert (total, fs_p, ch, bits) == (12345, fs, 1, 16)


def test_audio_io_dispatch(tmp_path):
    fs = 16000
    x = _tone(8192, fs)
    p = str(tmp_path / "a.flac")
    audio_io.write(p, x, fs)
    y, fs_out = audio_io.read(p)
    assert fs_out == fs and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.1 / 32768)
    frames, fs_i = audio_io.info(p)
    assert (frames, fs_i) == (8192, fs)
    # reference-shaped helper (channels-first)
    data, fs_ra = audio_io.read_audio(p)
    assert data.shape == (1, 8192) and fs_ra == fs


@pytest.mark.skipif(not flac.native_available(), reason="no g++ toolchain")
def test_unknown_total_samples_decodes_fully():
    """STREAMINFO total_samples == 0 (streamed/piped encodes) must not
    truncate: the native path grows its capacity until the stream is
    exhausted."""
    fs = 16000
    x = _tone(fs * 10, fs)
    buf = bytearray(flac.encode(x, fs, bits=16))
    buf[21] &= 0xF0  # zero the 36-bit total_samples field
    for i in range(22, 26):
        buf[i] = 0
    assert flac.probe(bytes(buf))[0] == 0
    y, fs_out = flac.decode(bytes(buf))
    assert fs_out == fs and len(y) == len(x)
    np.testing.assert_allclose(y, np.clip(x, -1, 32767 / 32768), atol=1.1 / 32768)


def test_malformed_input_raises_not_crashes():
    """The decoder runs on untrusted corpus files; corrupted/garbage input
    must raise cleanly (native path especially — no UB/segfault)."""
    rng = np.random.default_rng(0)
    x = _tone(8192, 16000)
    good = bytearray(flac.encode(x, 16000, bits=16))
    cases = [b"", b"fLa", b"fLaC" + b"\x00" * 10]
    # random garbage with a valid magic
    cases.append(b"fLaC" + bytes(rng.integers(0, 256, 256, dtype=np.uint8)))
    # bit-flip corruption inside frames of a valid stream
    for seed in range(5):
        r = np.random.default_rng(seed)
        bad = bytearray(good)
        for pos in r.integers(60, len(bad), 20):
            bad[pos] ^= 1 << int(r.integers(0, 8))
        cases.append(bytes(bad))
    for buf in cases:
        try:
            flac.decode(bytes(buf))
        except (ValueError, EOFError, IndexError):
            pass  # clean failure is fine; crashing the process is not
        try:
            flac._decode_py(bytes(buf))
        except Exception:
            pass


def test_lpc_and_rice_escape_paths_decode():
    """Hand-built stream exercising LPC subframes + verbatim residual escape
    is out of scope for the encoder; instead force high-entropy content so
    rice parameters vary across frames and orders 0-2 all appear."""
    rng = np.random.default_rng(7)
    fs = 8000
    x = np.clip(rng.standard_normal(20000) * 0.4, -1, 0.999)
    buf = flac.encode(x, fs, bits=16)
    y = flac._decode_py(buf).astype(np.float64)[:, 0] / 32768.0
    np.testing.assert_allclose(y, np.clip(x, -1, 32767 / 32768), atol=1.1 / 32768)


def test_empty_flac_roundtrip():
    """encode() of zero samples produces a valid header-only stream that
    decode() returns as an empty array (WAV already behaved this way)."""
    from urgent2026_challenge_track1_tpu.utils import flac

    buf = flac.encode(np.zeros(0), 16000)
    data, fs = flac.decode(buf)
    assert data.shape[0] == 0 and fs == 16000
