"""FLAC stereo-decorrelation paths (left/side, right/side, mid/side).

Real FLAC encoders emit these channel assignments constantly; our encoder
writes independent channels only, so these decoder paths need hand-crafted
streams.  The streams are built with the module's own bit-writer (verbatim
subframes, per the spec: the SIDE subframe carries one extra bit)."""

import struct

import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.utils import flac


def _build_stereo_stream(left, right, ch_asgn, fs=8000, bits=16):
    """One-frame FLAC stream with the given channel assignment (8=L/S,
    9=R/S, 10=M/S), verbatim subframes."""
    left = np.asarray(left, np.int64)
    right = np.asarray(right, np.int64)
    T = len(left)
    if ch_asgn == 8:      # left/side: side = L - R
        ch0, ch1 = left, left - right
        extra = (0, 1)
    elif ch_asgn == 9:    # right/side: side = L - R, stored (side, right)
        ch0, ch1 = left - right, right
        extra = (1, 0)
    elif ch_asgn == 10:   # mid/side: mid = (L+R)>>1, side = L-R
        ch0, ch1 = (left + right) >> 1, left - right
        extra = (0, 1)
    else:
        raise ValueError(ch_asgn)

    out = bytearray(b"fLaC")
    si = flac._BitWriter()
    si.write(T, 16)
    si.write(T, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(fs, 20)
    si.write(1, 3)        # channels - 1 = 1 (stereo)
    si.write(bits - 1, 5)
    si.write(T, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    hw = flac._BitWriter()
    hw.write(0x3FFE, 14)
    hw.write(0, 1)
    hw.write(0, 1)
    hw.write(7, 4)                    # 16-bit blocksize at header end
    hw.write(0, 4)                    # fs from STREAMINFO
    hw.write(ch_asgn, 4)
    hw.write({16: 4}[bits], 3)
    hw.write(0, 1)
    hdr = hw.bytes() + flac._utf8_coded(0) + struct.pack(">H", T - 1)
    hdr += bytes([flac._crc8(hdr)])

    fw = flac._BitWriter()
    for samples, ex in zip((ch0, ch1), extra):
        fw.write(0, 1)     # pad
        fw.write(1, 6)     # VERBATIM
        fw.write(0, 1)     # no wasted bits
        for v in samples:
            fw.write(int(v), bits + ex)
    fw.align()
    frame = hdr + fw.bytes()
    frame += struct.pack(">H", flac._crc16(frame))
    out += frame
    return bytes(out)


@pytest.fixture()
def lr():
    rng = np.random.default_rng(0)
    T = 640
    left = rng.integers(-20000, 20000, T)
    right = np.clip(left + rng.integers(-3000, 3000, T), -32768, 32767)
    return left, right


@pytest.mark.parametrize("ch_asgn", [8, 9, 10])
def test_python_decoder_stereo_decorrelation(lr, ch_asgn):
    left, right = lr
    buf = _build_stereo_stream(left, right, ch_asgn)
    out = flac._decode_py(buf)
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)


@pytest.mark.skipif(not flac.native_available(), reason="no g++ toolchain")
@pytest.mark.parametrize("ch_asgn", [8, 9, 10])
def test_native_decoder_stereo_decorrelation(lr, ch_asgn):
    left, right = lr
    buf = _build_stereo_stream(left, right, ch_asgn)
    out, fs = flac.decode(buf)
    assert fs == 8000
    pcm = np.round(out * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(pcm[:, 0], left)
    np.testing.assert_array_equal(pcm[:, 1], right)


def test_odd_sum_mid_side_roundtrip():
    """mid/side with odd L+R exercises the reconstruction lsb carry."""
    left = np.array([1, -1, 3, -32768, 32767, 0], np.int64)
    right = np.array([0, 2, -4, 32767, -32768, 1], np.int64)
    buf = _build_stereo_stream(left, right, 10)
    out = flac._decode_py(buf)
    np.testing.assert_array_equal(out[:, 0], left)
    np.testing.assert_array_equal(out[:, 1], right)
    if flac.native_available():
        nat, _ = flac.decode(buf)
        np.testing.assert_array_equal(
            np.round(nat * 32768.0).astype(np.int64)[:, 0], left
        )
