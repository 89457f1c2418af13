"""ctypes bindings for csrc/codec_native.cpp (system FFmpeg libraries).

Provides the two capabilities the reference gets from torchaudio/libavcodec:

* ``roundtrip`` — mp3/ogg-vorbis/opus encode-decode distortion for the codec
  augmentation (reference ``simulate_data_from_param.py:296-330``, torchaudio
  ``AudioEffector(format=..., encoder=..., CodecConfig(qscale=...))``).
* ``decode_file`` / ``probe_file`` — read compressed corpora (CommonVoice mp3,
  DNS5 ogg, ...) that libsndfile/librosa handle in the reference
  (``simulate_data_from_param.py:347-361``).

The shared library is built on first use against the image's
libavcodec/libavformat/libswresample (headers + .so are baked in, the ffmpeg
CLI is not); everything degrades gracefully when those are absent.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

__all__ = ["available", "roundtrip", "decode_file", "probe_file"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_LONG = ctypes.c_longlong
_FLOATP = ctypes.POINTER(ctypes.c_float)
_INTP = ctypes.POINTER(ctypes.c_int)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            from urgent2026_challenge_track1_tpu.ops.native import build_native

            lib = build_native(
                "codec_native.cpp", "libcodec_native.so",
                link_flags=("-lavformat", "-lavcodec", "-lavutil", "-lswresample"),
            )
            lib.cn_roundtrip.restype = _LONG
            lib.cn_roundtrip.argtypes = [
                _FLOATP, _LONG, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int, _FLOATP, _LONG,
            ]
            lib.cn_probe_file.restype = _LONG
            lib.cn_probe_file.argtypes = [ctypes.c_char_p, _INTP, _INTP]
            lib.cn_decode_file.restype = _LONG
            lib.cn_decode_file.argtypes = [ctypes.c_char_p, _FLOATP, _LONG, _INTP, _INTP]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def roundtrip(speech: np.ndarray, fs: int, format: str, encoder=None, qscale=None) -> np.ndarray:
    """Encode-decode ``speech`` (1-D float) through a lossy codec.

    Mirrors AudioEffector semantics: output is resampled back to ``fs`` and
    gapless-aligned (lame/Xing delay handled by the demuxer); the caller pads
    or truncates to the input length like the reference does.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("codec_native unavailable (no FFmpeg libraries)")
    x = np.ascontiguousarray(speech, np.float32)
    assert x.ndim == 1, x.shape
    q = -1000 if qscale is None else int(qscale)
    enc = b"" if encoder in (None, "None") else str(encoder).encode()
    out = np.zeros(x.size + 2 * fs, np.float32)
    m = lib.cn_roundtrip(
        x.ctypes.data_as(_FLOATP), _LONG(x.size), ctypes.c_int(fs),
        format.encode(), enc, ctypes.c_int(q),
        out.ctypes.data_as(_FLOATP), _LONG(out.size),
    )
    if m < 0:
        raise RuntimeError(f"codec round-trip failed (AVERROR {m}): "
                           f"format={format} encoder={encoder} qscale={qscale} fs={fs}")
    if m > out.size:  # decoded longer than the slack buffer — retry exact
        out = np.zeros(m, np.float32)
        m = lib.cn_roundtrip(
            x.ctypes.data_as(_FLOATP), _LONG(x.size), ctypes.c_int(fs),
            format.encode(), enc, ctypes.c_int(q),
            out.ctypes.data_as(_FLOATP), _LONG(out.size),
        )
        if m < 0:
            raise RuntimeError(f"codec round-trip failed (AVERROR {m})")
    return out[:m].astype(np.float64)


def probe_file(path: str):
    """(frames_estimate, fs, channels) from container headers (no decode)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("codec_native unavailable (no FFmpeg libraries)")
    fs, ch = ctypes.c_int(0), ctypes.c_int(0)
    n = lib.cn_probe_file(str(path).encode(), ctypes.byref(fs), ctypes.byref(ch))
    if n < 0:
        raise RuntimeError(f"cannot probe {path} (AVERROR {n})")
    return int(n), fs.value, ch.value


def decode_file(path: str):
    """(data, fs): data float64 (T,) mono or (T, C), soundfile.read layout."""
    lib = _load()
    if lib is None:
        raise RuntimeError("codec_native unavailable (no FFmpeg libraries)")
    est, fs_est, ch_est = probe_file(path)
    cap = max((est + fs_est) * max(ch_est, 1), 1 << 16)
    fs, ch = ctypes.c_int(0), ctypes.c_int(0)
    out = np.zeros(cap, np.float32)
    m = lib.cn_decode_file(str(path).encode(), out.ctypes.data_as(_FLOATP),
                           _LONG(out.size), ctypes.byref(fs), ctypes.byref(ch))
    if m < 0:
        raise RuntimeError(f"cannot decode {path} (AVERROR {m})")
    if m > out.size:  # estimate was short (VBR without Xing) — retry exact
        out = np.zeros(m, np.float32)
        m = lib.cn_decode_file(str(path).encode(), out.ctypes.data_as(_FLOATP),
                               _LONG(out.size), ctypes.byref(fs), ctypes.byref(ch))
        if m < 0:
            raise RuntimeError(f"cannot decode {path} (AVERROR {m})")
    data = out[:m].astype(np.float64)
    if ch.value > 1:
        data = data.reshape(-1, ch.value)
    return data, fs.value
