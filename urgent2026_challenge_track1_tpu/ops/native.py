"""ctypes loader for the native C++ DSP library (csrc/dsp_native.cpp).

Builds the shared library on first use (g++ is part of the baked toolchain)
and caches it next to the source.  Falls back to a pure-numpy implementation
if no compiler is available, so the package stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["sidechain_compress", "native_available", "build_native"]

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def build_native(src_name: str, so_name: str, link_flags=()):
    """Compile csrc/<src_name> into csrc/<so_name> (mtime-cached; pid-suffixed
    temp + atomic rename so concurrent job-array processes never dlopen a
    half-written library) and return the ctypes.CDLL.  Raises on failure —
    callers decide whether absence is fatal.  Single shared implementation
    for all three native libraries (dsp/flac/codec)."""
    src = os.path.abspath(os.path.join(_CSRC, src_name))
    so = os.path.abspath(os.path.join(_CSRC, so_name))
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src, *link_flags],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so)
    return ctypes.CDLL(so)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = build_native("dsp_native.cpp", "libdsp_native.so")
            lib.sidechain_compress.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.sidechain_compress.restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _sidechain_compress_numpy(speech, sidechain, fs, threshold, ratio, attack_ms, release_ms, level_sc):
    attack_coeff = min(1.0, 1.0 / (attack_ms * fs / 4000.0))
    release_coeff = min(1.0, 1.0 / (release_ms * fs / 4000.0))
    delta = 1.0 - 1.0 / ratio
    thres2 = threshold * threshold
    out = np.empty_like(speech)
    lin_slope = 0.0
    for i in range(speech.shape[0]):
        det = sidechain[i] * level_sc
        det *= det
        coeff = attack_coeff if det > lin_slope else release_coeff
        lin_slope += (det - lin_slope) * coeff
        gain = 1.0
        if lin_slope > thres2 and lin_slope > 0.0:
            gain = np.exp(0.5 * delta * (np.log(thres2) - np.log(lin_slope)))
        out[i] = speech[i] * gain
    return out


def sidechain_compress(
    speech: np.ndarray,
    sidechain: np.ndarray,
    fs: float,
    threshold: float,
    ratio: float,
    attack_ms: float,
    release_ms: float,
    level_sc: float = 1.0,
) -> np.ndarray:
    """Duck ``speech`` by the ``sidechain`` signal (ffmpeg sidechaincompress
    semantics, see csrc/dsp_native.cpp).  1-D float64 in, 1-D float64 out."""
    speech = np.ascontiguousarray(speech, np.float64)
    sidechain = np.ascontiguousarray(sidechain, np.float64)
    if speech.ndim != 1 or speech.shape != sidechain.shape:
        # a raise (not assert) so the C kernel can never read past a shorter
        # sidechain buffer under python -O
        raise ValueError(
            f"speech/sidechain must be equal-length 1-D arrays, got "
            f"{speech.shape} vs {sidechain.shape}"
        )
    lib = _load()
    if lib is None:
        return _sidechain_compress_numpy(
            speech, sidechain, fs, threshold, ratio, attack_ms, release_ms, level_sc
        )
    out = np.empty_like(speech)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.sidechain_compress(
        speech.ctypes.data_as(dp),
        sidechain.ctypes.data_as(dp),
        ctypes.c_int64(speech.shape[0]),
        ctypes.c_double(fs),
        ctypes.c_double(threshold),
        ctypes.c_double(ratio),
        ctypes.c_double(attack_ms),
        ctypes.c_double(release_ms),
        ctypes.c_double(level_sc),
        out.ctypes.data_as(dp),
    )
    return out
