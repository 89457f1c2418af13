"""Audio I/O: soundfile-compatible read/write with native WAV + FLAC codecs.

The reference uses libsndfile via the ``soundfile`` package for all audio IO
(``simulate_data_from_param.py:347-361``, ``inference.py:50-62``), including
FLAC (``resample_to_estimated_bandwidth.py:59-61`` writes .flac; challenge
corpora ship flac).  This environment has no libsndfile, so self-contained
codecs are provided: a numpy RIFF/WAVE codec (PCM 16/24/32-bit, IEEE float
32/64, WAVE_FORMAT_EXTENSIBLE), a FLAC codec (utils/flac.py: C++ decoder
+ python fixed-predictor encoder), and mp3/ogg/opus decode via the
libavcodec shim (utils/codec_av.py — CommonVoice/DNS5 corpora ship mp3);
``soundfile`` is used when importable so behavior upgrades transparently.
Format is sniffed from content (magic bytes) on read and from the
extension on write.

API mirrors soundfile: ``read(path) -> (data, fs)`` with data float64 in
[-1, 1), shape (T,) mono or (T, C); ``write(path, data, fs)`` picks PCM_16
for integer-ish use cases (soundfile's wav default).
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

try:  # pragma: no cover - depends on environment
    import soundfile as _sf
except ImportError:
    _sf = None

__all__ = [
    "read",
    "write",
    "read_bytes",
    "write_bytes",
    "info_frames",
    "read_audio",
    "save_audio",
]

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _parse_chunks(buf: bytes):
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE", "not a RIFF/WAVE file"
    pos = 12
    chunks = {}
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        chunks[cid] = (pos + 8, size)
        pos += 8 + size + (size & 1)
    return chunks


def _decode(buf: bytes):
    chunks = _parse_chunks(buf)
    off, size = chunks[b"fmt "]
    fmt, n_ch, fs, _, block_align, bits = struct.unpack_from("<HHIIHH", buf, off)
    if fmt == _WAVE_FORMAT_EXTENSIBLE:
        fmt = struct.unpack_from("<H", buf, off + 24)[0]
    off, size = chunks[b"data"]
    raw = buf[off : off + size]
    if fmt == _WAVE_FORMAT_PCM:
        if bits == 16:
            data = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            data = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            i = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            i = np.where(i >= 1 << 23, i - (1 << 24), i)
            data = i.astype(np.float64) / 8388608.0
        elif bits == 8:  # unsigned
            data = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif fmt == _WAVE_FORMAT_IEEE_FLOAT:
        data = np.frombuffer(raw, "<f4" if bits == 32 else "<f8").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAVE format tag {fmt:#x}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch)
    return data, fs


def _is_compressed_magic(head: bytes) -> bool:
    """mp3 (ID3 tag or MPEG frame sync) / ogg container magic bytes."""
    if head[:3] == b"ID3" or head[:4] == b"OggS":
        return True
    return len(head) >= 2 and head[0] == 0xFF and (head[1] & 0xE0) == 0xE0


# small LRU decode cache: info()-then-read() on the same compressed file is
# the common pattern (meta table, batch packing) and exact lengths need a
# full decode — this avoids decoding every mp3/ogg twice.  A few entries
# (not one) so threaded loaders interleaving info()/read() over different
# files still hit; bounded so float64 PCM does not accumulate.
_COMPRESSED_CACHE: "dict" = {}
_COMPRESSED_CACHE_MAX = 8


def _decode_compressed(path: str):
    st = os.stat(path)
    key = (str(path), st.st_mtime_ns, st.st_size)
    hit = _COMPRESSED_CACHE.pop(key, None)
    if hit is not None:
        _COMPRESSED_CACHE[key] = hit  # re-insert: LRU order = dict order
        return hit
    from urgent2026_challenge_track1_tpu.utils import codec_av

    out = codec_av.decode_file(path)
    _COMPRESSED_CACHE[key] = out
    while len(_COMPRESSED_CACHE) > _COMPRESSED_CACHE_MAX:
        _COMPRESSED_CACHE.pop(next(iter(_COMPRESSED_CACHE)))
    return out


def _sf_decode_errors():
    """soundfile's decode-failure types (NOT programming errors like
    TypeError, which should propagate)."""
    err = getattr(_sf, "LibsndfileError", None)
    return (RuntimeError, err) if err is not None else (RuntimeError,)


def read(path: str, dtype: str = "float64"):
    """(data, fs); data (T,) or (T, C) like soundfile.read."""
    sf_exc = None
    if _sf is not None:
        try:
            return _sf.read(path, dtype=dtype)
        except _sf_decode_errors() as e:
            # libsndfile without lame/vorbis support — fall through to the
            # libavcodec shim for compressed formats; keep the original
            # error to chain if the fallback also fails
            sf_exc = e
    try:
        with open(path, "rb") as f:
            buf = f.read()
        if buf[:4] == b"fLaC":
            from urgent2026_challenge_track1_tpu.utils import flac

            data, fs = flac.decode(buf)
        elif _is_compressed_magic(buf[:4]):
            # mp3/ogg corpora (CommonVoice, DNS5) — reference reads these via
            # libsndfile/librosa (simulate_data_from_param.py:347-361)
            data, fs = _decode_compressed(path)
        else:
            data, fs = _decode(buf)
    except Exception as e:
        if sf_exc is not None:
            raise e from sf_exc
        raise
    return data.astype(dtype), fs


def info_frames(path: str) -> int:
    """Number of frames (reference uses soundfile.SoundFile.frames)."""
    return info(path)[0]


def info(path: str) -> tuple[int, int]:
    """(frames, samplerate); header-only for wav/flac, exact decode count for
    mp3/ogg (container headers only bound the duration — callers such as the
    simulation meta table and inference batch packing need the exact length,
    and VBR streams without a Xing header can be off by whole frames)."""
    sf_exc = None
    if _sf is not None:
        try:
            with _sf.SoundFile(path) as af:
                return af.frames, af.samplerate
        except _sf_decode_errors() as e:
            # libsndfile without mp3/vorbis support — use the codec shim,
            # keeping info() consistent with read()
            sf_exc = e
    try:
        with open(path, "rb") as f:
            buf = f.read(4096)
            if buf[:4] == b"fLaC":
                from urgent2026_challenge_track1_tpu.utils import flac

                total, fs, _, _ = flac.probe(buf)
                return total, fs
            if _is_compressed_magic(buf[:4]):
                data, fs = _decode_compressed(path)
                return data.shape[0], fs
            return _parse_chunks_headeronly(buf, f)
    except Exception as e:
        if sf_exc is not None:
            raise e from sf_exc
        raise


def _parse_chunks_headeronly(buf: bytes, f) -> tuple[int, int]:
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE", "not a RIFF/WAVE file"
    pos = 12
    block_align = None
    fs = None
    while True:
        while pos + 8 > len(buf):
            more = f.read(65536)
            if not more:
                raise ValueError("no data chunk found")
            buf += more
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"fmt ":
            while pos + 8 + 16 > len(buf):
                buf += f.read(65536)
            fs = struct.unpack_from("<I", buf, pos + 8 + 4)[0]
            block_align = struct.unpack_from("<H", buf, pos + 8 + 12)[0]
        elif cid == b"data":
            assert block_align and fs, "fmt chunk must precede data"
            return size // block_align, fs
        pos += 8 + size + (size & 1)


def write(path: str, data: np.ndarray, samplerate: int, subtype: Optional[str] = None):
    """soundfile.write-compatible; wav default subtype PCM_16."""
    if _sf is not None:
        return _sf.write(path, data, samplerate, subtype=subtype)
    data = np.asarray(data)
    if data.ndim == 2 and data.shape[0] < data.shape[1]:
        # accept (C, T) defensively; files are written interleaved (T, C)
        data = data.T
    if str(path).lower().endswith(".flac"):
        from urgent2026_challenge_track1_tpu.utils import flac

        try:
            bits = {None: 16, "PCM_16": 16, "PCM_24": 24}[subtype]
        except KeyError:
            raise ValueError(
                f"unsupported FLAC subtype {subtype!r} (PCM_16/PCM_24; FLAC "
                "has no float subtypes)"
            ) from None
        with open(path, "wb") as f:
            f.write(flac.encode(data, samplerate, bits=bits))
        return
    with open(path, "wb") as f:
        f.write(write_bytes(data, samplerate, subtype))


def read_bytes(buf: bytes, dtype: str = "float64"):
    """(data, fs) from an in-memory wav or flac buffer (serving requests
    arrive as bytes; no temp file round-trip)."""
    if buf[:4] == b"fLaC":
        from urgent2026_challenge_track1_tpu.utils import flac

        data, fs = flac.decode(buf)
    else:
        data, fs = _decode(buf)
    return np.asarray(data).astype(dtype), fs


def write_bytes(data: np.ndarray, samplerate: int,
                subtype: Optional[str] = None) -> bytes:
    """Encode a RIFF/WAVE buffer in memory (PCM_16 default, FLOAT kept
    lossless for serving responses)."""
    data = np.asarray(data)
    if data.ndim == 2 and data.shape[0] < data.shape[1]:
        data = data.T
    n_ch = 1 if data.ndim == 1 else data.shape[1]
    subtype = subtype or "PCM_16"
    if subtype == "PCM_16":
        pcm = np.clip(np.round(data * 32768.0), -32768, 32767).astype("<i2")
        raw = pcm.tobytes()
        fmt, bits = _WAVE_FORMAT_PCM, 16
    elif subtype == "FLOAT":
        raw = data.astype("<f4").tobytes()
        fmt, bits = _WAVE_FORMAT_IEEE_FLOAT, 32
    else:
        raise ValueError(f"unsupported subtype {subtype}")
    block_align = n_ch * bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt, n_ch, samplerate, samplerate * block_align, block_align, bits
    )
    hdr += b"data" + struct.pack("<I", len(raw))
    return hdr + raw


# -- reference-shaped helpers (simulate_data_from_param.py:347-372) ---------


def read_audio(path: str):
    """(channels, T) float64 + fs."""
    data, fs = read(path)
    if data.ndim == 1:
        return data[None, :], fs
    return data.T, fs


def save_audio(audio: np.ndarray, path: str, fs: int):
    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio.T  # (C, T) -> (T, C)
        if audio.shape[1] == 1:
            audio = audio[:, 0]
    write(path, audio, fs)
