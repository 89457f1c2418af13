"""STFT / iSTFT with sampling-rate-scaled geometry, TPU-first.

Behavioral spec comes from the reference's use of espnet's STFTEncoder /
STFTDecoder (``/root/reference/baseline_code/models/bsrnn.py:14-25``,
``flow_model.py:26-42``): a Hann-windowed, center-padded (reflect) STFT whose
``n_fft`` / ``win_length`` / ``hop_length`` rescale with the input sampling
rate relative to ``default_fs=48000`` (e.g. fs=16k => n_fft 960->320) — this is
how one model serves 8-48 kHz — plus an optional magnitude-exponent
compression (``spec_transform_type='exponent'``).

TPU-first design notes:
  * all shapes are static functions of (fs, T); one compiled program per
    (fs, length-bucket) pair — matching the reference's one-fs-per-batch
    invariant (``dataset.py:417``);
  * framing is a gather with a trace-time-constant index matrix; XLA fuses
    window multiply into the rFFT's input;
  * the iSTFT overlap-add window envelope is a numpy constant folded at trace
    time (no on-device work);
  * everything is vmap/jit/pjit compatible and differentiable.

Numerics are verified against torch.stft/torch.istft in tests/test_stft.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "stft",
    "istft",
    "STFTConfig",
    "stft_encode",
    "stft_decode",
    "num_frames",
    "reflect_tail",
]


@functools.lru_cache(maxsize=64)
def _hann_np(win_length: int) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window(win_length)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_hann_np(win_length), dtype=dtype)


def num_frames(n_samples: int, n_fft: int, hop: int, center: bool = True) -> int:
    if center:
        n_samples = n_samples + 2 * (n_fft // 2)
    return 1 + (n_samples - n_fft) // hop


def valid_frames(lengths: jnp.ndarray, n_fft: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """Per-sample STFT frame count, traced form of ``num_frames``: (B,)->(B,).

    The ONE canonical copy of the frame-count formula — the model mask
    (models/bsrnn.frame_validity), the loss masks (train/losses), and any
    inline masks must all route through here so a geometry change cannot
    make them disagree."""
    L = lengths.astype(jnp.int32)
    if center:
        L = L + 2 * (n_fft // 2)
    return 1 + (L - n_fft) // hop


def frames_mask(frames: jnp.ndarray, n_frames: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """Frame counts (B,) -> validity mask (B, n_frames)."""
    return (jnp.arange(n_frames)[None, :] < frames[:, None]).astype(dtype)


@functools.lru_cache(maxsize=256)
def _frame_indices(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    return (np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]).astype(
        np.int32
    )


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) via static gather."""
    n = 1 + (x.shape[-1] - n_fft) // hop
    idx = _frame_indices(n, n_fft, hop)
    return x[..., idx]


def reflect_tail(x: jnp.ndarray, lengths: jnp.ndarray, margin: int) -> jnp.ndarray:
    """Rewrite the padding of (B, T) rows so a later center-STFT sees exactly
    what an exact-length STFT would: samples [L, L+margin) become the
    reflection of the signal around L-1 (torch.stft pad_mode="reflect" at the
    right edge of a length-L signal), everything after is zero.

    ``margin`` should be n_fft//2 of the downstream STFT.  If a row's bucket
    leaves less than ``margin`` samples of room the reflection is truncated —
    the buffer-edge reflect pad of the padded STFT then takes over, which is
    the exact-length behavior whenever L == T.
    """
    T = x.shape[-1]
    L = lengths[:, None]
    t = jnp.arange(T)[None, :]
    mirror = jnp.clip(2 * L - 2 - t, 0, T - 1)
    idx = jnp.where((t >= L) & (t < L + margin), mirror, jnp.minimum(t, T - 1))
    out = jnp.take_along_axis(x, idx.astype(jnp.int32), axis=-1)
    return jnp.where(t < L + margin, out, jnp.zeros_like(out))


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    onesided: bool = True,
    normalized: bool = False,
) -> jnp.ndarray:
    """torch.stft-compatible STFT.  x: (..., T) -> (..., n_frames, n_bins) complex.

    Matches torch.stft(center=True, pad_mode="reflect", window=hann(periodic),
    onesided=True, normalized=False, return_complex=True) (transposed: frames
    axis before bins, as espnet's Stft returns (B, T, F)).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, x.dtype)
    if win_length < n_fft:  # center-pad window to n_fft (torch semantics)
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1) if onesided else jnp.fft.fft(frames, axis=-1)
    if normalized:
        spec = spec / jnp.sqrt(jnp.asarray(n_fft, x.dtype))
    return spec


@functools.lru_cache(maxsize=256)
def _ola_envelope(n_frames: int, n_fft: int, hop: int, win_length: int) -> np.ndarray:
    """sum_k w^2[t - k*hop]: static OLA normalization (trace-time constant)."""
    w = _hann_np(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    env = np.zeros(hop * (n_frames - 1) + n_fft, dtype=np.float64)
    wsq = (w.astype(np.float64)) ** 2
    for k in range(n_frames):
        env[k * hop : k * hop + n_fft] += wsq
    # torch.istft errors on zero envelope (NOLA violation); we clamp instead so
    # padded-frame edge cases stay finite.
    return np.maximum(env, 1e-11).astype(np.float32)


def _ola(frames: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Overlap-add (..., n_frames, n_fft) -> (..., hop*(n_frames-1)+n_fft)."""
    n_frames = frames.shape[-2]
    total = hop_length * (n_frames - 1) + n_fft
    lead = frames.shape[:-2]
    if n_fft % hop_length == 0:
        # TPU-friendly overlap-add: when hop divides n_fft each output chunk
        # of `hop` samples receives exactly r = n_fft/hop frame slices, so
        # OLA folds into r shifted pads + adds (no scatter).
        r = n_fft // hop_length
        fr = frames.reshape(lead + (n_frames, r, hop_length))
        out = None
        for i in range(r):
            pad = [(0, 0)] * len(lead) + [(i, r - 1 - i), (0, 0)]
            contrib = jnp.pad(fr[..., :, i, :], pad)
            out = contrib if out is None else out + contrib
        return out.reshape(lead + (total,))
    # odd geometries (e.g. fs=22050 -> n_fft=441, hop=220): scatter-add
    idx = _frame_indices(n_frames, n_fft, hop_length).reshape(-1)
    out = jnp.zeros(lead + (total,), frames.dtype)
    return out.at[..., idx].add(frames.reshape(lead + (-1,)))


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    length: Optional[int] = None,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch.istft-compatible inverse STFT.  spec: (..., n_frames, n_bins).

    ``frame_mask`` (..., n_frames) restricts the synthesis to the masked
    frames: masked frames contribute neither signal nor window energy to the
    overlap-add, so the output over the valid region equals torch.istft of
    the valid frames alone — the length-exact path for bucket-padded batches
    (the reference always synthesizes exact-length signals).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, jnp.float32)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    n_frames = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    total = hop_length * (n_frames - 1) + n_fft
    if frame_mask is not None:
        frames = frames * frame_mask[..., None]
    out = _ola(frames, n_fft, hop_length)
    if frame_mask is None:
        env = jnp.asarray(_ola_envelope(n_frames, n_fft, hop_length, win_length))
    else:
        # per-row envelope from the valid frames only
        wsq = (window.astype(jnp.float32) ** 2)[None, :] * frame_mask[..., None]
        env = jnp.maximum(_ola(wsq, n_fft, hop_length), 1e-11)
    out = out / env
    if center:
        # Drop the n_fft//2 leading pad; keep the tail until `length` is
        # applied — for odd-n_fft geometries (e.g. fs=22050 -> n_fft=441) the
        # symmetric end-trim would discard valid samples (torch.istft slices
        # [start:start+length] the same way).
        start = n_fft // 2
        out = out[..., start:] if length is not None else out[..., start : total - start]
    if length is not None:
        out = out[..., :length]
        if out.shape[-1] < length:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])])
    return out


# ---------------------------------------------------------------------------
# espnet-compatible encoder/decoder with fs scaling and spec compression
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """Geometry + spec-transform config (espnet STFTEncoder/Decoder semantics).

    ``n_fft``/``win_length``/``hop_length`` are defined at ``default_fs`` and
    rescale by integer floor division for other rates, exactly like espnet's
    ``_reconfig_for_fs`` (e.g. 960*22050//48000 = 441, 480*22050//48000 = 220).
    """

    n_fft: int = 960
    hop_length: int = 480
    win_length: Optional[int] = None
    default_fs: int = 48000
    center: bool = True
    onesided: bool = True
    normalized: bool = False
    spec_transform_type: str = "none"  # "none" | "exponent" | "log"
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5

    @property
    def output_dim(self) -> int:
        return self.n_fft // 2 + 1 if self.onesided else self.n_fft

    def geometry(self, fs: int) -> tuple[int, int, int]:
        """(n_fft, win_length, hop_length) for sampling rate ``fs``."""
        win = self.win_length or self.n_fft
        if fs == self.default_fs:
            return self.n_fft, win, self.hop_length
        r = lambda v: v * fs // self.default_fs
        return r(self.n_fft), r(win), r(self.hop_length)

    def n_bins(self, fs: int) -> int:
        n_fft, _, _ = self.geometry(fs)
        return n_fft // 2 + 1 if self.onesided else n_fft

    def frames(self, n_samples: int, fs: int) -> int:
        n_fft, _, hop = self.geometry(fs)
        return num_frames(n_samples, n_fft, hop, self.center)


def spec_transform(spec: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """Forward spectral compression (espnet STFTEncoder.spec_transform_func)."""
    if cfg.spec_transform_type == "exponent":
        if cfg.spec_abs_exponent != 1.0:
            e = cfg.spec_abs_exponent
            mag = jnp.abs(spec)
            # |S|^e * exp(i*angle): stable scale-only transform; keep phase by
            # multiplying S by |S|^(e-1) (guarding |S|=0).
            scale = jnp.where(mag > 0, mag ** (e - 1.0), 0.0)
            spec = spec * scale
        spec = spec * cfg.spec_factor
    elif cfg.spec_transform_type == "log":
        mag = jnp.abs(spec)
        scale = jnp.where(mag > 0, jnp.log1p(mag) / jnp.maximum(mag, 1e-12), 1.0)
        spec = spec * scale
    elif cfg.spec_transform_type not in ("none", None):
        raise ValueError(cfg.spec_transform_type)
    return spec


def spec_inverse_transform(spec: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """Inverse spectral compression (espnet STFTDecoder.spec_back)."""
    if cfg.spec_transform_type == "exponent":
        spec = spec / cfg.spec_factor
        if cfg.spec_abs_exponent != 1.0:
            e = cfg.spec_abs_exponent
            mag = jnp.abs(spec)
            scale = jnp.where(mag > 0, mag ** (1.0 / e - 1.0), 0.0)
            spec = spec * scale
    elif cfg.spec_transform_type == "log":
        mag = jnp.abs(spec)
        scale = jnp.where(mag > 0, jnp.expm1(mag) / jnp.maximum(mag, 1e-12), 1.0)
        spec = spec * scale
    elif cfg.spec_transform_type not in ("none", None):
        raise ValueError(cfg.spec_transform_type)
    return spec


def stft_encode(x: jnp.ndarray, fs: int, cfg: STFTConfig) -> jnp.ndarray:
    """Waveform (..., T) -> compressed complex spectrum (..., frames, bins)."""
    n_fft, win, hop = cfg.geometry(fs)
    spec = stft(
        x,
        n_fft,
        hop,
        win_length=win,
        center=cfg.center,
        onesided=cfg.onesided,
        normalized=cfg.normalized,
    )
    return spec_transform(spec, cfg)


def stft_decode(
    spec: jnp.ndarray,
    fs: int,
    cfg: STFTConfig,
    length: Optional[int] = None,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Compressed complex spectrum (..., frames, bins) -> waveform (..., T)."""
    spec = spec_inverse_transform(spec, cfg)
    n_fft, win, hop = cfg.geometry(fs)
    return istft(
        spec, n_fft, hop, win_length=win, center=cfg.center, length=length,
        frame_mask=frame_mask,
    )
