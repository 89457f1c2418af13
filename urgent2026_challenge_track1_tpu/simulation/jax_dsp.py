"""On-device (jit/vmap) simulation DSP for TPU-side batch augmentation.

The reference renders augmentations per sample on host CPUs inside
DataLoader workers (SURVEY.md §3.1); this module provides batched JAX
equivalents of the renderer's core math so a whole (fs, T) bucket can be
augmented on device in one program — the north-star "dynamic mixing moves
on-device" path.  Parameter sampling stays on host (simulation/params.py);
each batch ships a small struct of per-item parameters.

Deviations from the host renderer (simulation/dsp.py), documented:
  * bandwidth limitation is an anti-aliasing low-pass at the target Nyquist
    (the host down-up polyphase resample is a near-ideal LPF; the on-device
    version skips the decimation grid so there are no aliasing images);
  * quantile clipping uses jnp.quantile (linear interpolation, same as
    numpy default);
  * augmentations apply in each item's SAMPLED chain order (host renderer
    semantics) via a per-item 3-step op select — see render_batch;
  * the wind-noise sidechain compressor and the codec round-trip stay on
    host (sequential C++ kernel / libavcodec; such items arrive
    prerendered).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

__all__ = [
    "fft_convolve",
    "detect_non_silence_mask",
    "mix_at_snr",
    "early_rir_mask",
    "quantile_clip",
    "apply_packet_loss",
    "bandwidth_mask_apply",
    "bandwidth_lowpass",
    "high_pass",
    "render_batch",
]


def fft_convolve(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Linear convolution truncated to len(x).  (..., T) conv (..., L)."""
    T = x.shape[-1]
    L = h.shape[-1]
    n = T + L - 1
    nfft = 1 << int(np.ceil(np.log2(n)))
    y = jnp.fft.irfft(
        jnp.fft.rfft(x, nfft) * jnp.fft.rfft(h, nfft), nfft
    )
    return y[..., :T]


def detect_non_silence_mask(
    x: jnp.ndarray, threshold: float = 0.01, frame_length: int = 1024,
    frame_shift: int = 512, lengths=None,
) -> jnp.ndarray:
    """Boolean VAD mask (..., T), espnet detect_non_silence semantics.

    With ``lengths`` (B,) only frames inside each item's true extent enter
    the relative-threshold statistics — bucket zero-padding would otherwise
    lower the mean power and shift every VAD decision vs the host renderer,
    which frames the exact-length signal."""
    T = x.shape[-1]
    if T < frame_length:
        return jnp.ones_like(x, dtype=bool)
    n = (T - frame_length) // frame_shift + 1
    idx = np.arange(frame_length)[None, :] + frame_shift * np.arange(n)[:, None]
    framed = x[..., idx]
    power = jnp.mean(framed**2, axis=-1)
    if lengths is None:
        fvalid = jnp.ones_like(power, dtype=bool)
    else:
        starts = frame_shift * jnp.arange(n)
        fvalid = starts[None, :] + frame_length <= jnp.asarray(lengths)[:, None]
    n_valid = jnp.maximum(jnp.sum(fvalid, axis=-1, keepdims=True), 1)
    mean_power = jnp.sum(power * fvalid, axis=-1, keepdims=True) / n_valid
    detect = (power / jnp.maximum(mean_power, 1e-30) > threshold) & fvalid
    detect = jnp.where(mean_power > 0, detect, fvalid)
    # expand each frame decision over frame_shift samples, edge-extend tail
    det = jnp.repeat(detect, frame_shift, axis=-1)
    pad = T - det.shape[-1]
    det = jnp.concatenate(
        [det, jnp.broadcast_to(det[..., -1:], det.shape[:-1] + (pad,))], axis=-1
    )
    if lengths is not None:
        # per-item edge-extension: samples between the last VALID frame's
        # coverage and the item length take that frame's decision (exactly
        # what the repeat+tail above does for an unpadded signal), and
        # padding samples are always False
        L = jnp.asarray(lengths)[:, None]
        nv = jnp.sum(fvalid, axis=-1)
        last = jnp.take_along_axis(detect, jnp.maximum(nv - 1, 0)[:, None], axis=-1)
        cover = (nv * frame_shift)[:, None]
        pos = jnp.arange(T)[None, :]
        det = jnp.where(pos < cover, det, last)
        # items shorter than one frame have NO valid frames; the host path
        # returns all-ones for such signals (T < frame_length branch above)
        # — otherwise the SNR mix would scale their noise to exactly zero
        det = jnp.where((nv == 0)[:, None], jnp.ones_like(det), det)
        det = det & (pos < L)
    return det


def mix_at_snr(speech: jnp.ndarray, noise: jnp.ndarray, snr_db: jnp.ndarray,
               lengths=None):
    """(B, T) mix at per-item SNR using VAD-masked powers (over the true
    item extents when ``lengths`` is given).  Returns (noisy, scaled_noise)."""
    sm = detect_non_silence_mask(speech, lengths=lengths)
    nm = detect_non_silence_mask(noise, lengths=lengths)
    p_s = jnp.sum(speech**2 * sm, axis=-1) / jnp.maximum(jnp.sum(sm, axis=-1), 1)
    p_n = jnp.sum(noise**2 * nm, axis=-1) / jnp.maximum(jnp.sum(nm, axis=-1), 1)
    scale = 10 ** (-snr_db / 20) * jnp.sqrt(p_s) / jnp.sqrt(jnp.maximum(p_n, 1e-10))
    scaled = scale[:, None] * noise
    return speech + scaled, scaled


def early_rir_mask(rir: jnp.ndarray, fs: int, early_sec: float = 0.05,
                   level_ratio: float = 0.1) -> jnp.ndarray:
    """Mask keeping 50 ms after the direct-path onset (rir_utils semantics)."""
    L = rir.shape[-1]
    abs_h = jnp.abs(rir)
    peak = jnp.max(abs_h, axis=-1, keepdims=True)
    over = abs_h > level_ratio * peak
    start = jnp.argmax(over, axis=-1)  # first sample above threshold
    stop = start + int(early_sec * fs)
    pos = jnp.arange(L)
    return (pos[None, :] < stop[:, None]).astype(rir.dtype)


def quantile_clip(
    x: jnp.ndarray, min_q: jnp.ndarray, max_q: jnp.ndarray, lengths=None
):
    """Per-item quantile clipping (renderer clipping augmentation).

    With ``lengths`` (B,) the quantiles are computed over each item's true
    extent only — bucket zero-padding would otherwise pull both quantiles
    toward 0 and clip far harder than the host renderer for the same recipe
    (clipped values outside the valid extent are restored to the padding)."""
    if lengths is None:
        def one(xi, lo_q, hi_q):
            lo = jnp.quantile(xi, lo_q)
            hi = jnp.quantile(xi, hi_q)
            return jnp.clip(xi, lo, hi)

        return jax.vmap(one)(x, min_q, max_q)

    T = x.shape[-1]
    pos = jnp.arange(T)

    def one(xi, lo_q, hi_q, n):
        valid = pos < n
        xv = jnp.where(valid, xi, jnp.nan)
        lo = jnp.nanquantile(xv, lo_q)
        hi = jnp.nanquantile(xv, hi_q)
        return jnp.where(valid, jnp.clip(xi, lo, hi), xi)

    return jax.vmap(one)(x, min_q, max_q, jnp.asarray(lengths))


def bandwidth_mask_apply(x: jnp.ndarray, bw_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-item brickwall low-pass from a (B, T//2+1) prefix-of-ones mask.

    CONTRACT: ``bw_mask`` must be a prefix-of-ones mask — ``1`` on bins
    ``[0, cut)`` and ``0`` above, i.e. non-increasing along the last axis.
    At non-pow2 T the mask is reconstructed on the pow2 grid from
    ``sum(bw_mask)`` alone, so a band-stop or soft-rolloff mask would be
    silently misapplied there; tests/test_jax_dsp.py pins the contract
    (collate_device_render only ever builds prefix masks).

    At non-power-of-two bucket lengths (e.g. 2 s @ 48 kHz -> T=96000) the
    direct ``rfft(x, T)`` lowers to Bluestein on TPU — two pow2 transforms
    of >=2T plus chirp multiplies, per evaluation, and the sampled
    ``aug_order`` path evaluates the op three times per batch.  Instead the
    transform runs on the next power-of-two grid (zero-padded, truncated
    back to T), with the mask rebuilt on that grid from its cutoff-bin
    count (exact for the prefix masks collate_device_render builds; an
    all-ones mask stays a bit-exact identity).  Zero-padding also turns the
    circular frequency-sampling filter into (time-aliased) linear
    convolution — closer to the host renderer's actual resample-based
    bandwidth limitation (simulation/dsp.py) than the circular variant."""
    T = x.shape[-1]
    if T & (T - 1) == 0:
        return jnp.fft.irfft(jnp.fft.rfft(x, T) * bw_mask, T)
    nfft = 1 << int(np.ceil(np.log2(T)))
    cut = jnp.sum(bw_mask, -1, keepdims=True)          # cutoff bin count (T grid)
    j = jnp.arange(nfft // 2 + 1, dtype=jnp.float32)[None, :]
    mask_n = (j * (T / nfft) < cut).astype(x.dtype)
    return jnp.fft.irfft(jnp.fft.rfft(x, nfft) * mask_n, nfft)[..., :T]


def is_prefix_mask(mask) -> bool:
    """True iff every row of ``mask`` is a prefix-of-ones (non-increasing)
     1/0 mask — the bandwidth_mask_apply contract.  Host-side helper for
    tests and debug checks (cannot run on traced values inside jit)."""
    m = np.asarray(mask)
    return bool(
        np.all((m == 0.0) | (m == 1.0)) and np.all(np.diff(m, axis=-1) <= 0)
    )


def apply_packet_loss(x: jnp.ndarray, packet_mask: jnp.ndarray) -> jnp.ndarray:
    """Zero packets: packet_mask (B, n_packets) 1=keep; 20 ms packets."""
    B, T = x.shape
    n_packets = packet_mask.shape[-1]
    pk = T // n_packets
    mask = jnp.repeat(packet_mask, pk, axis=-1)
    mask = jnp.pad(mask, ((0, 0), (0, T - mask.shape[-1])), constant_values=1.0)
    return x * mask


@functools.lru_cache(maxsize=64)
def _lowpass_taps(fs: int, fs_new: int, numtaps: int = 257):
    cutoff = (fs_new / 2) / (fs / 2)
    return scipy.signal.firwin(numtaps, cutoff * 0.95, window=("kaiser", 9.0)).astype(
        np.float32
    )


def bandwidth_lowpass(x: jnp.ndarray, fs: int, fs_new: int) -> jnp.ndarray:
    """Anti-alias low-pass at the target Nyquist (on-device bandwidth
    limitation; see module docstring for the deviation note)."""
    if fs_new >= fs:
        return x
    taps = jnp.asarray(_lowpass_taps(fs, fs_new))
    pad = len(np.asarray(taps)) // 2
    y = fft_convolve(jnp.pad(x, ((0, 0), (0, pad))), taps[None, :])
    return y[..., pad : pad + x.shape[-1]]


@functools.lru_cache(maxsize=16)
def _hp_taps(fs: int):
    from urgent2026_challenge_track1_tpu.simulation.dsp import _high_pass_taps

    return _high_pass_taps(fs).astype(np.float32)


def high_pass(x: jnp.ndarray, fs: int) -> jnp.ndarray:
    """Zero-phase 70 Hz high-pass (filtfilt = forward + time-reversed pass;
    the causal delay of the forward pass cancels against the reversed pass)."""
    taps = jnp.asarray(_hp_taps(fs))[None, :]
    pad = taps.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    T = xp.shape[-1]
    y = fft_convolve(jnp.pad(xp, ((0, 0), (0, pad))), taps)[..., :T]
    y = fft_convolve(jnp.pad(jnp.flip(y, -1), ((0, 0), (0, pad))), taps)[..., :T]
    y = jnp.flip(y, -1)
    return y[..., pad : pad + x.shape[-1]]


def render_batch(
    speech: jnp.ndarray,     # (B, T) clean sources (padded bucket)
    noise: jnp.ndarray,      # (B, T) length-fitted noise
    rir: jnp.ndarray,        # (B, L) RIRs (identity impulse when no reverb)
    snr_db: jnp.ndarray,     # (B,)
    use_rir: jnp.ndarray,    # (B,) 1.0 where reverb applies
    clip_lo: jnp.ndarray,    # (B,) min quantile (0.0 disables with hi=1.0)
    clip_hi: jnp.ndarray,    # (B,)
    packet_mask: jnp.ndarray,  # (B, n_packets) 1=keep
    bw_mask: jnp.ndarray,    # (B, F_rfft) precomputed low-pass masks (1=pass)
    fs: int,
    highpass: bool = True,
    lengths=None,            # (B,) true item lengths (for masked quantiles)
    aug_order=None,          # (B, 3) per-item op order: 0=bw, 1=clip, 2=pl
):
    """One jitted program augmenting a whole (fs, T) bucket on device.

    Returns (clean_target, noisy) with joint 0.9 peak normalization
    (renderer :575-589).  Frequency-domain bandwidth masks allow per-item
    target rates in one batch.

    ``aug_order`` applies the three augmentations in each item's SAMPLED
    chain order (the host renderer's semantics,
    simulate_data_from_param.py:529-570): at each of 3 steps all three ops
    are evaluated batched and a per-item gather keeps the one that step
    selects — 9 cheap op evaluations instead of a 6-branch switch.  Ops
    absent from an item's recipe have identity parameters, so any
    permutation containing them is harmless.  ``None`` keeps the canonical
    bandwidth -> clipping -> packet-loss order.
    """
    if highpass:
        speech = high_pass(speech, fs)
    # reverb: full RIR for the noisy path, early RIR for the target
    full = fft_convolve(speech, rir)
    early = fft_convolve(speech, rir * early_rir_mask(rir, fs))
    u = use_rir[:, None]
    noisy = u * full + (1 - u) * speech
    target = u * early + (1 - u) * speech
    noisy, scaled_noise = mix_at_snr(noisy, noise, snr_db, lengths=lengths)
    T = speech.shape[-1]
    B = speech.shape[0]

    def op_bw(x):
        # bandwidth limitation via per-item rfft masks
        return bandwidth_mask_apply(x, bw_mask)

    def op_clip(x):
        return quantile_clip(x, clip_lo, clip_hi, lengths=lengths)

    def op_pl(x):
        return apply_packet_loss(x, packet_mask)

    if aug_order is None:
        noisy = op_pl(op_clip(op_bw(noisy)))
    else:
        rows = jnp.arange(B)
        for k in range(3):
            cands = jnp.stack([op_bw(noisy), op_clip(noisy), op_pl(noisy)])
            noisy = cands[aug_order[:, k], rows]
    peak = jnp.maximum(
        jnp.max(jnp.abs(noisy), -1),
        jnp.maximum(jnp.max(jnp.abs(target), -1), jnp.max(jnp.abs(scaled_noise), -1)),
    )
    scale = 0.9 / jnp.maximum(peak, 1e-6)
    return target * scale[:, None], noisy * scale[:, None]
