"""Training losses: multi-resolution L1 spectral loss and SI-SNR.

The reference imports both from espnet 202412
(``/root/reference/baseline_code/d_model.py:9,24-25``):

* ``MultiResL1SpecLoss(window_sz=[256,512,768,1024], eps=1e-6,
  normalize_variance=True, time_domain_weight=0.5)`` — per-sample loss
  (espnet2/enh/loss/criterions/time_domain.py):
    1. optionally variance-normalize target and estimate by their per-utterance
       std over time (torch.std: Bessel-corrected, ddof=1);
    2. scale-align the estimate with the least-squares scalar
       a = <est, tgt> / (<est, est> + eps);
    3. time-domain term: mean_t |a*est - tgt|;
    4. spectral term: for each window w (hann, n_fft=win=w, hop=w//2,
       center=True) mean_{t,f} | |STFT(a*est)| - |STFT(tgt)| | with
       magnitude sqrt(re^2 + im^2 + eps_mag);
    5. loss = w_td * time + (1 - w_td) * mean_w spectral.
* ``SISNRLoss()`` — negative scale-invariant SNR in dB with zero-mean
  pre-processing (used as a monitored metric, ``d_model.py:79-87``).

Both return shape (B,); callers ``.mean()`` like the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from urgent2026_challenge_track1_tpu.dsp import stft as dsp

__all__ = ["multi_res_l1_spec_loss", "si_snr_loss", "si_snr"]


def multi_res_l1_spec_loss(
    target: jnp.ndarray,
    estimate: jnp.ndarray,
    window_sz: Sequence[int] = (256, 512, 768, 1024),
    eps: float = 1.0e-6,
    time_domain_weight: float = 0.5,
    normalize_variance: bool = True,
    eps_mag: float = 1.0e-6,
) -> jnp.ndarray:
    """Multi-resolution L1 spectral + time L1 loss.  (B, T) -> (B,)."""
    target = target.astype(jnp.float32)
    estimate = estimate.astype(jnp.float32)
    if normalize_variance:
        target = target / jnp.std(target, axis=-1, keepdims=True, ddof=1)
        estimate = estimate / jnp.std(estimate, axis=-1, keepdims=True, ddof=1)
    scale = jnp.sum(estimate * target, axis=-1, keepdims=True) / (
        jnp.sum(estimate * estimate, axis=-1, keepdims=True) + eps
    )
    est = estimate * scale
    time_loss = jnp.mean(jnp.abs(est - target), axis=-1)
    if not window_sz:
        return time_loss
    spec_loss = jnp.zeros_like(time_loss)
    for w in window_sz:
        st = dsp.stft(target, w, w // 2)
        se = dsp.stft(est, w, w // 2)
        mt = jnp.sqrt(jnp.square(st.real) + jnp.square(st.imag) + eps_mag)
        me = jnp.sqrt(jnp.square(se.real) + jnp.square(se.imag) + eps_mag)
        spec_loss = spec_loss + jnp.mean(jnp.abs(me - mt), axis=(-2, -1))
    return time_domain_weight * time_loss + (1.0 - time_domain_weight) * (
        spec_loss / len(window_sz)
    )


def si_snr(
    ref: jnp.ndarray, est: jnp.ndarray, zero_mean: bool = True, eps: float = 1.0e-8
) -> jnp.ndarray:
    """Scale-invariant SNR in dB.  (B, T) x (B, T) -> (B,)."""
    ref = ref.astype(jnp.float32)
    est = est.astype(jnp.float32)
    if zero_mean:
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
        est = est - jnp.mean(est, axis=-1, keepdims=True)
    alpha = jnp.sum(est * ref, axis=-1, keepdims=True) / (
        jnp.sum(ref * ref, axis=-1, keepdims=True) + eps
    )
    s_target = alpha * ref
    e_noise = est - s_target
    ratio = jnp.sum(s_target * s_target, axis=-1) / (
        jnp.sum(e_noise * e_noise, axis=-1) + eps
    )
    return 10.0 * jnp.log10(ratio + eps)


def si_snr_loss(ref: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """espnet SISNRLoss semantics: the NEGATIVE SI-SNR (a loss), shape (B,)."""
    return -si_snr(ref, est)
