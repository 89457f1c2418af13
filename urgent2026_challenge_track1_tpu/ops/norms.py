"""Normalization primitives matching espnet's choose_norm/choose_norm1d "GN".

The reference uses ``nn.GroupNorm(1, C, eps=1e-8)`` (espnet
``espnet2/enh/layers/bsrnn.py`` choose_norm / choose_norm1d with
norm_type="GN", imported at ``/root/reference/baseline_code/models/
bsrnn_flowse.py:9``): a single-group GroupNorm that normalizes each example
over the channel axis AND all spatial axes jointly, with per-channel affine.

Here norms are pure functions over explicit axes, with an optional mask for
the band-stacked padded layout used by the BSRNN band split (padded channel
slots must not contribute to the statistics of other bands).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = ["group_norm", "masked_group_norm"]

EPS = 1e-8  # espnet choose_norm default


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    axes: Sequence[int],
    eps: float = EPS,
) -> jnp.ndarray:
    """Single-group GroupNorm: normalize over ``axes`` jointly, affine last.

    ``scale``/``bias`` must broadcast against ``x`` (e.g. shape (C, 1, 1) for
    an input (B, C, T, K) with axes=(1, 2, 3), matching nn.GroupNorm(1, C)).
    """
    mean = jnp.mean(x, axis=tuple(axes), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=tuple(axes), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias


def masked_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    axes: Sequence[int],
    eps: float = EPS,
) -> jnp.ndarray:
    """GroupNorm over ``axes`` where only ``mask``-selected entries count.

    ``mask`` broadcasts against x (1.0 = valid, 0.0 = padding).  Statistics are
    computed over valid entries only; output is zeroed at padded positions so
    downstream padded matmul slots stay exact.
    """
    mask = mask.astype(x.dtype)
    denom = jnp.sum(mask * jnp.ones_like(x), axis=tuple(axes), keepdims=True)
    # an all-masked row (zero-length padding item) must yield zeros, not NaN:
    # NaN*0 is still NaN, so clamp the denominator rather than rely on the
    # final * mask (callers pad batches with empty rows, e.g. serving filler)
    denom = jnp.maximum(denom, 1.0)
    mean = jnp.sum(x * mask, axis=tuple(axes), keepdims=True) / denom
    var = jnp.sum(jnp.square(x - mean) * mask, axis=tuple(axes), keepdims=True) / denom
    return ((x - mean) / jnp.sqrt(var + eps) * scale + bias) * mask
