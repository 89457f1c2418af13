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

__all__ = ["group_norm", "masked_group_norm", "cumulative_group_norm"]

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


def cumulative_group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    axes: Sequence[int],
    eps: float = EPS,
    mask: jnp.ndarray | None = None,
    state: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    return_state: bool = False,
):
    """Causal GroupNorm: statistics at frame t use frames <= t only.

    The streaming-deployable counterpart of ``group_norm``: ``x`` is
    (B, T, ...) with time on axis 1, ``axes`` are the NON-time axes the
    single-group statistics span within each frame (time joins them
    cumulatively).  The analog of espnet's cLN (cumulative LayerNorm) used by
    causal separators — the reference's GN-over-full-T is non-causal even
    with ``causal=True`` LSTMs, so a streamable model swaps in this norm.

    ``mask`` (broadcastable to x): within-frame channel weighting (e.g. the
    band-split padded-slot mask); masked entries contribute nothing to the
    statistics and the output is zeroed there.

    ``state``: carried ``(count, s1, s2)`` running sums from previous chunks,
    each shaped like the per-frame statistics with a time axis of 1 (what the
    previous call returned).  Because contributions accumulate strictly
    forward, a chunked sequence of calls reproduces the full-sequence result
    — this is what makes the causal model streamable with bounded state.

    Returns ``y`` (or ``(y, (count, s1, s2))`` when ``state`` is given or
    ``return_state`` is set).
    """
    axes = tuple(axes)
    if 1 in axes or 0 in axes:
        raise ValueError("axes must not include the batch/time axes (0, 1)")
    if mask is None:
        w = jnp.ones_like(x)
    else:
        w = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
    f1 = jnp.sum(x * w, axis=axes, keepdims=True)          # (B, T, stat...)
    f2 = jnp.sum(jnp.square(x) * w, axis=axes, keepdims=True)
    fc = jnp.sum(w, axis=axes, keepdims=True)
    s1 = jnp.cumsum(f1, axis=1)
    s2 = jnp.cumsum(f2, axis=1)
    count = jnp.cumsum(fc, axis=1)
    if state is not None:
        c0, p1, p2 = state
        count = count + c0
        s1 = s1 + p1
        s2 = s2 + p2
    denom = jnp.maximum(count, 1.0)
    mean = s1 / denom
    # E[x^2] - mean^2 (the carryable form); clamp the cancellation residue
    var = jnp.maximum(s2 / denom - jnp.square(mean), 0.0)
    y = (x - mean) / jnp.sqrt(var + eps) * scale + bias
    if mask is not None:
        y = y * w
    if state is not None or return_state:
        new_state = (count[:, -1:], s1[:, -1:], s2[:, -1:])
        return y, new_state
    return y
