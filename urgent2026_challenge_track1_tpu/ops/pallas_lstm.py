"""Pallas TPU kernel for the LSTM recurrence (the BSRNN hot loop).

The `lax.scan` recurrence dispatches one small matmul per timestep through
XLA's while-loop machinery.  This kernel instead runs the whole sequence as
a Pallas grid over T with the (h, c) state held in VMEM scratch across grid
steps and the recurrent weights resident in VMEM:

  grid = (T,); per step the kernel reads one (B, 4H) input-projection slice
  (streamed HBM->VMEM by the pipeline), performs the (B, H) x (H, 4H) gate
  matmul on the MXU with f32 accumulation, applies the gate nonlinearities
  on the VPU, updates scratch, and writes the (B, H) output slice.

Constraints: B should be a multiple of 8 (f32) / 16 (bf16) sublanes and H a
multiple of 128 lanes for clean tiling; callers pad the batch.  Forward and
reverse directions reuse the same kernel via the BlockSpec index map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_scan_pallas", "bilstm_pallas"]


def _body(xp_ref, whh_ref, out_ref, h_ref, c_ref, is_first):
    @pl.when(is_first)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    gates = xp_ref[0] + jnp.dot(
        h_ref[:].astype(xp_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32,
    )
    H = h_ref.shape[-1]
    i_g = jax.nn.sigmoid(gates[:, :H])
    f_g = jax.nn.sigmoid(gates[:, H : 2 * H])
    g_g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o_g = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f_g * c_ref[:] + i_g * g_g
    h = o_g * jnp.tanh(c)
    c_ref[:] = c
    h_ref[:] = h
    out_ref[0] = h.astype(out_ref.dtype)


def _kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref):
    _body(xp_ref, whh_ref, out_ref, h_ref, c_ref, pl.program_id(0) == 0)


def _kernel_blocked(xp_ref, whh_ref, out_ref, h_ref, c_ref):
    # grid (B-blocks, T): reset state at the first timestep of each block
    _body(xp_ref, whh_ref, out_ref, h_ref, c_ref, pl.program_id(1) == 0)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret", "b_block"))
def lstm_scan_pallas(
    x_proj: jnp.ndarray,  # (B, T, 4H): input projection incl. biases
    w_hh_t: jnp.ndarray,  # (H, 4H): pre-transposed recurrent weights
    reverse: bool = False,
    interpret: bool = False,
    b_block: int = 0,  # 0 = whole batch per step; else batch-block rows
) -> jnp.ndarray:
    B, T, fourH = x_proj.shape
    H = fourH // 4
    dtype = x_proj.dtype
    # time-major layout so each grid step reads one contiguous (B, 4H) slab
    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H)

    if b_block <= 0 or b_block >= B:
        def idx(i):
            return ((T - 1 - i) if reverse else i, 0, 0)

        out = pl.pallas_call(
            _kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
        )(xs, w_hh_t.astype(dtype))
        return jnp.swapaxes(out, 0, 1)  # (B, T, H)

    # batch-blocked variant for large B (e.g. the band LSTM, where a whole
    # (B, 4H) slab exceeds scoped VMEM): grid (B-blocks, T), T innermost so
    # the (h, c) scratch resets at t == 0 of each block
    assert B % b_block == 0, (B, b_block)
    nb = B // b_block

    def idx_b(b, t):
        return ((T - 1 - t) if reverse else t, b, 0)

    out = pl.pallas_call(
        _kernel_blocked,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((b_block, H), jnp.float32),
            pltpu.VMEM((b_block, H), jnp.float32),
        ],
        interpret=interpret,
    )(xs, w_hh_t.astype(dtype))
    return jnp.swapaxes(out, 0, 1)


def bilstm_pallas(params, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Bidirectional LSTM on the Pallas kernel (inference only — the kernel
    has no VJP).  Pads the batch to the dtype's sublane multiple; large
    batches (the band LSTM) are grid-blocked so each step fits scoped VMEM."""
    B, T, _ = x.shape
    dtype = x.dtype
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if B > 512:
        b_block = 256
        pad = (-B) % b_block
    else:
        b_block = 0
        pad = (-B) % sublane
    w_ih = jnp.concatenate([params["w_ih"], params["w_ih_reverse"]], axis=0)
    b = jnp.concatenate(
        [params["b_ih"] + params["b_hh"], params["b_ih_reverse"] + params["b_hh_reverse"]]
    )
    proj = x @ w_ih.T.astype(dtype) + b.astype(dtype)  # (B, T, 8H)
    if pad:
        proj = jnp.pad(proj, ((0, pad), (0, 0), (0, 0)))
    fourH = params["w_ih"].shape[0]
    fwd = lstm_scan_pallas(
        proj[..., :fourH], params["w_hh"].T.astype(dtype),
        reverse=False, interpret=interpret, b_block=b_block,
    )
    bwd = lstm_scan_pallas(
        proj[..., fourH:], params["w_hh_reverse"].T.astype(dtype),
        reverse=True, interpret=interpret, b_block=b_block,
    )
    out = jnp.concatenate([fwd, bwd], axis=-1)
    return out[:B] if pad else out
