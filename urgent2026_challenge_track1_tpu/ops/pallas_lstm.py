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

__all__ = [
    "lstm_scan_pallas",
    "bilstm_pallas",
    "lstm_pallas_train",
    "bilstm_pallas_train",
    "lstm_dir_pallas",
    "lstm_pallas_train_revmasked",
    "lstm_dir_revmasked",
]


def _vmem_params(interpret: bool) -> dict:
    """Raise the default 16 MB scoped-VMEM cap for the resident-weight
    kernels (flowse H=768 needs ~19 MB with double buffering); no-op in
    interpret mode (the CPU interpreter rejects TPU compiler params)."""
    if interpret:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    }



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
            **_vmem_params(interpret),
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
        **_vmem_params(interpret),
    )(xs, w_hh_t.astype(dtype))
    return jnp.swapaxes(out, 0, 1)


# ---------------------------------------------------------------------------
# Fused-input bidirectional kernel: streams the RAW inputs (N wide) and does
# BOTH matmuls (x@W_ih + h@W_hh) per step with all four weight blocks
# resident in VMEM.  vs. the hoisted-projection kernel this cuts the HBM
# stream per step from 4H to N floats per row (8x for the flow model), which
# is the binding resource at batch >= 4 — MXU utilisation is low either way.
# ---------------------------------------------------------------------------


def _fusedin_step(x_ref, wi_ref, wh_ref, b_ref, out_ref, h_s, c_s):
    gates = (
        jnp.dot(x_ref[0], wi_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_s[:].astype(x_ref.dtype), wh_ref[:],
                  preferred_element_type=jnp.float32)
        + b_ref[0].astype(jnp.float32)
    )
    H = h_s.shape[-1]
    i_g = jax.nn.sigmoid(gates[:, :H])
    f_g = jax.nn.sigmoid(gates[:, H : 2 * H])
    g_g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o_g = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f_g * c_s[:] + i_g * g_g
    h = o_g * jnp.tanh(c)
    c_s[:] = c
    h_s[:] = h
    out_ref[0] = h.astype(out_ref.dtype)


def _fusedin_bidir_kernel(xf_ref, xb_ref, wif_ref, wib_ref, whf_ref, whb_ref,
                          bf_ref, bb_ref, outf_ref, outb_ref, hf, cf, hb, cb):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for s in (hf, cf, hb, cb):
            s[:] = jnp.zeros_like(s)

    _fusedin_step(xf_ref, wif_ref, whf_ref, bf_ref, outf_ref, hf, cf)
    _fusedin_step(xb_ref, wib_ref, whb_ref, bb_ref, outb_ref, hb, cb)


def _fusedin_bidir_kernel_blocked(xf_ref, xb_ref, wif_ref, wib_ref, whf_ref,
                                  whb_ref, bf_ref, bb_ref, outf_ref, outb_ref,
                                  hf, cf, hb, cb):
    @pl.when(pl.program_id(1) == 0)
    def _():
        for s in (hf, cf, hb, cb):
            s[:] = jnp.zeros_like(s)

    _fusedin_step(xf_ref, wif_ref, whf_ref, bf_ref, outf_ref, hf, cf)
    _fusedin_step(xb_ref, wib_ref, whb_ref, bb_ref, outb_ref, hb, cb)


def _fusedin_forward(x, w_ih_f, w_ih_b, w_hh_f, w_hh_b, b_f, b_b, b_block,
                     interpret):
    """x (B, T, N) raw input; w_ih_* (N, 4H); w_hh_* (H, 4H); b_* (1, 4H).
    Returns (out_f, out_b) time-major (T, B, H)."""
    B, T, N = x.shape
    fourH = w_ih_f.shape[1]
    H = fourH // 4
    dtype = x.dtype
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, N)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, H), dtype),
        jax.ShapeDtypeStruct((T, B, H), dtype),
    )
    params_kw = _vmem_params(interpret)
    weights = (
        w_ih_f.astype(dtype), w_ih_b.astype(dtype),
        w_hh_f.astype(dtype), w_hh_b.astype(dtype),
        b_f.astype(dtype), b_b.astype(dtype),
    )
    if b_block <= 0 or b_block >= B:
        fidx = lambda i: (i, 0, 0)
        ridx = lambda i: (T - 1 - i, 0, 0)
        const = lambda i: (0, 0)
        return pl.pallas_call(
            _fusedin_bidir_kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, N), fidx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, N), ridx, memory_space=pltpu.VMEM),
                pl.BlockSpec((N, fourH), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((N, fourH), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fourH), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fourH), const, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, B, H), fidx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), ridx, memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(4)],
            interpret=interpret,
            **params_kw,
        )(xs, xs, *weights)
    assert B % b_block == 0, (B, b_block)
    nb = B // b_block
    fidx = lambda b, t: (t, b, 0)
    ridx = lambda b, t: (T - 1 - t, b, 0)
    const = lambda b, t: (0, 0)
    return pl.pallas_call(
        _fusedin_bidir_kernel_blocked,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, b_block, N), fidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, N), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, fourH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, fourH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourH), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_block, H), fidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, H), ridx, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((b_block, H), jnp.float32) for _ in range(4)],
        interpret=interpret,
        **params_kw,
    )(xs, xs, *weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def lstm_pallas_bidir_fusedin(x, w_ih_f, w_ih_b, w_hh_f, w_hh_b, b_f, b_b,
                              b_block=0, interpret=False):
    """Bidirectional LSTM streaming raw inputs; returns (B, T, 2H).
    Differentiable: the VJP hoists the input projection into XLA and reuses
    the residual-storing per-direction kernels, so training numerics match
    lstm_pallas_train exactly."""
    out_f, out_b = _fusedin_forward(
        x, w_ih_f, w_ih_b, w_hh_f, w_hh_b, b_f, b_b, b_block, interpret
    )
    return jnp.concatenate(
        [jnp.swapaxes(out_f, 0, 1), jnp.swapaxes(out_b, 0, 1)], axis=-1
    )


# Experiment toggle (scripts/bench_streamin_ab.py): when True, the training
# forward streams the raw input into the residual-storing kernels (in-kernel
# x@W_ih, no materialized (B, T, 4H) projection); the backward is unchanged.
STREAM_INPUT_TRAIN = False

# Experiment toggle (scripts/bench_band_fused_ab.py): when True, the training
# forward/backward of a differentiated bilstm_pallas (in practice: the BAND
# recurrence — the time path routes through bilstm_masked) run both
# directions in ONE Pallas call each (_train_forward2/_lstm_train_bwd2)
# instead of one call per direction.  Read at trace time by both VJP rules,
# so flipping it does NOT affect already-compiled jitted functions — set it
# before the first trace (the A/B script re-jits per arm for this reason).
FUSED_BIDIR_TRAIN = False


def _fusedin_fwd(x, w_ih_f, w_ih_b, w_hh_f, w_hh_b, b_f, b_b, b_block, interpret):
    dtype = x.dtype
    if STREAM_INPUT_TRAIN:
        out_f, gates_f, c_f = _train_forward_streamin(
            x, w_ih_f, b_f, w_hh_f, False, b_block, interpret
        )
        out_b, gates_b, c_b = _train_forward_streamin(
            x, w_ih_b, b_b, w_hh_b, True, b_block, interpret
        )
        out = jnp.concatenate(
            [jnp.swapaxes(out_f, 0, 1), jnp.swapaxes(out_b, 0, 1)], axis=-1
        )
        return out, (x, (out_f, gates_f, c_f, w_hh_f), (out_b, gates_b, c_b, w_hh_b),
                     (w_ih_f, w_ih_b))
    proj_f = x @ w_ih_f.astype(dtype) + b_f.astype(dtype)
    proj_b = x @ w_ih_b.astype(dtype) + b_b.astype(dtype)
    if FUSED_BIDIR_TRAIN:
        out_f, gates_f, c_f, out_b, gates_b, c_b = _train_forward2(
            proj_f, proj_b, w_hh_f, w_hh_b, b_block, interpret
        )
    else:
        out_f, gates_f, c_f = _train_forward(proj_f, w_hh_f, False, b_block, interpret)
        out_b, gates_b, c_b = _train_forward(proj_b, w_hh_b, True, b_block, interpret)
    out = jnp.concatenate(
        [jnp.swapaxes(out_f, 0, 1), jnp.swapaxes(out_b, 0, 1)], axis=-1
    )
    return out, (x, (out_f, gates_f, c_f, w_hh_f), (out_b, gates_b, c_b, w_hh_b),
                 (w_ih_f, w_ih_b))


def _fusedin_bwd(b_block, interpret, res, g_out):
    x, res_f, res_b, (w_ih_f, w_ih_b) = res
    H = res_f[0].shape[-1]
    if FUSED_BIDIR_TRAIN and not STREAM_INPUT_TRAIN:
        dxp_f, dw_hh_f, dxp_b, dw_hh_b = _lstm_train_bwd2(
            res_f, res_b, g_out[..., :H], g_out[..., H:], b_block, interpret
        )
    else:
        dxp_f, dw_hh_f = _lstm_train_bwd(False, b_block, interpret, res_f, g_out[..., :H])
        dxp_b, dw_hh_b = _lstm_train_bwd(True, b_block, interpret, res_b, g_out[..., H:])
    # input-projection VJP in XLA (big dense matmuls)
    dx = dxp_f @ w_ih_f.T.astype(dxp_f.dtype) + dxp_b @ w_ih_b.T.astype(dxp_b.dtype)
    d_wih_f = jnp.einsum("btn,btg->ng", x, dxp_f).astype(w_ih_f.dtype)
    d_wih_b = jnp.einsum("btn,btg->ng", x, dxp_b).astype(w_ih_b.dtype)
    db_f = jnp.sum(dxp_f, axis=(0, 1))[None].astype(w_ih_f.dtype)
    db_b = jnp.sum(dxp_b, axis=(0, 1))[None].astype(w_ih_b.dtype)
    return dx, d_wih_f, d_wih_b, dw_hh_f, dw_hh_b, db_f, db_b


lstm_pallas_bidir_fusedin.defvjp(_fusedin_fwd, _fusedin_bwd)


# ---------------------------------------------------------------------------
# Trainable variant: forward streams (gates, c) residuals to HBM; a reverse
# Pallas grid computes dx_proj and accumulates dW_hh in a resident VMEM block.
# Covers the reference training hot loop (models/bsrnn_flowse.py:288-307).
# ---------------------------------------------------------------------------


def _train_fwd_body(xp_ref, whh_ref, out_ref, gates_ref, c_ref, h_s, c_s, is_first):
    @pl.when(is_first)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h_s[:].astype(xp_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32,
    )
    H = h_s.shape[-1]
    i_g = jax.nn.sigmoid(gates[:, :H])
    f_g = jax.nn.sigmoid(gates[:, H : 2 * H])
    g_g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o_g = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f_g * c_s[:] + i_g * g_g
    h = o_g * jnp.tanh(c)
    c_s[:] = c
    h_s[:] = h
    out_ref[0] = h.astype(out_ref.dtype)
    gates_ref[0] = jnp.concatenate([i_g, f_g, g_g, o_g], axis=-1).astype(gates_ref.dtype)
    c_ref[0] = c.astype(c_ref.dtype)


def _train_fwd_kernel(xp_ref, whh_ref, out_ref, gates_ref, c_ref, h_s, c_s):
    _train_fwd_body(xp_ref, whh_ref, out_ref, gates_ref, c_ref, h_s, c_s,
                    pl.program_id(0) == 0)


def _train_fwd_kernel_blocked(xp_ref, whh_ref, out_ref, gates_ref, c_ref, h_s, c_s):
    _train_fwd_body(xp_ref, whh_ref, out_ref, gates_ref, c_ref, h_s, c_s,
                    pl.program_id(1) == 0)


def _train_bwd_body(gates_ref, cprev_ref, hprev_ref, dout_ref, w4h_ref,
                    dxp_ref, dw_ref, dh_s, dc_s, is_first, init_dw):
    @pl.when(is_first)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    @pl.when(init_dw)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    H = dh_s.shape[-1]
    g = gates_ref[0].astype(jnp.float32)
    i_g, f_g, g_g, o_g = g[:, :H], g[:, H : 2 * H], g[:, 2 * H : 3 * H], g[:, 3 * H :]
    c_prev = cprev_ref[0].astype(jnp.float32)
    c_t = f_g * c_prev + i_g * g_g
    tc = jnp.tanh(c_t)
    dh = dout_ref[0].astype(jnp.float32) + dh_s[:]
    dc = dc_s[:] + dh * o_g * (1.0 - tc * tc)
    dgates = jnp.concatenate(
        [
            dc * g_g * i_g * (1.0 - i_g),
            dc * c_prev * f_g * (1.0 - f_g),
            dc * i_g * (1.0 - g_g * g_g),
            dh * tc * o_g * (1.0 - o_g),
        ],
        axis=-1,
    )
    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    dg_c = dgates.astype(w4h_ref.dtype)
    dh_s[:] = jnp.dot(dg_c, w4h_ref[:], preferred_element_type=jnp.float32)
    dc_s[:] = dc * f_g
    # dW_hh^T accumulation: (H, B) x (B, 4H) on the MXU, block resident in VMEM
    dw_ref[:] += jax.lax.dot_general(
        hprev_ref[0].astype(w4h_ref.dtype), dg_c,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _train_bwd_kernel(gates_ref, cprev_ref, hprev_ref, dout_ref, w4h_ref,
                      dxp_ref, dw_ref, dh_s, dc_s):
    first = pl.program_id(0) == 0
    _train_bwd_body(gates_ref, cprev_ref, hprev_ref, dout_ref, w4h_ref,
                    dxp_ref, dw_ref, dh_s, dc_s, first, first)


def _train_bwd_kernel_blocked(gates_ref, cprev_ref, hprev_ref, dout_ref, w4h_ref,
                              dxp_ref, dw_ref, dh_s, dc_s):
    first_t = pl.program_id(1) == 0
    _train_bwd_body(gates_ref, cprev_ref, hprev_ref, dout_ref, w4h_ref,
                    dxp_ref, dw_ref, dh_s, dc_s, first_t,
                    jnp.logical_and(pl.program_id(0) == 0, first_t))


def _train_fwd_streamin_body(x_ref, wi_ref, b_ref, whh_ref, out_ref, gates_ref,
                             c_ref, h_s, c_s, is_first):
    """Training forward streaming the RAW input: the input projection runs
    in-kernel (x@W_ih per step) instead of materializing (B, T, 4H) x_proj
    in HBM — the input stream narrows from 4H to N floats per row (8x for
    the disc geometry) while the residual stores stay identical."""
    @pl.when(is_first)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    gates = (
        jnp.dot(x_ref[0], wi_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_s[:].astype(x_ref.dtype), whh_ref[:],
                  preferred_element_type=jnp.float32)
        + b_ref[0].astype(jnp.float32)
    )
    H = h_s.shape[-1]
    i_g = jax.nn.sigmoid(gates[:, :H])
    f_g = jax.nn.sigmoid(gates[:, H : 2 * H])
    g_g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o_g = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f_g * c_s[:] + i_g * g_g
    h = o_g * jnp.tanh(c)
    c_s[:] = c
    h_s[:] = h
    out_ref[0] = h.astype(out_ref.dtype)
    gates_ref[0] = jnp.concatenate([i_g, f_g, g_g, o_g], axis=-1).astype(gates_ref.dtype)
    c_ref[0] = c.astype(c_ref.dtype)


def _train_fwd_streamin_kernel(x_ref, wi_ref, b_ref, whh_ref, out_ref,
                               gates_ref, c_ref, h_s, c_s):
    _train_fwd_streamin_body(x_ref, wi_ref, b_ref, whh_ref, out_ref, gates_ref,
                             c_ref, h_s, c_s, pl.program_id(0) == 0)


def _train_fwd_streamin_kernel_blocked(x_ref, wi_ref, b_ref, whh_ref, out_ref,
                                       gates_ref, c_ref, h_s, c_s):
    _train_fwd_streamin_body(x_ref, wi_ref, b_ref, whh_ref, out_ref, gates_ref,
                             c_ref, h_s, c_s, pl.program_id(1) == 0)


def _train_forward_streamin(x, w_ih_t, b, w_hh_t, reverse, b_block, interpret):
    """Like _train_forward but consuming raw x (B, T, N) + weights; returns
    the same residual triple (out, gates, c), time-major."""
    B, T, N = x.shape
    fourH = w_ih_t.shape[1]
    H = fourH // 4
    dtype = x.dtype
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, N)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, H), dtype),
        jax.ShapeDtypeStruct((T, B, fourH), dtype),
        jax.ShapeDtypeStruct((T, B, H), dtype),
    )
    weights = (w_ih_t.astype(dtype), b.astype(dtype), w_hh_t.astype(dtype))
    if b_block <= 0 or b_block >= B:
        def idx(i):
            return ((T - 1 - i) if reverse else i, 0, 0)

        const = lambda i: (0, 0)
        return pl.pallas_call(
            _train_fwd_streamin_kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, N), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((N, fourH), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fourH), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), const, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            **_vmem_params(interpret),
        )(xs, *weights)
    assert B % b_block == 0, (B, b_block)
    nb = B // b_block

    def idx_b(bk, t):
        return ((T - 1 - t) if reverse else t, bk, 0)

    constb = lambda bk, t: (0, 0)
    return pl.pallas_call(
        _train_fwd_streamin_kernel_blocked,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, b_block, N), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, fourH), constb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fourH), constb, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), constb, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((b_block, H), jnp.float32),
            pltpu.VMEM((b_block, H), jnp.float32),
        ],
        interpret=interpret,
        **_vmem_params(interpret),
    )(xs, *weights)


def _train_forward(x_proj, w_hh_t, reverse, b_block, interpret):
    B, T, fourH = x_proj.shape
    H = fourH // 4
    dtype = x_proj.dtype
    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, H), dtype),      # h
        jax.ShapeDtypeStruct((T, B, fourH), dtype),  # post-activation gates
        jax.ShapeDtypeStruct((T, B, H), dtype),      # c
    )
    if b_block <= 0 or b_block >= B:
        def idx(i):
            return ((T - 1 - i) if reverse else i, 0, 0)

        out, gates, c = pl.pallas_call(
            _train_fwd_kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            **_vmem_params(interpret),
        )(xs, w_hh_t.astype(dtype))
        return out, gates, c

    assert B % b_block == 0, (B, b_block)
    nb = B // b_block

    def idx_b(b, t):
        return ((T - 1 - t) if reverse else t, b, 0)

    out, gates, c = pl.pallas_call(
        _train_fwd_kernel_blocked,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((b_block, H), jnp.float32),
            pltpu.VMEM((b_block, H), jnp.float32),
        ],
        interpret=interpret,
        **_vmem_params(interpret),
    )(xs, w_hh_t.astype(dtype))
    return out, gates, c


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def lstm_pallas_train(x_proj, w_hh_t, reverse=False, b_block=0, interpret=False):
    """Differentiable Pallas LSTM scan.  Same contract as lstm_scan_pallas:
    x_proj (B, T, 4H) input projection incl. biases, w_hh_t (H, 4H)
    pre-transposed recurrent weights -> (B, T, H).

    The primal runs the lean kernel (no residual stores) — JAX only invokes
    the fwd rule (which streams gates/c to HBM) under differentiation, so
    inference pays nothing for trainability."""
    return lstm_scan_pallas(
        x_proj, w_hh_t, reverse=reverse, interpret=interpret, b_block=b_block
    )


def _lstm_train_fwd(x_proj, w_hh_t, reverse, b_block, interpret):
    out, gates, c = _train_forward(x_proj, w_hh_t, reverse, b_block, interpret)
    return jnp.swapaxes(out, 0, 1), (out, gates, c, w_hh_t)


def _lstm_train_bwd(reverse, b_block, interpret, res, g_out):
    out, gates, c, w_hh_t = res  # time-major (T, B, .) except w
    T, B, H = out.shape
    fourH = 4 * H
    dtype = out.dtype
    zrow = jnp.zeros((1, B, H), dtype)
    if reverse:
        # scan order is T-1..0: the state entering step t came from t+1
        h_prev = jnp.concatenate([out[1:], zrow], axis=0)
        c_prev = jnp.concatenate([c[1:], zrow], axis=0)
    else:
        h_prev = jnp.concatenate([zrow, out[:-1]], axis=0)
        c_prev = jnp.concatenate([zrow, c[:-1]], axis=0)
    douts = jnp.swapaxes(g_out, 0, 1).astype(dtype)  # (T, B, H)
    w4h = jnp.swapaxes(w_hh_t, 0, 1).astype(dtype)  # (4H, H)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, fourH), dtype),     # dx_proj
        jax.ShapeDtypeStruct((H, fourH), jnp.float32),  # dW_hh^T
    )
    if b_block <= 0 or b_block >= B:
        # backward walks the scan order in reverse: negate the index map
        def idx(i):
            return (i if reverse else (T - 1 - i), 0, 0)

        dxp, dw = pl.pallas_call(
            _train_bwd_kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((fourH, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
            ],
            interpret=interpret,
            **_vmem_params(interpret),
        )(gates, c_prev, h_prev, douts, w4h)
    else:
        assert B % b_block == 0, (B, b_block)
        nb = B // b_block

        def idx_b(b, t):
            return (t if reverse else (T - 1 - t), b, 0)

        dxp, dw = pl.pallas_call(
            _train_bwd_kernel_blocked,
            grid=(nb, T),
            in_specs=[
                pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((fourH, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((b_block, H), jnp.float32),
                pltpu.VMEM((b_block, H), jnp.float32),
            ],
            interpret=interpret,
            **_vmem_params(interpret),
        )(gates, c_prev, h_prev, douts, w4h)
    return jnp.swapaxes(dxp, 0, 1), dw.astype(w_hh_t.dtype)


lstm_pallas_train.defvjp(_lstm_train_fwd, _lstm_train_bwd)


# ---------------------------------------------------------------------------
# Fused both-direction TRAINING kernels (experiment, VERDICT r2 item 10a):
# one Pallas call runs the forward and the reverse direction of a
# bidirectional recurrence together — per grid step t the kernel advances
# the forward direction at time t AND the reverse direction at time T-1-t
# (separate VMEM state scratch and index maps per direction).  Halves the
# per-call fixed overhead, which matters most for the BAND recurrence
# (K≈34-step sequences).  The residual streams double per call — the
# round-2 rejection of the fully-fused variant at the TIME path measured
# exactly that pipelining cost (140 vs 104 ms/step) — so this stays behind
# FUSED_BIDIR_TRAIN for the band-path-specific same-process A/B
# (scripts/bench_band_fused_ab.py).
# ---------------------------------------------------------------------------


def _train_fwd2_kernel(xpf_ref, xpb_ref, whhf_ref, whhb_ref,
                       outf_ref, gatesf_ref, cf_ref,
                       outb_ref, gatesb_ref, cb_ref,
                       hf_s, cf_s, hb_s, cb_s):
    first = pl.program_id(0) == 0
    _train_fwd_body(xpf_ref, whhf_ref, outf_ref, gatesf_ref, cf_ref,
                    hf_s, cf_s, first)
    _train_fwd_body(xpb_ref, whhb_ref, outb_ref, gatesb_ref, cb_ref,
                    hb_s, cb_s, first)


def _train_fwd2_kernel_blocked(xpf_ref, xpb_ref, whhf_ref, whhb_ref,
                               outf_ref, gatesf_ref, cf_ref,
                               outb_ref, gatesb_ref, cb_ref,
                               hf_s, cf_s, hb_s, cb_s):
    first = pl.program_id(1) == 0
    _train_fwd_body(xpf_ref, whhf_ref, outf_ref, gatesf_ref, cf_ref,
                    hf_s, cf_s, first)
    _train_fwd_body(xpb_ref, whhb_ref, outb_ref, gatesb_ref, cb_ref,
                    hb_s, cb_s, first)


def _train_forward2(proj_f, proj_b, w_hh_f_t, w_hh_b_t, b_block, interpret):
    """Residual-storing fused bidirectional forward.  proj_* (B, T, 4H);
    returns time-major (out_f, gates_f, c_f, out_b, gates_b, c_b) with the
    reverse-direction arrays in TRUE time order (same layout as
    ``_train_forward(..., reverse=True)``), so ``_lstm_train_bwd`` /
    ``_lstm_train_bwd2`` consume them unchanged."""
    B, T, fourH = proj_f.shape
    H = fourH // 4
    dtype = proj_f.dtype
    xs_f = jnp.swapaxes(proj_f, 0, 1)
    xs_b = jnp.swapaxes(proj_b, 0, 1)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((T, B, w), dtype)
        for w in (H, fourH, H, H, fourH, H)
    )
    if b_block <= 0 or b_block >= B:
        kernel, grid = _train_fwd2_kernel, (T,)
        rows = B

        def idx_f(i):
            return (i, 0, 0)

        def idx_b(i):
            return (T - 1 - i, 0, 0)

        def idx_w(i):
            return (0, 0)
    else:
        assert B % b_block == 0, (B, b_block)
        kernel, grid = _train_fwd2_kernel_blocked, (B // b_block, T)
        rows = b_block

        def idx_f(b, t):
            return (t, b, 0)

        def idx_b(b, t):
            return (T - 1 - t, b, 0)

        def idx_w(b, t):
            return (0, 0)

    w_spec = pl.BlockSpec((H, fourH), idx_w, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, fourH), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, fourH), idx_b, memory_space=pltpu.VMEM),
            w_spec,
            w_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, rows, H), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, fourH), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, fourH), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H), idx_b, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((rows, H), jnp.float32) for _ in range(4)],
        interpret=interpret,
        **_vmem_params(interpret),
    )(xs_f, xs_b, w_hh_f_t.astype(dtype), w_hh_b_t.astype(dtype))


def _train_bwd2_kernel(gf_ref, cpf_ref, hpf_ref, dof_ref, w4hf_ref,
                       gb_ref, cpb_ref, hpb_ref, dob_ref, w4hb_ref,
                       dxpf_ref, dwf_ref, dxpb_ref, dwb_ref,
                       dhf_s, dcf_s, dhb_s, dcb_s):
    first = pl.program_id(0) == 0
    _train_bwd_body(gf_ref, cpf_ref, hpf_ref, dof_ref, w4hf_ref,
                    dxpf_ref, dwf_ref, dhf_s, dcf_s, first, first)
    _train_bwd_body(gb_ref, cpb_ref, hpb_ref, dob_ref, w4hb_ref,
                    dxpb_ref, dwb_ref, dhb_s, dcb_s, first, first)


def _train_bwd2_kernel_blocked(gf_ref, cpf_ref, hpf_ref, dof_ref, w4hf_ref,
                               gb_ref, cpb_ref, hpb_ref, dob_ref, w4hb_ref,
                               dxpf_ref, dwf_ref, dxpb_ref, dwb_ref,
                               dhf_s, dcf_s, dhb_s, dcb_s):
    first_t = pl.program_id(1) == 0
    init_dw = jnp.logical_and(pl.program_id(0) == 0, first_t)
    _train_bwd_body(gf_ref, cpf_ref, hpf_ref, dof_ref, w4hf_ref,
                    dxpf_ref, dwf_ref, dhf_s, dcf_s, first_t, init_dw)
    _train_bwd_body(gb_ref, cpb_ref, hpb_ref, dob_ref, w4hb_ref,
                    dxpb_ref, dwb_ref, dhb_s, dcb_s, first_t, init_dw)


def _shift_prev(out, c, reverse):
    """(h_prev, c_prev) entering each step, in true time order."""
    T, B, H = out.shape
    zrow = jnp.zeros((1, B, H), out.dtype)
    if reverse:
        return (jnp.concatenate([out[1:], zrow], axis=0),
                jnp.concatenate([c[1:], zrow], axis=0))
    return (jnp.concatenate([zrow, out[:-1]], axis=0),
            jnp.concatenate([zrow, c[:-1]], axis=0))


def _lstm_train_bwd2(res_f, res_b, g_out_f, g_out_b, b_block, interpret):
    """Fused both-direction backward.  res_* as stored by _train_forward2;
    g_out_* (B, T, H).  Returns (dxp_f, dw_f, dxp_b, dw_b) batch-major."""
    out_f, gates_f, c_f, w_hh_f_t = res_f
    out_b, gates_b, c_b, w_hh_b_t = res_b
    T, B, H = out_f.shape
    fourH = 4 * H
    dtype = out_f.dtype
    hp_f, cp_f = _shift_prev(out_f, c_f, False)
    hp_b, cp_b = _shift_prev(out_b, c_b, True)
    do_f = jnp.swapaxes(g_out_f, 0, 1).astype(dtype)
    do_b = jnp.swapaxes(g_out_b, 0, 1).astype(dtype)
    w4h_f = jnp.swapaxes(w_hh_f_t, 0, 1).astype(dtype)
    w4h_b = jnp.swapaxes(w_hh_b_t, 0, 1).astype(dtype)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, fourH), dtype),
        jax.ShapeDtypeStruct((H, fourH), jnp.float32),
        jax.ShapeDtypeStruct((T, B, fourH), dtype),
        jax.ShapeDtypeStruct((H, fourH), jnp.float32),
    )
    if b_block <= 0 or b_block >= B:
        kernel, grid = _train_bwd2_kernel, (T,)
        rows = B

        # fwd direction's backward walks T-1..0; reverse direction's walks 0..T-1
        def idx_f(i):
            return (T - 1 - i, 0, 0)

        def idx_b(i):
            return (i, 0, 0)

        def idx_w(i):
            return (0, 0)
    else:
        assert B % b_block == 0, (B, b_block)
        kernel, grid = _train_bwd2_kernel_blocked, (B // b_block, T)
        rows = b_block

        def idx_f(b, t):
            return (T - 1 - t, b, 0)

        def idx_b(b, t):
            return (t, b, 0)

        def idx_w(b, t):
            return (0, 0)

    def dir_specs(idx):
        return [
            pl.BlockSpec((1, rows, fourH), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((fourH, H), idx_w, memory_space=pltpu.VMEM),
        ]

    dxp_f, dw_f, dxp_b, dw_b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=dir_specs(idx_f) + dir_specs(idx_b),
        out_specs=(
            pl.BlockSpec((1, rows, fourH), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), idx_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, fourH), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), idx_w, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((rows, H), jnp.float32) for _ in range(4)],
        interpret=interpret,
        **_vmem_params(interpret),
    )(gates_f, cp_f, hp_f, do_f, w4h_f, gates_b, cp_b, hp_b, do_b, w4h_b)
    return (jnp.swapaxes(dxp_f, 0, 1), dw_f.astype(w_hh_f_t.dtype),
            jnp.swapaxes(dxp_b, 0, 1), dw_b.astype(w_hh_b_t.dtype))


# ---------------------------------------------------------------------------
# Reverse-direction kernels with IN-KERNEL length masking: the backward half
# of a length-exact bidirectional recurrence.  The grid walks the padded
# sequence back-to-front; at padded steps (t >= length[b]) the recurrent
# state is zeroed, so when the walk reaches each row's last valid frame the
# state is exactly a fresh scan's — equivalent to scanning the reversed
# VALID prefix, with NO gathers/scatters and outputs already in place
# (measured: the gather formulation cost +28 ms on the 48 kHz train step).
# Masks derive from a per-row length vector and the step index in-kernel.
# ---------------------------------------------------------------------------


def _mask_at(len_ref, t):
    # (B, 1) validity of fwd step t: 1.0 where t < length[b]
    return (t < len_ref[:, :1]).astype(jnp.float32)


def _lean_fwd_revmasked_body(xp_ref, whh_ref, len_ref, out_ref, h_s, c_s,
                             t, is_first):
    @pl.when(is_first)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h_s[:].astype(xp_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32
    )
    H = h_s.shape[-1]
    i_g = jax.nn.sigmoid(gates[:, :H])
    f_g = jax.nn.sigmoid(gates[:, H : 2 * H])
    g_g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o_g = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f_g * c_s[:] + i_g * g_g
    h = o_g * jnp.tanh(c)
    m = _mask_at(len_ref, t)
    c_s[:] = c * m
    h_s[:] = h * m
    out_ref[0] = h.astype(out_ref.dtype)


def _train_fwd_revmasked_body(xp_ref, whh_ref, len_ref, out_ref, gates_ref,
                              c_ref, h_s, c_s, t, is_first):
    @pl.when(is_first)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h_s[:].astype(xp_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32
    )
    H = h_s.shape[-1]
    i_g = jax.nn.sigmoid(gates[:, :H])
    f_g = jax.nn.sigmoid(gates[:, H : 2 * H])
    g_g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o_g = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f_g * c_s[:] + i_g * g_g
    h = o_g * jnp.tanh(c)
    m = _mask_at(len_ref, t)
    c_s[:] = c * m
    h_s[:] = h * m
    out_ref[0] = h.astype(out_ref.dtype)
    gates_ref[0] = jnp.concatenate([i_g, f_g, g_g, o_g], axis=-1).astype(gates_ref.dtype)
    c_ref[0] = c.astype(c_ref.dtype)


def _train_bwd_revmasked_body(gates_ref, cprev_ref, hprev_ref, len_ref,
                              dout_ref, w4h_ref, dxp_ref, dw_ref, dh_s, dc_s,
                              t, is_first, init_dw):
    """Backward of the masked reverse scan.  Processing order is fwd index
    t = 0..T-1; the state that ENTERED fwd step t came from fwd step t+1 and
    was masked by m_{t+1}; the state LEAVING step t was masked by m_t before
    consumption at t-1, so incoming dh_s/dc_s are multiplied by m_t here."""
    @pl.when(is_first)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    @pl.when(init_dw)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    H = dh_s.shape[-1]
    m = _mask_at(len_ref, t)
    mprev = _mask_at(len_ref, t + 1)
    g = gates_ref[0].astype(jnp.float32)
    i_g, f_g, g_g, o_g = g[:, :H], g[:, H : 2 * H], g[:, 2 * H : 3 * H], g[:, 3 * H :]
    c_prev = cprev_ref[0].astype(jnp.float32) * mprev
    c_t = f_g * c_prev + i_g * g_g
    tc = jnp.tanh(c_t)
    dh = dout_ref[0].astype(jnp.float32) + dh_s[:] * m
    dc = dc_s[:] * m + dh * o_g * (1.0 - tc * tc)
    dgates = jnp.concatenate(
        [
            dc * g_g * i_g * (1.0 - i_g),
            dc * c_prev * f_g * (1.0 - f_g),
            dc * i_g * (1.0 - g_g * g_g),
            dh * tc * o_g * (1.0 - o_g),
        ],
        axis=-1,
    )
    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    dg_c = dgates.astype(w4h_ref.dtype)
    dh_s[:] = jnp.dot(dg_c, w4h_ref[:], preferred_element_type=jnp.float32)
    dc_s[:] = dc * f_g
    dw_ref[:] += jax.lax.dot_general(
        (hprev_ref[0].astype(jnp.float32) * mprev).astype(w4h_ref.dtype), dg_c,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _lean_forward_revmasked(x_proj, w_hh_t, lengths, b_block, interpret):
    B, T, fourH = x_proj.shape
    H = fourH // 4
    dtype = x_proj.dtype
    xs = jnp.swapaxes(x_proj, 0, 1)
    lens = lengths.astype(jnp.float32).reshape(B, 1)
    if b_block <= 0 or b_block >= B:
        def kern(xp_ref, whh_ref, len_ref, out_ref, h_s, c_s):
            t = pl.num_programs(0) - 1 - pl.program_id(0)
            _lean_fwd_revmasked_body(xp_ref, whh_ref, len_ref, out_ref, h_s,
                                     c_s, t, pl.program_id(0) == 0)

        ridx = lambda i: (T - 1 - i, 0, 0)
        out = pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, fourH), ridx, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, H), ridx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(2)],
            interpret=interpret,
            **_vmem_params(interpret),
        )(xs, w_hh_t.astype(dtype), lens)
        return jnp.swapaxes(out, 0, 1)
    assert B % b_block == 0, (B, b_block)
    nb = B // b_block

    def kern_b(xp_ref, whh_ref, len_ref, out_ref, h_s, c_s):
        t = pl.num_programs(1) - 1 - pl.program_id(1)
        _lean_fwd_revmasked_body(xp_ref, whh_ref, len_ref, out_ref, h_s, c_s,
                                 t, pl.program_id(1) == 0)

    ridx_b = lambda b, t: (T - 1 - t, b, 0)
    out = pl.pallas_call(
        kern_b,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, b_block, fourH), ridx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_block, H), ridx_b, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
        scratch_shapes=[pltpu.VMEM((b_block, H), jnp.float32) for _ in range(2)],
        interpret=interpret,
        **_vmem_params(interpret),
    )(xs, w_hh_t.astype(dtype), lens)
    return jnp.swapaxes(out, 0, 1)


def _train_forward_revmasked(x_proj, w_hh_t, lengths, b_block, interpret):
    B, T, fourH = x_proj.shape
    H = fourH // 4
    dtype = x_proj.dtype
    xs = jnp.swapaxes(x_proj, 0, 1)
    lens = lengths.astype(jnp.float32).reshape(B, 1)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, H), dtype),
        jax.ShapeDtypeStruct((T, B, fourH), dtype),
        jax.ShapeDtypeStruct((T, B, H), dtype),
    )
    if b_block <= 0 or b_block >= B:
        def kern(xp_ref, whh_ref, len_ref, out_ref, gates_ref, c_ref, h_s, c_s):
            t = pl.num_programs(0) - 1 - pl.program_id(0)
            _train_fwd_revmasked_body(xp_ref, whh_ref, len_ref, out_ref,
                                      gates_ref, c_ref, h_s, c_s, t,
                                      pl.program_id(0) == 0)

        ridx = lambda i: (T - 1 - i, 0, 0)
        return pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, fourH), ridx, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, B, H), ridx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, fourH), ridx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), ridx, memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(2)],
            interpret=interpret,
            **_vmem_params(interpret),
        )(xs, w_hh_t.astype(dtype), lens)
    assert B % b_block == 0, (B, b_block)
    nb = B // b_block

    def kern_b(xp_ref, whh_ref, len_ref, out_ref, gates_ref, c_ref, h_s, c_s):
        t = pl.num_programs(1) - 1 - pl.program_id(1)
        _train_fwd_revmasked_body(xp_ref, whh_ref, len_ref, out_ref, gates_ref,
                                  c_ref, h_s, c_s, t, pl.program_id(1) == 0)

    ridx_b = lambda b, t: (T - 1 - t, b, 0)
    return pl.pallas_call(
        kern_b,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, b_block, fourH), ridx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, fourH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_block, H), ridx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, fourH), ridx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_block, H), ridx_b, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((b_block, H), jnp.float32) for _ in range(2)],
        interpret=interpret,
        **_vmem_params(interpret),
    )(xs, w_hh_t.astype(dtype), lens)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_pallas_train_revmasked(x_proj, w_hh_t, lengths, b_block=0,
                                interpret=False):
    """Length-masked REVERSE-direction recurrence.  x_proj (B, T, 4H),
    lengths (B,) -> (B, T, H): output[b, t] for t < lengths[b] equals a
    fresh reverse scan over the valid prefix (padding after it), computed
    in place with no gathers.  Differentiable (lengths get a zero
    cotangent).  The primal runs the lean kernel."""
    return _lean_forward_revmasked(x_proj, w_hh_t, lengths, b_block, interpret)


def _revmasked_fwd(x_proj, w_hh_t, lengths, b_block, interpret):
    out, gates, c = _train_forward_revmasked(
        x_proj, w_hh_t, lengths, b_block, interpret
    )
    return jnp.swapaxes(out, 0, 1), (out, gates, c, w_hh_t, lengths)


def _revmasked_bwd(b_block, interpret, res, g_out):
    out, gates, c, w_hh_t, lengths = res  # time-major (T, B, .)
    T, B, H = out.shape
    fourH = 4 * H
    dtype = out.dtype
    zrow = jnp.zeros((1, B, H), dtype)
    # scan order is T-1..0: the state entering step t came from step t+1
    h_prev = jnp.concatenate([out[1:], zrow], axis=0)
    c_prev = jnp.concatenate([c[1:], zrow], axis=0)
    douts = jnp.swapaxes(g_out, 0, 1).astype(dtype)
    w4h = jnp.swapaxes(w_hh_t, 0, 1).astype(dtype)
    lens = lengths.astype(jnp.float32).reshape(B, 1)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, fourH), dtype),
        jax.ShapeDtypeStruct((H, fourH), jnp.float32),
    )
    if b_block <= 0 or b_block >= B:
        def kern(gates_ref, cprev_ref, hprev_ref, len_ref, dout_ref, w4h_ref,
                 dxp_ref, dw_ref, dh_s, dc_s):
            t = pl.program_id(0)
            first = pl.program_id(0) == 0
            _train_bwd_revmasked_body(gates_ref, cprev_ref, hprev_ref, len_ref,
                                      dout_ref, w4h_ref, dxp_ref, dw_ref,
                                      dh_s, dc_s, t, first, first)

        idx = lambda i: (i, 0, 0)
        dxp, dw = pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((fourH, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, B, fourH), idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(2)],
            interpret=interpret,
            **_vmem_params(interpret),
        )(gates, c_prev, h_prev, lens, douts, w4h)
    else:
        assert B % b_block == 0, (B, b_block)
        nb = B // b_block

        def kern_b(gates_ref, cprev_ref, hprev_ref, len_ref, dout_ref, w4h_ref,
                   dxp_ref, dw_ref, dh_s, dc_s):
            t = pl.program_id(1)
            first_t = pl.program_id(1) == 0
            _train_bwd_revmasked_body(
                gates_ref, cprev_ref, hprev_ref, len_ref, dout_ref, w4h_ref,
                dxp_ref, dw_ref, dh_s, dc_s, t, first_t,
                jnp.logical_and(pl.program_id(0) == 0, first_t),
            )

        idx_b = lambda b, t: (t, b, 0)
        dxp, dw = pl.pallas_call(
            kern_b,
            grid=(nb, T),
            in_specs=[
                pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((b_block, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_block, H), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((fourH, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, b_block, fourH), idx_b, memory_space=pltpu.VMEM),
                pl.BlockSpec((H, fourH), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((b_block, H), jnp.float32) for _ in range(2)],
            interpret=interpret,
            **_vmem_params(interpret),
        )(gates, c_prev, h_prev, lens, douts, w4h)
    return jnp.swapaxes(dxp, 0, 1), dw.astype(w_hh_t.dtype), None


lstm_pallas_train_revmasked.defvjp(_revmasked_fwd, _revmasked_bwd)


def lstm_dir_revmasked(x_proj, w_hh_t, lengths, interpret: bool = False):
    """Padding/blocking wrapper over lstm_pallas_train_revmasked."""
    B = x_proj.shape[0]
    b_block, pad = _bilstm_blocking(B, x_proj.dtype)
    if pad:
        x_proj = jnp.pad(x_proj, ((0, pad), (0, 0), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    out = lstm_pallas_train_revmasked(x_proj, w_hh_t, lengths, b_block, interpret)
    return out[:B] if pad else out


def _bilstm_blocking(B: int, dtype):
    """Pick (b_block, batch_pad).  Large batches (the band LSTM, B = B*T) are
    grid-blocked to fit scoped VMEM; the block size is chosen to minimise
    padding waste rather than fixed at a power of two (e.g. B=804 pads to
    816 rows with 3 blocks of 272 instead of 1024 with 4 blocks of 256)."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    if B <= 512:
        return 0, (-B) % sublane
    # ~256-288-row blocks rounded to 16 sublanes, sized to minimise padding:
    # same-process A/B at the flagship geometry (B=544, T=401, H=384) gives
    # 9.0 ms for 2x272 vs 12.3 ms for 3x256 (pad to 768) vs 15.9 ms for
    # 2x512 — padding waste dominates block-size effects.
    nb = -(-B // 288)
    b_block = -(-(-(-B // nb)) // 16) * 16
    return b_block, nb * b_block - B


def bilstm_pallas(params, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Differentiable bidirectional LSTM on the Pallas kernels.

    Inference: the fused-input kernel streams the raw (B, T, N) input once
    and performs both per-step matmuls (x@W_ih + h@W_hh, both directions)
    with the weights resident in VMEM — the HBM stream per step shrinks
    from 2x4H to 2xN floats per row.  Under differentiation the custom VJP
    hoists the input projection into XLA and uses the residual-storing
    per-direction kernels (training numerics identical to the scan path).
    Pads the batch to the dtype's sublane multiple; large batches (the band
    LSTM) are grid-blocked so each step fits scoped VMEM."""
    B, T, _ = x.shape
    dtype = x.dtype
    b_block, pad = _bilstm_blocking(B, dtype)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    out = lstm_pallas_bidir_fusedin(
        x,
        params["w_ih"].T.astype(dtype),
        params["w_ih_reverse"].T.astype(dtype),
        params["w_hh"].T.astype(dtype),
        params["w_hh_reverse"].T.astype(dtype),
        (params["b_ih"] + params["b_hh"])[None],
        (params["b_ih_reverse"] + params["b_hh_reverse"])[None],
        b_block,
        interpret,
    )
    return out[:B] if pad else out


# kept as an alias: callers/tests that want to be explicit about trainability
bilstm_pallas_train = bilstm_pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_dir_pallas_streamin(x, w_ih_t, b, w_hh_t, b_block=0, interpret=False):
    """One forward-direction recurrence streaming the RAW input (in-kernel
    x@W_ih; STREAM_INPUT_TRAIN experiment).  x (B, T, N), w_ih_t (N, 4H),
    b (1, 4H), w_hh_t (H, 4H) -> (B, T, H).  Differentiable."""
    out, _, _ = _train_forward_streamin(x, w_ih_t, b, w_hh_t, False, b_block,
                                        interpret)
    return jnp.swapaxes(out, 0, 1)


def _dir_streamin_fwd(x, w_ih_t, b, w_hh_t, b_block, interpret):
    out, gates, c = _train_forward_streamin(x, w_ih_t, b, w_hh_t, False,
                                            b_block, interpret)
    return jnp.swapaxes(out, 0, 1), (x, out, gates, c, w_hh_t, w_ih_t)


def _dir_streamin_bwd(b_block, interpret, res, g_out):
    x, out, gates, c, w_hh_t, w_ih_t = res
    dxp, dw_hh = _lstm_train_bwd(False, b_block, interpret,
                                 (out, gates, c, w_hh_t), g_out)
    dx = dxp @ w_ih_t.T.astype(dxp.dtype)
    d_wih = jnp.einsum("btn,btg->ng", x, dxp).astype(w_ih_t.dtype)
    db = jnp.sum(dxp, axis=(0, 1))[None].astype(w_ih_t.dtype)
    return dx, d_wih, db, dw_hh


lstm_dir_pallas_streamin.defvjp(_dir_streamin_fwd, _dir_streamin_bwd)


def lstm_dir_streamin(x, w_ih, b_vec, w_hh, interpret: bool = False):
    """Padding/blocking wrapper over lstm_dir_pallas_streamin.
    x (B, T, N) raw input; w_ih (4H, N), b_vec (4H,), w_hh (4H, H) in the
    torch parameter layout -> (B, T, H)."""
    B = x.shape[0]
    dtype = x.dtype
    b_block, pad = _bilstm_blocking(B, dtype)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    out = lstm_dir_pallas_streamin(
        x, w_ih.T.astype(dtype), b_vec[None].astype(dtype),
        w_hh.T.astype(dtype), b_block, interpret,
    )
    return out[:B] if pad else out


def lstm_dir_pallas(
    x_proj: jnp.ndarray, w_hh_t: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """One FORWARD-direction recurrence on the custom-VJP training kernel.

    x_proj: (B, T, 4H) input projection incl. biases; w_hh_t: (H, 4H).
    Used by ops/lstm.bilstm_masked, whose per-row length-reversal makes the
    two directions consume different input layouts (so the fused
    bidirectional kernel does not apply).  Handles the same batch padding /
    grid blocking as bilstm_pallas.
    """
    B = x_proj.shape[0]
    b_block, pad = _bilstm_blocking(B, x_proj.dtype)
    if pad:
        x_proj = jnp.pad(x_proj, ((0, pad), (0, 0), (0, 0)))
    out = lstm_pallas_train(x_proj, w_hh_t, False, b_block, interpret)
    return out[:B] if pad else out
