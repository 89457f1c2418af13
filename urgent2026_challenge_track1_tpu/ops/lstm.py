"""LSTM as a `lax.scan` recurrence, TPU-first, torch-checkpoint compatible.

The reference's hot loop is 6 dual-path layers of `nn.LSTM` (cuDNN) over time
and band axes (`/root/reference/baseline_code/models/bsrnn_flowse.py:230-243,
288-307`).  On TPU there is no cuDNN; the idiomatic design is:

  * the input projection ``x @ W_ih^T + b`` for ALL timesteps is hoisted out of
    the recurrence into one large batched matmul (MXU-friendly, (B*T, 4H));
  * `lax.scan` carries only the (h, c) state and performs the single
    (B, H) x (H, 4H) recurrent matmul + gate nonlinearities per step;
  * bidirectionality = a second scan with ``reverse=True`` (XLA overlaps the
    two independent scans).

Parameter layout matches torch.nn.LSTM exactly so converted checkpoints drop
in: gate order (i, f, g, o), ``w_ih (4H, I)``, ``w_hh (4H, H)``, biases
``b_ih``/``b_hh`` both kept (summed once at apply time).

Numerics are verified against torch.nn.LSTM in tests/test_lstm.py.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_lstm", "lstm", "bilstm", "length_reverse", "bilstm_masked"]


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_lstm(key, input_size: int, hidden_size: int, bidirectional: bool = False):
    """torch.nn.LSTM-compatible params: U(-1/sqrt(H), 1/sqrt(H)) everywhere."""
    bound = 1.0 / float(np.sqrt(hidden_size))
    n_dir = 2 if bidirectional else 1
    keys = jax.random.split(key, 4 * n_dir)
    params = {}
    for d in range(n_dir):
        sfx = "_reverse" if d == 1 else ""
        k0, k1, k2, k3 = keys[4 * d : 4 * d + 4]
        params[f"w_ih{sfx}"] = _uniform(k0, (4 * hidden_size, input_size), bound)
        params[f"w_hh{sfx}"] = _uniform(k1, (4 * hidden_size, hidden_size), bound)
        params[f"b_ih{sfx}"] = _uniform(k2, (4 * hidden_size,), bound)
        params[f"b_hh{sfx}"] = _uniform(k3, (4 * hidden_size,), bound)
    return params


def _scan_dir(x_proj: jnp.ndarray, w_hh_t: jnp.ndarray, hidden: int, reverse: bool,
              accum_dtype=jnp.float32, initial_state=None, return_state: bool = False):
    """Scan one direction.  x_proj: (B, T, 4H) input projection incl. biases;
    w_hh_t: (H, 4H) pre-transposed recurrent weights.  ``initial_state``
    (h0, c0) continues a previous chunk's recurrence (streaming)."""
    B = x_proj.shape[0]
    dtype = x_proj.dtype
    if initial_state is None:
        h0 = jnp.zeros((B, hidden), dtype)
        c0 = jnp.zeros((B, hidden), accum_dtype)
    else:
        h0 = initial_state[0].astype(dtype)
        c0 = initial_state[1].astype(accum_dtype)

    def step(carry, xp):
        h, c = carry
        gates = (
            xp + jnp.dot(h, w_hh_t, preferred_element_type=accum_dtype)
        ).astype(accum_dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = (o * jnp.tanh(c)).astype(dtype)
        return (h, c), h

    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H): scan over leading axis
    (hT, cT), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    out = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    if return_state:
        return out, (hT, cT)
    return out


def lstm(params, x: jnp.ndarray, reverse: bool = False, suffix: str = "",
         initial_state=None, return_state: bool = False,
         use_pallas: bool = False, interpret: bool = False):
    """Unidirectional LSTM.  x: (B, T, I) -> (B, T, H).

    ``initial_state``/``return_state``: (h, c) carry for chunked streaming —
    chaining calls over consecutive chunks equals one full-sequence call.

    ``use_pallas`` routes the full-sequence forward direction through the
    custom-VJP Pallas kernel (causal training/inference on TPU); the kernels
    carry no external state, so streaming calls fall back to the scan."""
    w_ih = params[f"w_ih{suffix}"]
    b = params[f"b_ih{suffix}"] + params[f"b_hh{suffix}"]
    dtype = x.dtype
    x_proj = x @ w_ih.T.astype(dtype) + b.astype(dtype)
    if (use_pallas and not reverse and initial_state is None
            and not return_state):
        from urgent2026_challenge_track1_tpu.ops import pallas_lstm as pl

        return pl.lstm_dir_pallas(
            x_proj, params[f"w_hh{suffix}"].T.astype(dtype), interpret
        )
    hidden = w_ih.shape[0] // 4
    return _scan_dir(x_proj, params[f"w_hh{suffix}"].T.astype(dtype), hidden, reverse,
                     initial_state=initial_state, return_state=return_state)


def bilstm(params, x: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional LSTM.  x: (B, T, I) -> (B, T, 2H) (fwd ++ bwd, torch order).

    Both input projections are fused into one matmul over all timesteps; the
    two direction scans stay separate (XLA overlaps the independent loops —
    a batch-stacked single scan measured slower on TPU v5e because the
    2-way batched recurrent matmul tiles worse than two plain ones).
    """
    dtype = x.dtype
    w_ih = jnp.concatenate([params["w_ih"], params["w_ih_reverse"]], axis=0)
    b = jnp.concatenate(
        [params["b_ih"] + params["b_hh"], params["b_ih_reverse"] + params["b_hh_reverse"]]
    )
    proj = x @ w_ih.T.astype(dtype) + b.astype(dtype)  # (B, T, 8H)
    fourH = params["w_ih"].shape[0]
    hidden = fourH // 4
    fwd = _scan_dir(proj[..., :fourH], params["w_hh"].T.astype(dtype), hidden, False)
    bwd = _scan_dir(
        proj[..., fourH:], params["w_hh_reverse"].T.astype(dtype), hidden, True
    )
    return jnp.concatenate([fwd, bwd], axis=-1)


def length_reverse(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's first ``lengths[b]`` steps; padding stays in place.

    x: (B, T, ...), lengths: (B,) int.  Involutive: applying twice restores x.
    This is the packed-sequence trick that makes a bidirectional recurrence
    length-exact: the backward direction consumes the reversed VALID prefix,
    so its states at valid positions never depend on how far the batch was
    padded (torch cuDNN semantics with pack_padded_sequence).
    """
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def bilstm_masked(
    params, x: jnp.ndarray, lengths: jnp.ndarray, use_pallas: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Length-exact bidirectional LSTM.  x: (B, T, I), lengths: (B,) valid
    step counts -> (B, T, 2H); outputs at positions < lengths[b] are
    independent of T (the bucket padding).  Outputs at positions >=
    lengths[b] are UNSPECIFIED garbage — callers mask them downstream.

    Forward direction is already pad-exact (padding comes after the valid
    prefix); the backward direction runs as a FORWARD scan over the
    length-reversed input, then its outputs are un-reversed.  With
    ``use_pallas`` both directions run on the custom-VJP Pallas training
    kernels (the fused bidirectional inference kernel assumes a shared
    input layout, which per-row reversal breaks).
    """
    dtype = x.dtype
    if use_pallas:
        from urgent2026_challenge_track1_tpu.ops import pallas_lstm as pl

        if pl.STREAM_INPUT_TRAIN:
            # stream the RAW input into the kernels (and length-reverse the
            # N-wide input instead of the 4H-wide projection)
            x_rev = length_reverse(x, lengths)
            fwd = pl.lstm_dir_streamin(
                x, params["w_ih"], params["b_ih"] + params["b_hh"],
                params["w_hh"], interpret,
            )
            bwd_r = pl.lstm_dir_streamin(
                x_rev, params["w_ih_reverse"],
                params["b_ih_reverse"] + params["b_hh_reverse"],
                params["w_hh_reverse"], interpret,
            )
            bwd = length_reverse(bwd_r, lengths)
            return jnp.concatenate([fwd, bwd], axis=-1)
    w_ih = jnp.concatenate([params["w_ih"], params["w_ih_reverse"]], axis=0)
    b = jnp.concatenate(
        [params["b_ih"] + params["b_hh"], params["b_ih_reverse"] + params["b_hh_reverse"]]
    )
    proj = x @ w_ih.T.astype(dtype) + b.astype(dtype)  # (B, T, 8H)
    fourH = params["w_ih"].shape[0]
    hidden = fourH // 4
    if use_pallas:
        # backward direction: reverse-walk kernel with in-kernel state
        # masking at padded steps — no gathers, outputs already in place
        # (the length_reverse formulation measured +28 ms/step at the
        # 48 kHz training geometry from the gather/scatter pair)
        fwd = pl.lstm_dir_pallas(
            proj[..., :fourH], params["w_hh"].T.astype(dtype), interpret
        )
        bwd = pl.lstm_dir_revmasked(
            proj[..., fourH:], params["w_hh_reverse"].T.astype(dtype), lengths,
            interpret,
        )
        return jnp.concatenate([fwd, bwd], axis=-1)
    proj_b_rev = length_reverse(proj[..., fourH:], lengths)
    fwd = _scan_dir(proj[..., :fourH], params["w_hh"].T.astype(dtype), hidden, False)
    bwd_r = _scan_dir(
        proj_b_rev, params["w_hh_reverse"].T.astype(dtype), hidden, False
    )
    bwd = length_reverse(bwd_r, lengths)
    return jnp.concatenate([fwd, bwd], axis=-1)
