"""Band-Split RNN (BSRNN), TPU-first.

Behavioral spec: the reference's local BSRNN copy
(``/root/reference/baseline_code/models/bsrnn_flowse.py:16-318`` — which
documents the espnet band layout and dual-path loop verbatim) and espnet
202412's ``espnet2/enh/layers/bsrnn.py`` BSRNN/MaskDecoder used by the
discriminative path (``/root/reference/baseline_code/models/bsrnn.py:28-41``).

Architecture (one fs-truncated band set per sampling rate):
  spectrum (B,T,F) complex
    -> BandSplit: K non-uniform subbands, per-band GroupNorm + 1x1 conv -> (B,T,K,N)
    -> num_layer x dual-path blocks:
         time:  GN -> LSTM over T (batch B*K) -> Linear -> +skip
         band:  GN -> BLSTM over K (batch B*T) -> Linear -> +skip
    -> MaskDecoder: per-band MLP -> GLU -> complex (mask, residual)
    -> out = mask * spectrum + residual

TPU-first design decisions (vs. the reference's per-band Python loops):
  * All per-band parameters are stacked into padded tensors (K, W, ...) so the
    whole band split / decode is ONE einsum on the MXU instead of K tiny convs;
    padded slots are masked out of the GroupNorm statistics and zeroed, so the
    numerics match the reference exactly.
  * Band gather/scatter index maps are trace-time numpy constants.
  * The 6 layers are parameter-stacked and driven by `lax.scan` (compile time
    stays flat in depth); each LSTM hoists its input projection out of the
    recurrence (see ops/lstm.py).
  * fs is a static Python int: one compiled program per (fs, length-bucket),
    matching the reference's one-fs-per-batch invariant (``dataset.py:417``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from urgent2026_challenge_track1_tpu.dsp import stft as _stft
from urgent2026_challenge_track1_tpu.ops import lstm as lstm_ops
from urgent2026_challenge_track1_tpu.ops.norms import (
    cumulative_group_norm,
    group_norm,
    masked_group_norm,
)

__all__ = [
    "BSRNNConfig",
    "subband_layout",
    "band_count",
    "init_bsrnn",
    "bsrnn_apply",
    "bsrnn_se_apply",
]


# ---------------------------------------------------------------------------
# Band layout (reference: models/bsrnn_flowse.py:23-43)
# ---------------------------------------------------------------------------


def subband_layout(input_dim: int, target_fs: int = 48000) -> tuple[int, ...]:
    """Non-uniform subband widths in bins; sums to ``input_dim``.

    481 bins (n_fft=960 @48k): 200 Hz bands to 4 kHz, 500 Hz to 7 kHz,
    2 kHz to 21 kHz, one final 3 kHz band.  769 bins (n_fft=1536 @48k):
    same frequency plan at 31.25 Hz resolution.
    """
    if input_dim == 481 and target_fs == 48000:
        return tuple([5] + [4] * 19 + [10] * 6 + [40] * 7 + [60])
    if input_dim == 769 and target_fs == 48000:
        return tuple([5] + [4] * 26 + [10] * 10 + [50] * 10 + [60])
    raise NotImplementedError(
        f"no subband layout for input_dim={input_dim}, target_fs={target_fs}"
    )


def _subband_edge_freqs(subbands, n_fft: int, target_fs: int) -> np.ndarray:
    """Upper-edge frequency of each subband (reference's subband_freqs)."""
    edges = np.cumsum(subbands)
    return (edges - 1) * (target_fs / n_fft)


def band_count(input_dim: int, target_fs: int, fs: int, n_bins_in: int) -> int:
    """Number of bands processed for sampling rate ``fs`` with ``n_bins_in``
    input bins — reproduces the two break conditions of the reference's
    BandSplit.forward (models/bsrnn_flowse.py:81-85)."""
    subbands = subband_layout(input_dim, target_fs)
    n_fft = (input_dim - 1) * 2
    freqs = _subband_edge_freqs(subbands, n_fft, target_fs)
    hz = 0
    for i, sub in enumerate(subbands):
        hz += sub
        if hz >= n_bins_in or freqs[i] >= fs / 2:
            return i + 1
    return len(subbands)


@dataclasses.dataclass(frozen=True)
class BSRNNConfig:
    input_dim: int = 481          # frequency bins at target_fs
    num_channel: int = 192        # embedding dim N
    num_layer: int = 6
    target_fs: int = 48000
    causal: bool = False          # False -> bidirectional time LSTM
    streaming_norm: bool = False  # causal (cumulative) GroupNorm statistics:
    #                               with causal=True the whole model becomes
    #                               streamable with bounded carried state
    #                               (models/streaming_causal.py); the
    #                               reference's GN-over-full-T is non-causal
    #                               even with causal LSTMs
    norm_eps: float = 1e-8        # espnet choose_norm GN eps
    with_condition: bool = False  # flow-matching: second band split + t-emb
    sub_channel: int = 16         # GradDecoder intermediate channels (flow)
    compute_dtype: str = "float32"  # "bfloat16" runs the recurrence matmuls
    #                                 on the MXU's fast path (f32 cell state)
    use_pallas_lstm: bool = False   # recurrences via the Pallas kernels
    #                                 (differentiable: custom VJP reverse-scan
    #                                  kernel; lean kernel outside grad)
    remat: bool = True              # rematerialize each dual-path layer in
    #                                 the backward pass (HBM >> FLOPs here)

    @property
    def subbands(self) -> tuple[int, ...]:
        return subband_layout(self.input_dim, self.target_fs)

    @property
    def max_sub(self) -> int:
        return max(self.subbands)


# ---------------------------------------------------------------------------
# Static index maps (numpy, trace-time constants)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _band_maps(subbands: tuple[int, ...], n_bins_in: int, n_bands: int):
    """Gather/scatter maps for the padded band-stacked layout.

    Returns:
      gather (K, W): indices into the interleaved re/im spectrum of length
        2*n_bins_in (+1 zero slot at index 2*n_bins_in) for each band slot.
      chan_mask (K, W): 1.0 where the slot is a real channel of the band
        (incl. the reference's zero-padding of a truncated last band).
      flat_valid (n_bins_in,): indices into the flattened (K*max_sub,) complex
        band stack recovering bins 0..n_bins_in-1 in order.
    """
    K = n_bands
    W = 2 * max(subbands)
    zero_slot = 2 * n_bins_in
    gather = np.full((K, W), zero_slot, dtype=np.int32)
    chan_mask = np.zeros((K, W), dtype=np.float32)
    flat_valid = np.zeros((n_bins_in,), dtype=np.int32)
    off = 0
    max_sub = max(subbands)
    for i in range(K):
        sub = subbands[i]
        for j in range(sub):
            b = off + j
            if b < n_bins_in:
                gather[i, 2 * j] = 2 * b
                gather[i, 2 * j + 1] = 2 * b + 1
                flat_valid[b] = i * max_sub + j
            # channels up to 2*sub are "real" for the norm even when the bin
            # is beyond n_bins_in (reference zero-pads the truncated band and
            # normalizes over the full subband width).
            chan_mask[i, 2 * j] = 1.0
            chan_mask[i, 2 * j + 1] = 1.0
        off += sub
    return gather, chan_mask, flat_valid


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / float(np.sqrt(fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _init_band_split(key, cfg: BSRNNConfig):
    subs = cfg.subbands
    K, W, C = len(subs), 2 * cfg.max_sub, cfg.num_channel
    norm_scale = np.zeros((K, W), np.float32)
    norm_bias = np.zeros((K, W), np.float32)
    w = np.zeros((K, W, C), np.float32)
    b = np.zeros((K, C), np.float32)
    keys = jax.random.split(key, 2 * K)
    for i, sub in enumerate(subs):
        cw = 2 * sub
        norm_scale[i, :cw] = 1.0
        w[i, :cw] = np.asarray(_uniform(keys[2 * i], (cw, C), cw))
        b[i] = np.asarray(_uniform(keys[2 * i + 1], (C,), cw))
    return {
        "norm_scale": jnp.asarray(norm_scale),
        "norm_bias": jnp.asarray(norm_bias),
        "w": jnp.asarray(w),
        "b": jnp.asarray(b),
    }


def _init_layers(key, cfg: BSRNNConfig):
    """Parameter-stacked dual-path layers (leading axis = layer)."""
    N = cfg.num_channel
    hdim = 2 * N
    t_out = hdim if cfg.causal else 2 * hdim
    L = cfg.num_layer
    keys = jax.random.split(key, 7 * L)
    per_layer = []
    for i in range(L):
        k = keys[7 * i : 7 * i + 7]
        layer = {
            "norm_time_scale": jnp.ones((N,)),
            "norm_time_bias": jnp.zeros((N,)),
            "rnn_time": lstm_ops.init_lstm(k[0], N, hdim, bidirectional=not cfg.causal),
            "fc_time_w": _uniform(k[1], (t_out, N), t_out),
            "fc_time_b": _uniform(k[2], (N,), t_out),
            "norm_freq_scale": jnp.ones((N,)),
            "norm_freq_bias": jnp.zeros((N,)),
            "rnn_freq": lstm_ops.init_lstm(k[3], N, hdim, bidirectional=True),
            "fc_freq_w": _uniform(k[4], (4 * N, N), 4 * N),
            "fc_freq_b": _uniform(k[5], (N,), 4 * N),
        }
        if cfg.with_condition:
            # GaussianFourierProjection W: N(0,1)*scale, embedding_size=N//2
            layer["t_proj_w"] = jax.random.normal(k[6], (N // 2,))
        per_layer.append(layer)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def _init_mask_decoder(key, cfg: BSRNNConfig):
    """espnet MaskDecoder: per band [GN(C), Conv(C->4C), tanh, Conv(4C->4*sub),
    GLU] for mask and residual heads (value/gate halves stored pre-split)."""
    subs = cfg.subbands
    K, C, W = len(subs), cfg.num_channel, 2 * cfg.max_sub
    keys = jax.random.split(key, 8 * K)
    out = {}
    for head_i, head in enumerate(("mask", "residual")):
        w1 = np.zeros((K, C, 4 * C), np.float32)
        b1 = np.zeros((K, 4 * C), np.float32)
        wv = np.zeros((K, 4 * C, W), np.float32)
        wg = np.zeros((K, 4 * C, W), np.float32)
        bv = np.zeros((K, W), np.float32)
        bg = np.zeros((K, W), np.float32)
        for i, sub in enumerate(subs):
            k = keys[8 * i + 4 * head_i : 8 * i + 4 * head_i + 4]
            w1[i] = np.asarray(_uniform(k[0], (C, 4 * C), C))
            b1[i] = np.asarray(_uniform(k[1], (4 * C,), C))
            cw = 2 * sub
            wfull = np.asarray(_uniform(k[2], (4 * C, 2 * cw), 4 * C))
            bfull = np.asarray(_uniform(k[3], (2 * cw,), 4 * C))
            wv[i, :, :cw], wg[i, :, :cw] = wfull[:, :cw], wfull[:, cw:]
            bv[i, :cw], bg[i, :cw] = bfull[:cw], bfull[cw:]
        out[head] = {
            "norm_scale": jnp.ones((K, C)),
            "norm_bias": jnp.zeros((K, C)),
            "w1": jnp.asarray(w1),
            "b1": jnp.asarray(b1),
            "wv": jnp.asarray(wv),
            "wg": jnp.asarray(wg),
            "bv": jnp.asarray(bv),
            "bg": jnp.asarray(bg),
        }
    return out


def init_bsrnn(key, cfg: BSRNNConfig):
    ks = jax.random.split(key, 5)
    params = {
        "band_split": _init_band_split(ks[0], cfg),
        "layers": _init_layers(ks[1], cfg),
        "mask_decoder": _init_mask_decoder(ks[2], cfg),
    }
    if cfg.with_condition:
        N = cfg.num_channel
        params["band_split_y"] = _init_band_split(ks[3], cfg)
        params["condition_fc_w"] = _uniform(ks[4], (2 * N, N), 2 * N)
        params["condition_fc_b"] = jnp.zeros((N,))
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _band_split_apply(p, spec: jnp.ndarray, cfg: BSRNNConfig, n_bands: int, eps,
                      fm: Optional[jnp.ndarray] = None, nstate=None,
                      return_state: bool = False):
    """(B, T, F) complex -> (B, T, K, N).  ``fm`` (B, T): valid-frame mask —
    when given, padded frames are excluded from the norm statistics (the
    reference normalizes exact-length signals).

    With ``cfg.streaming_norm`` the per-band norm is cumulative over frames
    (causal); ``nstate``/``return_state`` carry its running sums across
    chunks (streaming), and ``fm`` is unnecessary — end-padding cannot leak
    backward into valid frames' statistics."""
    B, T, F = spec.shape
    gather, chan_mask, _ = _band_maps(cfg.subbands, F, n_bands)
    x2 = jnp.stack([spec.real, spec.imag], axis=-1).reshape(B, T, 2 * F)
    x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 1)))  # zero slot
    blocks = x2[..., jnp.asarray(gather)]  # (B, T, K, W)
    ns = None
    if cfg.streaming_norm:
        h = cumulative_group_norm(
            blocks,
            p["norm_scale"][:n_bands][None, None],
            p["norm_bias"][:n_bands][None, None],
            axes=(3,),
            eps=eps,
            mask=jnp.asarray(chan_mask)[None, None],
            state=nstate,
            return_state=return_state,
        )
        if nstate is not None or return_state:
            h, ns = h
    else:
        mask = jnp.asarray(chan_mask)[None, None]  # (1, 1, K, W)
        if fm is not None:
            mask = mask * fm[:, :, None, None]
        h = masked_group_norm(
            blocks,
            p["norm_scale"][:n_bands][None, None],
            p["norm_bias"][:n_bands][None, None],
            mask,
            axes=(1, 3),
            eps=eps,
        )
    cdtype = jnp.dtype(cfg.compute_dtype)
    z = jnp.einsum(
        "btkw,kwc->btkc",
        h.astype(cdtype),
        p["w"][:n_bands].astype(cdtype),
        preferred_element_type=jnp.float32,
    )
    z = z + p["b"][:n_bands][None, None]
    if nstate is not None or return_state:
        return z, ns
    return z


def _dual_path_layer(z, layer, cfg: BSRNNConfig, t: Optional[jnp.ndarray], eps,
                     frames: Optional[jnp.ndarray] = None,
                     fm: Optional[jnp.ndarray] = None,
                     lstate=None,
                     constrain=None):
    """One dual-path block on (B, T, K, N).  Norms and the residual stream
    stay float32; the LSTM/linear matmuls run in cfg.compute_dtype.

    With ``frames`` (B,) + ``fm`` (B, T) the block is length-exact: the two
    GroupNorms exclude padded frames from their statistics and the
    bidirectional time recurrence length-reverses its backward direction, so
    activations at valid frames are independent of the bucket padding.

    ``constrain`` (optional callable on (rows, L, N) sequence tensors) is the
    model-parallel hook: parallel/model_parallel.py passes a
    with_sharding_constraint that shards the independent recurrence rows
    (B*K time rows / B*T band rows) over the mesh, so GSPMD splits each
    recurrence across chips and inserts the resharding collectives between
    the two paths (see that module for the design).

    ``lstate``: streaming carry (norm running sums + time-LSTM (h, c)) —
    requires ``cfg.causal`` and ``cfg.streaming_norm``; the layer then
    returns ``(z, new_lstate)`` and chaining chunks equals one full pass."""
    B, T, K, N = z.shape
    cdtype = jnp.dtype(cfg.compute_dtype)
    fm4 = None if fm is None else fm[:, :, None, None]
    want_state = lstate is not None
    new_state = {}
    # --- time path ---
    if cfg.streaming_norm:
        out = cumulative_group_norm(
            z, layer["norm_time_scale"], layer["norm_time_bias"], axes=(2, 3),
            eps=eps, state=lstate["norm_time"] if want_state else None,
            return_state=want_state,
        )
        if want_state:
            out, new_state["norm_time"] = out
    elif fm4 is None:
        out = group_norm(
            z, layer["norm_time_scale"], layer["norm_time_bias"], axes=(1, 2, 3), eps=eps
        )
    else:
        out = masked_group_norm(
            z, layer["norm_time_scale"], layer["norm_time_bias"], fm4,
            axes=(1, 2, 3), eps=eps,
        )
    if t is not None:
        # GaussianFourierProjection (models/bsrnn_flowse.py:90-99): per-layer
        # random Fourier t-embedding of size N, broadcast over (T, K).
        proj = t[:, None] * layer["t_proj_w"][None, :] * (2.0 * np.pi)
        t_emb = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)  # (B, N)
        out = out + t_emb[:, None, None, :]
    if constrain is not None:
        out = constrain(out, "time")  # (B over dp, K over mp): the b-major
        #                               reshape below carries it to the rows
    seq = out.transpose(0, 2, 1, 3).reshape(B * K, T, N).astype(cdtype)
    if cfg.causal:
        if want_state:
            h, new_state["rnn_time"] = lstm_ops.lstm(
                layer["rnn_time"], seq, initial_state=lstate["rnn_time"],
                return_state=True,
            )
        else:
            h = lstm_ops.lstm(layer["rnn_time"], seq,
                              use_pallas=cfg.use_pallas_lstm)
    elif frames is not None:
        h = lstm_ops.bilstm_masked(
            layer["rnn_time"], seq, jnp.repeat(frames, K),
            use_pallas=cfg.use_pallas_lstm,
        )
    elif cfg.use_pallas_lstm:
        from urgent2026_challenge_track1_tpu.ops.pallas_lstm import bilstm_pallas

        h = bilstm_pallas(layer["rnn_time"], seq)
    else:
        h = lstm_ops.bilstm(layer["rnn_time"], seq)
    if constrain is not None:
        # re-anchor the recurrence output on the rows sharding: without
        # this, the band-path layout back-propagates onto the fwd/bwd
        # concat inside bilstm and GSPMD falls back to "involuntary full
        # rematerialization" (replicate + repartition) AT the concatenate;
        # constraining h makes the reshard a plain copy on this boundary
        h = constrain(h)
    h = jnp.dot(h, layer["fc_time_w"].astype(cdtype),
                preferred_element_type=jnp.float32) + layer["fc_time_b"]
    z = z + h.reshape(B, K, T, N).transpose(0, 2, 1, 3)
    if constrain is not None:
        z = constrain(z, "anchor")  # canonical batch-only residual layout
    # --- band path --- (the band recurrence runs over K per frame: padded
    # frames are independent batch rows there and cannot leak into valid ones)
    if cfg.streaming_norm:
        out = cumulative_group_norm(
            z, layer["norm_freq_scale"], layer["norm_freq_bias"], axes=(2, 3),
            eps=eps, state=lstate["norm_freq"] if want_state else None,
            return_state=want_state,
        )
        if want_state:
            out, new_state["norm_freq"] = out
    elif fm4 is None:
        out = group_norm(
            z, layer["norm_freq_scale"], layer["norm_freq_bias"], axes=(1, 2, 3), eps=eps
        )
    else:
        out = masked_group_norm(
            z, layer["norm_freq_scale"], layer["norm_freq_bias"], fm4,
            axes=(1, 2, 3), eps=eps,
        )
    if constrain is not None:
        out = constrain(out, "band")  # (B over dp, T over mp)
    seq = out.reshape(B * T, K, N).astype(cdtype)
    if cfg.use_pallas_lstm:
        from urgent2026_challenge_track1_tpu.ops.pallas_lstm import bilstm_pallas

        h = bilstm_pallas(layer["rnn_freq"], seq)
    else:
        h = lstm_ops.bilstm(layer["rnn_freq"], seq)
    if constrain is not None:
        h = constrain(h)  # same re-anchor as the time path (see above)
    h = jnp.dot(h, layer["fc_freq_w"].astype(cdtype),
                preferred_element_type=jnp.float32) + layer["fc_freq_b"]
    z = z + h.reshape(B, T, K, N)
    if constrain is not None:
        z = constrain(z, "anchor")
    if want_state:
        return z, new_state
    return z


def _run_layers(params, z, cfg: BSRNNConfig, t: Optional[jnp.ndarray], eps,
                frames: Optional[jnp.ndarray] = None,
                fm: Optional[jnp.ndarray] = None,
                constrain=None,
                states=None):
    layer_fn = _dual_path_layer
    if constrain is not None:
        # bind the (non-jax-type) sharding hook before the checkpoint wrap
        layer_fn = functools.partial(layer_fn, constrain=constrain)
    if states is not None:
        # streaming: thread each layer's carry (norm sums + LSTM state)
        # through the same stacked-layer scan; returns the updated stack
        def body_s(carry, xs):
            layer, lstate = xs
            z2, ns = layer_fn(carry, layer, cfg, t, eps, frames, fm, lstate)
            return z2, ns

        z, new_states = jax.lax.scan(body_s, z, (params["layers"], states))
        return z, new_states
    if cfg.remat:
        # recompute layer activations in the backward pass: training the
        # reference geometry (B=4, 2 s @48 kHz) otherwise exceeds one chip's
        # HBM on saved scan activations
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(2,), policy=None)

    def body(carry, layer):
        return layer_fn(carry, layer, cfg, t, eps, frames, fm), None

    z, _ = jax.lax.scan(body, z, params["layers"])
    return z


def _mask_decoder_head(p, z, cfg: BSRNNConfig, n_bands: int, n_bins: int, eps,
                       fm: Optional[jnp.ndarray] = None, nstate=None,
                       return_state: bool = False):
    """(B, T, K, N) -> (B, T, n_bins) complex (one head: mask or residual)."""
    B, T, K, N = z.shape
    _, chan_mask, flat_valid = _band_maps(cfg.subbands, n_bins, n_bands)
    # per-band GroupNorm(1, C) over (C, T): stats per (batch, band)
    ns = None
    if cfg.streaming_norm:
        h = cumulative_group_norm(
            z, p["norm_scale"][:n_bands][None, None],
            p["norm_bias"][:n_bands][None, None], axes=(3,), eps=eps,
            state=nstate, return_state=return_state,
        )
        if nstate is not None or return_state:
            h, ns = h
    else:
        h = z
        if fm is None:
            mean = jnp.mean(h, axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(h - mean), axis=(1, 3), keepdims=True)
        else:
            m4 = fm[:, :, None, None]
            denom = jnp.sum(m4, axis=1, keepdims=True) * N
            mean = jnp.sum(h * m4, axis=(1, 3), keepdims=True) / denom
            var = jnp.sum(jnp.square(h - mean) * m4, axis=(1, 3), keepdims=True) / denom
        h = (h - mean) / jnp.sqrt(var + eps)
        h = (h * p["norm_scale"][:n_bands][None, None]
             + p["norm_bias"][:n_bands][None, None])
    cdtype = jnp.dtype(cfg.compute_dtype)
    hc = h.astype(cdtype)
    h = jnp.tanh(
        jnp.einsum("btkc,kcd->btkd", hc, p["w1"][:n_bands].astype(cdtype),
                   preferred_element_type=jnp.float32)
        + p["b1"][:n_bands][None, None]
    ).astype(cdtype)
    val = jnp.einsum("btkd,kdw->btkw", h, p["wv"][:n_bands].astype(cdtype),
                     preferred_element_type=jnp.float32) + p["bv"][:n_bands][None, None]
    gate = jnp.einsum("btkd,kdw->btkw", h, p["wg"][:n_bands].astype(cdtype),
                      preferred_element_type=jnp.float32) + p["bg"][:n_bands][None, None]
    out = val * jax.nn.sigmoid(gate) * jnp.asarray(chan_mask)[None, None]
    cplx = out.reshape(B, T, K, cfg.max_sub, 2)
    cplx = jax.lax.complex(cplx[..., 0], cplx[..., 1]).reshape(B, T, K * cfg.max_sub)
    cplx = cplx[..., jnp.asarray(flat_valid)]  # (B, T, n_bins)
    if nstate is not None or return_state:
        return cplx, ns
    return cplx


def frame_validity(lengths: jnp.ndarray, n_frames: int, n_fft: int, hop: int):
    """(frames (B,), fm (B, n_frames)) for exact-length STFT geometry."""
    frames = _stft.valid_frames(lengths, n_fft, hop)
    return frames, _stft.frames_mask(frames, n_frames)


def bsrnn_apply(
    params,
    spec: jnp.ndarray,
    cfg: BSRNNConfig,
    fs: int,
    t: Optional[jnp.ndarray] = None,
    spec_cond: Optional[jnp.ndarray] = None,
    frames: Optional[jnp.ndarray] = None,
    constrain=None,
    states=None,
):
    """Core discriminative BSRNN.  spec: (B, T, F) complex at rate ``fs``;
    returns mask*spec + residual.  The conditional (flow/score) variant with
    the GradDecoder head lives in models/bsrnn_flowse.py (``spec_cond`` /
    ``t`` are accepted for signature compatibility there).

    ``frames`` (B,): valid-frame counts — activates the length-exact path
    (masked norms + length-reversed backward recurrences) so outputs at
    valid frames are independent of the bucket padding.

    ``states``: streaming carry (see models/streaming_causal.init_states) —
    requires ``cfg.causal`` and ``cfg.streaming_norm``; the call then
    processes ``spec`` as the next chunk of an unbounded stream and returns
    ``(enhanced_spec, new_states)``."""
    B, T, F = spec.shape
    eps = cfg.norm_eps
    K = band_count(cfg.input_dim, cfg.target_fs, fs, F)
    if states is not None:
        if not (cfg.causal and cfg.streaming_norm):
            raise ValueError(
                "streaming state requires causal=True and streaming_norm=True"
            )
        z, bs = _band_split_apply(
            params["band_split"], spec, cfg, K, eps, nstate=states["band_split"]
        )
        z, ls = _run_layers(params, z, cfg, t, eps, states=states["layers"])
        m, ms = _mask_decoder_head(
            params["mask_decoder"]["mask"], z, cfg, K, F, eps,
            nstate=states["mask"],
        )
        r, rs = _mask_decoder_head(
            params["mask_decoder"]["residual"], z, cfg, K, F, eps,
            nstate=states["residual"],
        )
        new_states = {"band_split": bs, "layers": ls, "mask": ms, "residual": rs}
        return m * spec + r, new_states
    fm = None
    if frames is not None:
        fm = _stft.frames_mask(frames, T)
    z = _band_split_apply(params["band_split"], spec, cfg, K, eps, fm)
    z = _run_layers(params, z, cfg, t, eps, frames, fm, constrain)
    m = _mask_decoder_head(params["mask_decoder"]["mask"], z, cfg, K, F, eps, fm)
    r = _mask_decoder_head(params["mask_decoder"]["residual"], z, cfg, K, F, eps, fm)
    return m * spec + r


# ---------------------------------------------------------------------------
# Discriminative SE wrapper (STFT -> BSRNN -> iSTFT)
# ---------------------------------------------------------------------------


def bsrnn_se_apply(params, cfg: BSRNNConfig, stft_cfg, noisy: jnp.ndarray, fs: int,
                   lengths: Optional[jnp.ndarray] = None, constrain=None):
    """Waveform SE model (reference models/bsrnn.py:36-41).

    noisy: (B, T) waveform -> (enhanced (B, T), enhanced_spec (B, frames, bins)).

    With ``lengths`` (B,) the whole pipeline is length-exact: masked norm
    statistics, length-reversed backward recurrences, and a masked-envelope
    iSTFT, so ``out[b, :lengths[b]]`` is independent of the bucket padding
    (the reference processes exact batch-max-length signals, dataset.py:404).

    ``constrain``: model-parallel sharding hook, see parallel/model_parallel.
    """
    from urgent2026_challenge_track1_tpu.dsp import stft as dsp

    if lengths is None:
        spec = dsp.stft_encode(noisy, fs, stft_cfg)
        enh_spec = bsrnn_apply(params, spec, cfg, fs, constrain=constrain)
        wav = dsp.stft_decode(enh_spec, fs, stft_cfg, length=noisy.shape[-1])
        return wav, enh_spec
    n_fft, _, hop = stft_cfg.geometry(fs)
    # encode with the exact-length reflect tail so the valid frames are
    # bitwise what an exact-length (reference) STFT produces
    spec = dsp.stft_encode(dsp.reflect_tail(noisy, lengths, n_fft // 2), fs, stft_cfg)
    frames, fm = frame_validity(lengths, spec.shape[1], n_fft, hop)
    enh_spec = bsrnn_apply(params, spec, cfg, fs, frames=frames,
                           constrain=constrain)
    wav = dsp.stft_decode(
        enh_spec, fs, stft_cfg, length=noisy.shape[-1], frame_mask=fm
    )
    wav = wav * (jnp.arange(wav.shape[-1])[None, :] < lengths[:, None])
    return wav, enh_spec
