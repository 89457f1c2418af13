"""Torch-checkpoint -> JAX-pytree conversion for the BSRNN model family.

The reference releases Lightning checkpoints (``readme.md:92-95``:
``bsrnn.ckpt`` for SEModel, ``flow_bsrnn.ckpt`` for FlowSEModel).  Key
structure (state_dict names):

* discriminative (``d_model.py`` SEModel -> ``models/bsrnn.py`` BSRNN_SE ->
  espnet BSRNNSeparator): ``se_model.bsrnn.bsrnn.{band_split,norm_time,
  rnn_time,fc_time,norm_freq,rnn_freq,fc_freq,mask_decoder}...``
* generative (``flow_model.py`` FlowSEModel -> local BSRNN,
  ``models/bsrnn_flowse.py:171-318``): ``dnn.{band_split_x,band_split_y,
  condition_fc,t_cond,norm_time,rnn_time,fc_time,norm_freq,rnn_freq,fc_freq,
  grad_decoder}...``

This module maps those tensors into our band-stacked padded layout
(models/bsrnn.py docstring).  Gate order of torch LSTMs (i,f,g,o) is already
our layout (ops/lstm.py), so LSTM tensors copy through unchanged.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "convert_discriminative_state_dict",
    "convert_flowse_state_dict",
    "load_init_from",
]


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _convert_band_split(sd, prefix, subbands, template):
    K = len(subbands)
    W = template["norm_scale"].shape[1]
    C = template["w"].shape[2]
    norm_scale = np.zeros((K, W), np.float32)
    norm_bias = np.zeros((K, W), np.float32)
    w = np.zeros((K, W, C), np.float32)
    b = np.zeros((K, C), np.float32)
    for i, sub in enumerate(subbands):
        cw = 2 * sub
        norm_scale[i, :cw] = _np(sd[f"{prefix}norm.{i}.weight"]).reshape(-1)
        norm_bias[i, :cw] = _np(sd[f"{prefix}norm.{i}.bias"]).reshape(-1)
        w[i, :cw] = _np(sd[f"{prefix}fc.{i}.weight"])[:, :, 0].T
        b[i] = _np(sd[f"{prefix}fc.{i}.bias"])
    return {
        "norm_scale": jnp.asarray(norm_scale),
        "norm_bias": jnp.asarray(norm_bias),
        "w": jnp.asarray(w),
        "b": jnp.asarray(b),
    }


def _convert_layers(sd, prefix, num_layer, bidirectional_time, with_t_cond):
    def stack(fmt, post=lambda x: x):
        return jnp.asarray(
            np.stack([post(_np(sd[fmt.format(i=i)])) for i in range(num_layer)])
        )

    def lstm_params(name, bidirectional):
        p = {
            "w_ih": stack(f"{prefix}{name}.{{i}}.weight_ih_l0"),
            "w_hh": stack(f"{prefix}{name}.{{i}}.weight_hh_l0"),
            "b_ih": stack(f"{prefix}{name}.{{i}}.bias_ih_l0"),
            "b_hh": stack(f"{prefix}{name}.{{i}}.bias_hh_l0"),
        }
        if bidirectional:
            for k in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
                tgt = k.replace("weight", "w").replace("bias", "b").replace("_l0", "")
                p[f"{tgt}_reverse"] = stack(f"{prefix}{name}.{{i}}.{k}_reverse")
        return p

    layers = {
        "norm_time_scale": stack(f"{prefix}norm_time.{{i}}.weight"),
        "norm_time_bias": stack(f"{prefix}norm_time.{{i}}.bias"),
        "rnn_time": lstm_params("rnn_time", bidirectional_time),
        "fc_time_w": stack(f"{prefix}fc_time.{{i}}.weight", post=lambda x: x.T),
        "fc_time_b": stack(f"{prefix}fc_time.{{i}}.bias"),
        "norm_freq_scale": stack(f"{prefix}norm_freq.{{i}}.weight"),
        "norm_freq_bias": stack(f"{prefix}norm_freq.{{i}}.bias"),
        "rnn_freq": lstm_params("rnn_freq", True),
        "fc_freq_w": stack(f"{prefix}fc_freq.{{i}}.weight", post=lambda x: x.T),
        "fc_freq_b": stack(f"{prefix}fc_freq.{{i}}.bias"),
    }
    if with_t_cond:
        layers["t_proj_w"] = stack(f"{prefix}t_cond.{{i}}.W")
    return layers


def _convert_mask_decoder_head(sd, prefix, subbands, C):
    """espnet MaskDecoder mlp: [0]=GN(C), [1]=Conv1d(C,4C,1), [2]=tanh,
    [3]=Conv1d(4C, 4*sub, 1), [4]=GLU(dim=1)."""
    K = len(subbands)
    SM = max(subbands)
    W = 2 * SM
    out = {
        "norm_scale": np.zeros((K, C), np.float32),
        "norm_bias": np.zeros((K, C), np.float32),
        "w1": np.zeros((K, C, 4 * C), np.float32),
        "b1": np.zeros((K, 4 * C), np.float32),
        "wv": np.zeros((K, 4 * C, W), np.float32),
        "wg": np.zeros((K, 4 * C, W), np.float32),
        "bv": np.zeros((K, W), np.float32),
        "bg": np.zeros((K, W), np.float32),
    }
    for i, sub in enumerate(subbands):
        cw = 2 * sub
        out["norm_scale"][i] = _np(sd[f"{prefix}.{i}.0.weight"]).reshape(-1)
        out["norm_bias"][i] = _np(sd[f"{prefix}.{i}.0.bias"]).reshape(-1)
        out["w1"][i] = _np(sd[f"{prefix}.{i}.1.weight"])[:, :, 0].T
        out["b1"][i] = _np(sd[f"{prefix}.{i}.1.bias"])
        w2 = _np(sd[f"{prefix}.{i}.3.weight"])[:, :, 0]  # (4*sub, 4C)
        b2 = _np(sd[f"{prefix}.{i}.3.bias"])
        out["wv"][i, :, :cw] = w2[:cw].T
        out["wg"][i, :, :cw] = w2[cw:].T
        out["bv"][i, :cw] = b2[:cw]
        out["bg"][i, :cw] = b2[cw:]
    return {k: jnp.asarray(v) for k, v in out.items()}


def _convert_grad_decoder_head(sd, mlp_prefix, conv_prefix, subbands, C, sc):
    """Local GradDecoder (models/bsrnn_flowse.py:103-168): per-band
    [GN(C), Conv1d(C, sub*sc, 1), tanh]; shared Conv2d(sc,4,5,1,2)+GLU."""
    K = len(subbands)
    SM = max(subbands)
    w = np.zeros((K, C, sc, SM), np.float32)
    b = np.zeros((K, sc, SM), np.float32)
    norm_scale = np.zeros((K, C), np.float32)
    norm_bias = np.zeros((K, C), np.float32)
    for i, sub in enumerate(subbands):
        norm_scale[i] = _np(sd[f"{mlp_prefix}.{i}.0.weight"]).reshape(-1)
        norm_bias[i] = _np(sd[f"{mlp_prefix}.{i}.0.bias"]).reshape(-1)
        wf = _np(sd[f"{mlp_prefix}.{i}.1.weight"])[:, :, 0].reshape(sc, sub, C)
        bf = _np(sd[f"{mlp_prefix}.{i}.1.bias"]).reshape(sc, sub)
        w[i, :, :, :sub] = wf.transpose(2, 0, 1)
        b[i, :, :sub] = bf
    conv_w = _np(sd[f"{conv_prefix}.0.weight"]).transpose(2, 3, 1, 0)  # OIHW->HWIO
    conv_b = _np(sd[f"{conv_prefix}.0.bias"])
    return {
        "norm_scale": jnp.asarray(norm_scale),
        "norm_bias": jnp.asarray(norm_bias),
        "w": jnp.asarray(w),
        "b": jnp.asarray(b),
        "conv_w": jnp.asarray(conv_w),
        "conv_b": jnp.asarray(conv_b),
    }


def convert_discriminative_state_dict(sd, template, cfg, prefix="se_model.bsrnn.bsrnn."):
    """SEModel state_dict -> init_bsrnn-shaped pytree."""
    subs = cfg.subbands
    C = cfg.num_channel
    return {
        "band_split": _convert_band_split(sd, f"{prefix}band_split.", subs, template["band_split"]),
        "layers": _convert_layers(sd, prefix, cfg.num_layer, not cfg.causal, False),
        "mask_decoder": {
            "mask": _convert_mask_decoder_head(sd, f"{prefix}mask_decoder.mlp_mask", subs, C),
            "residual": _convert_mask_decoder_head(
                sd, f"{prefix}mask_decoder.mlp_residual", subs, C
            ),
        },
    }


def convert_flowse_state_dict(sd, template, cfg, prefix="dnn."):
    """FlowSEModel state_dict -> init_flowse-shaped pytree."""
    subs = cfg.subbands
    C = cfg.num_channel
    return {
        "band_split": _convert_band_split(sd, f"{prefix}band_split_x.", subs, template["band_split"]),
        "band_split_y": _convert_band_split(
            sd, f"{prefix}band_split_y.", subs, template["band_split_y"]
        ),
        "condition_fc_w": jnp.asarray(_np(sd[f"{prefix}condition_fc.weight"]).T),
        "condition_fc_b": jnp.asarray(_np(sd[f"{prefix}condition_fc.bias"])),
        "layers": _convert_layers(sd, prefix, cfg.num_layer, not cfg.causal, True),
        "grad_decoder": {
            "mask": _convert_grad_decoder_head(
                sd, f"{prefix}grad_decoder.mlp_mask",
                f"{prefix}grad_decoder.conv_after_mask", subs, C, cfg.sub_channel,
            ),
            "residual": _convert_grad_decoder_head(
                sd, f"{prefix}grad_decoder.mlp_residual",
                f"{prefix}grad_decoder.conv_after_residual", subs, C, cfg.sub_channel,
            ),
        },
    }


def apply_ema_record(sd: dict, ema_state: dict) -> dict:
    """Overwrite trainable params with the torch_ema shadow params, mirroring
    the reference's eval-time ``ema.copy_to(self.parameters())``
    (flow_model.py:98-112).  ``shadow_params`` is ordered like
    ``parameters()`` filtered to ``requires_grad`` — state-dict key order
    minus the frozen ``dnn.t_cond.{i}.W`` buffers."""
    import re

    shadow = ema_state["shadow_params"]
    trainable = [k for k in sd if not re.fullmatch(r"dnn\.t_cond\.\d+\.W", k)]
    if len(shadow) != len(trainable):
        raise ValueError(
            f"EMA shadow_params count {len(shadow)} != trainable param count "
            f"{len(trainable)} — key-order assumption violated"
        )
    out = dict(sd)
    out.update(zip(trainable, shadow))
    return out


def load_torch_checkpoint(path: str):
    """(state_dict, full checkpoint dict) from a torch/Lightning ckpt."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return sd, ckpt


def load_torch_state_dict(path: str):
    return load_torch_checkpoint(path)[0]


def load_init_from(path: str, template):
    """Warm start (train_se.py:55-60): accepts a torch ckpt and converts, or
    an orbax/npz pytree with matching structure."""
    if path.endswith((".ckpt", ".pt", ".pth")):
        sd = load_torch_state_dict(path)
        kind = "flowse" if any(k.startswith("dnn.") for k in sd) else "disc"
        from urgent2026_challenge_track1_tpu.models.bsrnn import BSRNNConfig

        if kind == "flowse":
            n = sd["dnn.condition_fc.bias"].shape[0]
            layers = len({k.split(".")[2] for k in sd if k.startswith("dnn.rnn_time.")})
            input_dim = 769
            cfg = BSRNNConfig(
                input_dim=input_dim, num_channel=n, num_layer=layers,
                causal=False, with_condition=True,
            )
            return convert_flowse_state_dict(sd, template, cfg)
        first = next(k for k in sd if "band_split.fc.0.weight" in k)
        prefix = first.split("band_split")[0]
        n = sd[f"{prefix}band_split.fc.0.bias"].shape[0]
        layers = len(
            {k.split(".")[-2] for k in sd if k.startswith(f"{prefix}rnn_time.")}
        )
        cfg = BSRNNConfig(input_dim=481, num_channel=n, num_layer=layers, causal=False)
        return convert_discriminative_state_dict(sd, template, cfg, prefix)
    raise ValueError(f"unsupported init_from: {path}")
