"""Checkpoint loading for inference: orbax dirs and torch Lightning ckpts.

Mirrors the reference's ``inference.py:30-33`` behavior (try SEModel, fall
back to FlowSEModel) by detecting the model kind from the checkpoint itself.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from urgent2026_challenge_track1_tpu.config import Config
from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
from urgent2026_challenge_track1_tpu.models import bsrnn as bsrnn_mod
from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as flow_mod

__all__ = ["load_model_for_inference", "load_orbax_payload"]


def _use_pallas() -> bool:
    """The Pallas kernel compiles only for real TPU backends."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _inference_dtype() -> str:
    """bfloat16 on TPU (MXU fast path); float32 elsewhere — the XLA CPU
    thunk runtime in this image cannot execute batched bf16 x bf16 -> f32
    DotGenerals (the band-split/decoder einsums), so forcing bf16 off-TPU
    breaks CPU inference outright (found by an end-to-end verify drive)."""
    return "bfloat16" if _use_pallas() else "float32"


def _from_torch(path: str):
    from urgent2026_challenge_track1_tpu.utils import convert

    sd, ckpt = convert.load_torch_checkpoint(path)
    if any(k.startswith("dnn.") for k in sd):
        if "ema" in ckpt:
            # the reference evaluates the flow model with its EMA weights
            # (flow_model.py:98-112); match that at inference time
            sd = convert.apply_ema_record(sd, ckpt["ema"])
        n = sd["dnn.condition_fc.bias"].shape[0]
        layers = len({k.split(".")[2] for k in sd if k.startswith("dnn.rnn_time.")})
        fcfg = flow_mod.FlowSEConfig(
            bsrnn_hidden=n, num_layer=layers, compute_dtype=_inference_dtype(),
            use_pallas_lstm=_use_pallas(),
        )
        template = flow_mod.init_flowse(jax.random.PRNGKey(0), fcfg)
        params = convert.convert_flowse_state_dict(sd, template, fcfg.dnn_cfg)
        return "flowse", params, fcfg, fcfg.stft_cfg
    first = next(k for k in sd if "band_split.fc.0.weight" in k)
    prefix = first.split("band_split")[0]
    n = sd[f"{prefix}band_split.fc.0.bias"].shape[0]
    layers = len(
        {k.split("rnn_time.")[1].split(".")[0] for k in sd if f"{prefix}rnn_time." in k}
    )
    mcfg = bsrnn_mod.BSRNNConfig(
        input_dim=481, num_channel=n, num_layer=layers, causal=False,
        compute_dtype=_inference_dtype(), use_pallas_lstm=_use_pallas(),
    )
    template = bsrnn_mod.init_bsrnn(jax.random.PRNGKey(0), mcfg)
    params = convert.convert_discriminative_state_dict(sd, template, mcfg, prefix)
    return "discriminative", params, mcfg, STFTConfig(n_fft=960, hop_length=480)


def load_orbax_payload(path: str):
    """Raw (payload, meta) from an orbax manager root or single step dir."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # accept either a manager root (containing step dirs) or a single step dir
    if os.path.isdir(os.path.join(path, "state")):
        step_dir = path
        meta_path = os.path.join(path, "meta")
    else:
        # the trainer keeps a sibling "<root>_last" tree whose latest step can
        # be NEWER than any retained top-k save (plateau garbage collection —
        # see CheckpointIO); resume takes the max across both trees, so must we
        roots = [path]
        if not path.rstrip(os.sep).endswith("_last"):
            last_root = path.rstrip(os.sep) + "_last"
            if os.path.isdir(last_root):
                roots.append(last_root)
        best = None
        for root in roots:
            mgr = ocp.CheckpointManager(root)
            step = mgr.latest_step()
            if step is not None and (best is None or step > best[0]):
                best = (step, mgr)
        assert best is not None, f"no checkpoints under {' or '.join(roots)}"
        step, mgr = best
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(), meta=ocp.args.JsonRestore()
            ),
        )
        return restored["state"], restored["meta"]
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.join(step_dir, "state"))
    import json

    with open(os.path.join(meta_path, "metadata"), "r") as f:  # orbax json layout
        meta = json.load(f)
    return payload, meta


def _from_orbax(path: str):
    payload, meta = load_orbax_payload(path)
    return _bundle_from_payload(payload, meta)


def _bundle_from_payload(payload, meta):
    import dataclasses

    cfg = Config(**meta["config"])
    from urgent2026_challenge_track1_tpu.train.trainer import build_model

    bundle = build_model(cfg)
    # inference runs the recurrence matmuls in bfloat16 on TPU (f32
    # residual/state); float32 elsewhere — see _inference_dtype
    bundle = dataclasses.replace(
        bundle,
        model_cfg=dataclasses.replace(
            bundle.model_cfg, compute_dtype=_inference_dtype(),
            use_pallas_lstm=_use_pallas(),
        ),
    )
    params = payload.get("ema", None) if bundle.kind == "flowse" else None
    if params is None:
        params = payload["params"]
    return bundle.kind, params, bundle.model_cfg, bundle.stft_cfg


def load_model_for_inference(path: str):
    """Returns (kind, params, model_cfg, stft_cfg)."""
    if path.endswith((".ckpt", ".pt", ".pth")):
        return _from_torch(path)
    return _from_orbax(path)
