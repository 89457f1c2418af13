#!/bin/env python
"""Export a TPU-trained orbax checkpoint to the reference's torch Lightning
format — the inverse of utils/convert.py, completing TWO-WAY migration.

The output uses the released-checkpoint layout (reference ``readme.md:92-95``;
``se_model.bsrnn.bsrnn.*`` keys for the discriminative SEModel, ``dnn.*`` keys
plus a torch_ema ``ema`` record for FlowSEModel), so the reference's
``baseline_code/inference.py:30-33`` checkpoint sniffing consumes it
unchanged — as does this repo's own ``inference.py --ckpt_path model.ckpt``.

    python scripts/export_to_torch.py \
        --ckpt exp/bsrnn/checkpoints --out bsrnn.ckpt

Accepts an orbax manager root (latest step) or a single step directory.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True,
                        help="orbax checkpoint: manager root or step dir")
    parser.add_argument("--out", required=True, help="output .ckpt path")
    args = parser.parse_args(argv)

    import jax

    try:
        # conversion is pure host work — never touch an attached TPU
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.train.trainer import build_model
    from urgent2026_challenge_track1_tpu.utils import export_torch
    from urgent2026_challenge_track1_tpu.utils.checkpoint import load_orbax_payload

    payload, meta = load_orbax_payload(args.ckpt)
    cfg = Config(**meta["config"])
    bundle = build_model(cfg)
    export_cfg = (bundle.model_cfg.dnn_cfg if bundle.kind == "flowse"
                  else bundle.model_cfg)
    # Lightning's load_from_checkpoint instantiates the reference model as
    # cls(**hyper_parameters) with cfg attribute access (d_model.py:13-20,
    # flow_model.py:18-60).  Our Config mirrors the reference field names, so
    # a stdlib Namespace of the full config dict (picklable on any machine —
    # no import of this repo needed at load time) satisfies both families;
    # model_configs must be a concrete dict for BSRNN_SE(**model_configs).
    hparams_cfg = dict(meta["config"])
    if bundle.kind == "discriminative":
        hparams_cfg["model_configs"] = {
            "num_channel": bundle.model_cfg.num_channel,
            "num_layer": bundle.model_cfg.num_layer,
        }
    export_torch.save_lightning_ckpt(
        args.out,
        bundle.kind,
        payload["params"],
        export_cfg,
        ema_params=payload.get("ema"),
        step=int(payload.get("step", 0)),
        epoch=int(payload.get("epoch", 0)),
        hyper_parameters={"cfg": argparse.Namespace(**hparams_cfg)},
    )
    import torch

    ckpt = torch.load(args.out, map_location="cpu", weights_only=False)
    n_keys = len(ckpt["state_dict"])
    ema_note = " + ema record" if "ema" in ckpt else ""
    print(f"exported {bundle.kind} checkpoint (step {ckpt['global_step']}, "
          f"{n_keys} state_dict keys{ema_note}) -> {args.out}")


if __name__ == "__main__":
    main()
