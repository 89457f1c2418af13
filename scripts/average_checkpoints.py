#!/bin/env python
"""Average saved checkpoints into one inference checkpoint.

Additive capability (no reference counterpart — the reference serves the
single best val_loss checkpoint, ``train_se.py:19-32``): parameter
averaging over the best-k checkpoints is standard speech-recipe practice
(espnet2's ``average_nbest_models``) and usually buys a few tenths of a dB
over the single best model at zero inference cost.

Usage:
  python scripts/average_checkpoints.py --ckpt_dir exp/.../checkpoints \
      [--top_k 3 | --steps 12000 16000 20000] [--output .../checkpoints_avg]

Selects the ``--top_k`` steps with the lowest stored val_loss (or the
explicit ``--steps``), averages ``params`` (and ``ema`` when present)
leaf-wise in float64, and writes a single-step orbax checkpoint that
``inference.py --ckpt_path <output>`` / ``serve.py`` load directly.
The averaged checkpoint is inference-only: the optimizer state is
deliberately dropped (resuming training from an average is not meaningful).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def average_checkpoints(ckpt_dir: str, output: str, top_k: int = 3,
                        steps=None) -> dict:
    """Returns a summary dict (selected steps, val losses, output path)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(str(Path(ckpt_dir).resolve()))
    all_steps = sorted(mgr.all_steps())
    if not all_steps:
        raise SystemExit(f"no checkpoints under {ckpt_dir}")

    def load(step):
        r = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(), meta=ocp.args.JsonRestore()
        ))
        return r["state"], r["meta"]

    if steps:
        chosen = sorted(int(s) for s in steps)
        missing = [s for s in chosen if s not in all_steps]
        if missing:
            raise SystemExit(f"steps {missing} not in {all_steps}")
        loaded = [load(s) for s in chosen]
    else:
        loaded = [load(s) for s in all_steps]
        order = sorted(range(len(all_steps)),
                       key=lambda i: loaded[i][1]["val_loss"])[:top_k]
        chosen = [all_steps[i] for i in sorted(order)]
        loaded = [loaded[i] for i in sorted(order)]

    def mean_trees(trees):
        return jax.tree_util.tree_map(
            lambda *xs: np.mean(np.stack([np.asarray(x, np.float64)
                                          for x in xs]), axis=0)
            .astype(np.asarray(xs[0]).dtype),
            *trees,
        )

    payload = {
        "params": mean_trees([s["params"] for s, _ in loaded]),
        "step": max(chosen),
        "epoch": max(int(s.get("epoch", 0)) for s, _ in loaded),
    }
    if all(s.get("ema") is not None for s, _ in loaded):
        payload["ema"] = mean_trees([s["ema"] for s, _ in loaded])
    val_losses = [float(m["val_loss"]) for _, m in loaded]
    meta = {
        "val_loss": float(np.mean(val_losses)),
        "config": loaded[0][1]["config"],
        "averaged_steps": chosen,
        "averaged_val_losses": val_losses,
    }
    out = ocp.CheckpointManager(
        str(Path(output).resolve()),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
    )
    out.save(max(chosen), args=ocp.args.Composite(
        state=ocp.args.StandardSave(payload), meta=ocp.args.JsonSave(meta)
    ))
    out.wait_until_finished()
    return {"steps": chosen, "val_losses": val_losses, "output": output}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True,
                    help="orbax manager root (e.g. .../checkpoints)")
    ap.add_argument("--output", default=None,
                    help="output manager root (default <ckpt_dir>_avg)")
    ap.add_argument("--top_k", type=int, default=3,
                    help="average the k lowest-val_loss steps")
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="explicit steps to average (overrides --top_k)")
    args = ap.parse_args()

    out = args.output or args.ckpt_dir.rstrip("/") + "_avg"
    info = average_checkpoints(args.ckpt_dir, out, args.top_k, args.steps)
    print(f"averaged steps {info['steps']} "
          f"(val_loss {['%.4f' % v for v in info['val_losses']]}) "
          f"-> {info['output']}")


if __name__ == "__main__":
    main()
