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

Selects the ``--top_k`` steps with the best stored ``--by`` metric —
lowest val_loss by default, or e.g. highest val_sisnr for runs trained
with ``checkpoint_metric: val_sisnr`` (or the explicit ``--steps``) —
averages ``params`` (and ``ema`` when present)
leaf-wise in float64, and writes a single-step orbax checkpoint that
``inference.py --ckpt_path <output>`` / ``serve.py`` load directly.
The averaged checkpoint is inference-only: the optimizer state is
deliberately dropped (resuming training from an average is not meaningful).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rank_value(meta: dict, by: str):
    """Stored metric value for ranking, or None if this step never saw it.

    Checkpoints written with ``Config.checkpoint_metric`` carry a
    ``meta["metrics"]`` dict; older checkpoints only have ``val_loss``.
    """
    v = meta.get("metrics", {}).get(by)
    if v is None and by == "val_loss":
        v = meta.get("val_loss")
    return None if v is None else float(v)


def average_checkpoints(ckpt_dir: str, output: str, top_k: int = 3,
                        steps=None, by: str = "val_loss") -> dict:
    """Returns a summary dict (selected steps, val losses, output path)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(str(Path(ckpt_dir).resolve()))
    all_steps = sorted(mgr.all_steps())
    if not all_steps:
        raise SystemExit(f"no checkpoints under {ckpt_dir}")

    # selection needs only the small JSON meta items, never the states
    metas = {
        s: mgr.restore(s, args=ocp.args.Composite(
            meta=ocp.args.JsonRestore()))["meta"]
        for s in all_steps
    }
    if steps:
        chosen = sorted(int(s) for s in steps)
        missing = [s for s in chosen if s not in all_steps]
        if missing:
            raise SystemExit(f"steps {missing} not in {all_steps}")
    else:
        ranked = [s for s in all_steps if _rank_value(metas[s], by) is not None]
        if not ranked:
            raise SystemExit(
                f"no checkpoint under {ckpt_dir} stores metric {by!r}")
        # losses rank ascending; SI-SNR-style metrics rank descending
        reverse = "sisnr" in by
        chosen = sorted(sorted(ranked, key=lambda s: _rank_value(metas[s], by),
                               reverse=reverse)[:top_k])

    # stream one state at a time into float64 running sums (a flagship
    # state incl. optimizer moments is large; never hold k of them)
    sums = {"params": None, "ema": None}
    dtypes = {}
    epoch = 0
    have_ema = True
    for s in chosen:
        state = mgr.restore(s, args=ocp.args.Composite(
            state=ocp.args.StandardRestore()))["state"]
        epoch = max(epoch, int(state.get("epoch", 0)))
        for kind_ in ("params", "ema"):
            tree = state.get(kind_)
            if tree is None:
                if kind_ == "ema":
                    have_ema = False
                continue
            if kind_ not in dtypes:
                dtypes[kind_] = jax.tree_util.tree_map(
                    lambda x: np.asarray(x).dtype, tree)
            acc = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), tree)
            sums[kind_] = acc if sums[kind_] is None else (
                jax.tree_util.tree_map(np.add, sums[kind_], acc))
        del state

    def finish(sum_tree, dtype_tree):
        k = float(len(chosen))
        return jax.tree_util.tree_map(
            lambda s_, d: (s_ / k).astype(d), sum_tree, dtype_tree)

    payload = {
        "params": finish(sums["params"], dtypes["params"]),
        "step": max(chosen),
        "epoch": epoch,
    }
    if have_ema and sums["ema"] is not None:
        payload["ema"] = finish(sums["ema"], dtypes["ema"])
    val_losses = [float(metas[s]["val_loss"]) for s in chosen]
    meta = {
        "val_loss": float(np.mean(val_losses)),
        "config": metas[chosen[0]]["config"],
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
    # host-side utility: averaging must not round-trip every leaf through
    # the remote-TPU tunnel (the sitecustomize pins JAX_PLATFORMS=axon;
    # this in-process override is the only reliable CPU route — CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True,
                    help="orbax manager root (e.g. .../checkpoints)")
    ap.add_argument("--output", default=None,
                    help="output manager root (default <ckpt_dir>_avg)")
    ap.add_argument("--top_k", type=int, default=3,
                    help="average the k best steps by --by")
    ap.add_argument("--by", default="val_loss",
                    help="ranking metric: val_loss (ascending) or a stored "
                         "checkpoint_metric like val_sisnr (descending)")
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="explicit steps to average (overrides --top_k)")
    args = ap.parse_args()

    out = args.output or args.ckpt_dir.rstrip("/") + "_avg"
    info = average_checkpoints(args.ckpt_dir, out, args.top_k, args.steps,
                               by=args.by)
    print(f"averaged steps {info['steps']} "
          f"(val_loss {['%.4f' % v for v in info['val_losses']]}) "
          f"-> {info['output']}")


if __name__ == "__main__":
    main()
