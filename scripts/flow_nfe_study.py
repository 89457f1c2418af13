#!/bin/env python
"""Flow sampler quality-per-NFE study (VERDICT r2 item 6).

Scores euler/midpoint/heun at N in {4, 8, 15} grid steps with the native
PESQ / ESTOI / SI-SNR suite on a synthetic val set, using a TRAINED flowse
checkpoint (e.g. from scripts/train_flowse_soak steps of train_multifs_soak
or any orbax run dir).  Cost accounting: midpoint/heun evaluate the vector
field twice per grid step, so their NFE is 2N (reference solver definitions,
sampling/odesolvers.py:71-107).

Usage:
  python scripts/flow_nfe_study.py --ckpt exp/.../checkpoints [--device tpu]
  python scripts/flow_nfe_study.py --random   # plumbing check, untrained
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FS = 16000
SECONDS = 3
N_UTTS = 8
SOLVERS = ("euler", "midpoint", "heun")
GRID_NS = (4, 8, 15)
EVALS_PER_STEP = {"euler": 1, "midpoint": 2, "heun": 2}


def val_set():
    sys.path.insert(0, str(REPO / "scripts"))
    from train_multifs_soak import colored_noise, mix_at_nominal_snr, speechlike

    rng = np.random.default_rng(5)
    cleans, noisys = [], []
    for i in range(N_UTTS):
        c = speechlike(rng, FS, SECONDS, 105 + 13 * i)
        snr = 2.0 + 2.0 * i  # 2..16 dB
        n = colored_noise(rng, c.size, 0.6)
        c, ny = mix_at_nominal_snr(c, n, snr)
        noisys.append(ny)
        cleans.append(c)
    return np.stack(cleans), np.stack(noisys).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--device", type=str, default="tpu")
    ap.add_argument("--out", type=str, default="flow_nfe_study.json")
    ap.add_argument("--grid", type=str, default="",
                    help="comma list of grid Ns (default 4,8,15)")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM

    if args.random:
        cfg = FM.FlowSEConfig(bsrnn_hidden=48, num_layer=2)
        params = FM.init_flowse(jax.random.PRNGKey(0), cfg)
    else:
        from urgent2026_challenge_track1_tpu.utils.checkpoint import (
            load_model_for_inference,
        )

        kind, params, cfg, _ = load_model_for_inference(args.ckpt)
        assert kind == "flowse", kind

    from urgent2026_challenge_track1_tpu.metrics.pesq import pesq_metric
    from urgent2026_challenge_track1_tpu.metrics.stoi import stoi
    from urgent2026_challenge_track1_tpu.train.losses import si_snr

    grid = [int(n) for n in args.grid.split(",") if n] or list(GRID_NS)
    clean, noisy = val_set()
    lengths = jnp.full((N_UTTS,), clean.shape[1], jnp.int32)
    # noisy-input baseline row: without it the artifact cannot show whether
    # enhancement beats the unprocessed input on each metric
    noisy_base = {
        "solver": "noisy-input", "grid_N": 0, "nfe": 0,
        "si_snr": round(float(np.mean(np.asarray(
            si_snr(jnp.asarray(clean), jnp.asarray(noisy))))), 3),
        "pesq_wb": round(float(np.mean(
            [pesq_metric(clean[i], noisy[i], FS) for i in range(N_UTTS)])), 3),
        "estoi": round(float(np.mean(
            [stoi(clean[i], noisy[i], FS, extended=True)
             for i in range(N_UTTS)])), 4),
    }
    print(noisy_base, flush=True)
    rows = []
    for solver in SOLVERS:
        for N in grid:
            fn = jax.jit(lambda p, k, x, N=N, s=solver: FM.flowse_enhance(
                p, cfg, k, x, FS, N=N, solver=s, lengths=lengths))
            out = fn(params, jax.random.PRNGKey(0), jnp.asarray(noisy))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fn(params, jax.random.PRNGKey(0), jnp.asarray(noisy))
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            est = np.asarray(out)
            sisnr = float(np.mean(np.asarray(si_snr(jnp.asarray(clean), jnp.asarray(est)))))
            pesqs = [pesq_metric(clean[i], est[i], FS) for i in range(N_UTTS)]
            estois = [stoi(clean[i], est[i], FS, extended=True) for i in range(N_UTTS)]
            row = {
                "solver": solver, "grid_N": N,
                "nfe": N * EVALS_PER_STEP[solver],
                "si_snr": round(sisnr, 3),
                "pesq_wb": round(float(np.mean(pesqs)), 3),
                "estoi": round(float(np.mean(estois)), 4),
                "wall_s": round(dt, 3),
                "rtf": round(N_UTTS * SECONDS / dt, 1),
            }
            rows.append(row)
            print(row, flush=True)
    # quality-per-NFE winner: highest PESQ, ties broken by fewer NFE
    best = max(rows, key=lambda r: (r["pesq_wb"], -r["nfe"]))
    print("\nrecommended (solver, grid_N):", best["solver"], best["grid_N"],
          f"(NFE {best['nfe']}, PESQ {best['pesq_wb']}, SI-SNR {best['si_snr']})")
    Path(args.out).write_text(json.dumps(
        {"noisy_input": noisy_base, "rows": rows, "best": best}, indent=1))


if __name__ == "__main__":
    main()
