#!/bin/env python
"""Flowse overfit-to-memorization falsifier (VERDICT r4 item 1a).

The generative leg has never decisively beaten its noisy input at in-image
scale; PARITY attributes that to the families' sample-efficiency gap at
reduced geometry, but nothing separates "needs scale/data" from "subtle
defect in the CFM target / sigma-schedule / EMA / sampler chain".  This
script is the separating experiment: train flowse on a TINY fixed pool
(default 6 utterances, one fs, v4 spec-SNR + 0.9-peak mixing) until it
memorizes.  Conditional flow matching can always memorize a point mass —
for a fixed (x0, y) pair the optimal vector field is the closed-form
transport VF*(x,t,y) = (y - x0) + (sigma_max - sigma_min) (x - mean_t)/std_t,
so a correct implementation MUST drive the N=10 Euler sampler (validation
parity, reference flow_model.py:220-230) decisively above the noisy input
on SI-SNR / PESQ / ESTOI.  If it cannot, the machinery is defective.

Scores BOTH the EMA weights (inference parity) and the raw online weights,
so an EMA-chain defect is separable from a loss/sampler defect.

Usage:
  python scripts/flow_overfit.py                       # TPU, 192x4 geometry
  python scripts/flow_overfit.py --device cpu --hidden 48 --layers 2 \
      --steps 2500                                     # cheap CPU falsifier
  python scripts/flow_overfit.py --report-only         # rescore latest ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from train_multifs_soak import (  # noqa: E402
    colored_noise,
    latest_step,
    mix_at_nominal_snr,
    speechlike,
)

from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402

FS = 16000


def build_pool(root: Path, n: int, seconds: float):
    """n fixed (clean, noisy) pairs at decisive SNRs; train scp == val scp."""
    marker = root / ".pool_done"
    stamp = f"overfit-v4:{n}:{seconds}"
    if marker.exists():
        if marker.read_text().strip() != stamp:
            raise SystemExit(f"stale pool in {root}; use a fresh --workdir")
        return
    d = root / "pool"
    d.mkdir(parents=True, exist_ok=True)
    scps = {k: open(d / k, "w")
            for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
    rng = np.random.default_rng(13)
    for i in range(n):
        uid = f"ov_{i}"
        clean = speechlike(rng, FS, seconds, 98 + 13 * (i % 9))
        snr_db = 4.0 + i  # 4..(4+n-1) dB: decisively degraded inputs
        noise = colored_noise(rng, clean.size, 0.55 + 0.05 * (i % 5))
        clean, noisy = mix_at_nominal_snr(clean, noise, snr_db)
        cp, npth = d / f"{uid}_c.wav", d / f"{uid}_n.wav"
        audio_io.write(str(cp), clean, FS)
        audio_io.write(str(npth), noisy.astype(np.float32), FS)
        print(uid, cp.resolve(), file=scps["spk1.scp"])
        print(uid, npth.resolve(), file=scps["wav.scp"])
        print(uid, FS, file=scps["utt2fs"])
        print(uid, clean.size, file=scps["speech_length.scp"])
    for f in scps.values():
        f.close()
    marker.write_text(stamp)


def load_pool(root: Path):
    d = root / "pool"
    uids, cleans, noisys = [], [], []
    for line in (d / "spk1.scp").read_text().splitlines():
        uid, path = line.split()
        uids.append(uid)
        cleans.append(audio_io.read(path)[0])
        noisys.append(audio_io.read(str(d / f"{uid}_n.wav"))[0])
    return uids, np.stack(cleans).astype(np.float32), np.stack(noisys).astype(np.float32)


def score(tag, clean, est, rows):
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.metrics.pesq import pesq_metric
    from urgent2026_challenge_track1_tpu.metrics.stoi import stoi
    from urgent2026_challenge_track1_tpu.train.losses import si_snr

    n = clean.shape[0]
    row = {
        "which": tag,
        "si_snr": round(float(np.mean(np.asarray(
            si_snr(jnp.asarray(clean), jnp.asarray(est))))), 3),
        "pesq_wb": round(float(np.mean(
            [pesq_metric(clean[i], est[i], FS) for i in range(n)])), 3),
        "estoi": round(float(np.mean(
            [stoi(clean[i], est[i], FS, extended=True) for i in range(n)])), 4),
    }
    print(row, flush=True)
    rows.append(row)
    return row


def evaluate(workdir: Path, out_path: str, grid=(10, 4), scale_norm=True):
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat evals skip the tunnel compile
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
    from urgent2026_challenge_track1_tpu.utils.checkpoint import (
        load_model_for_inference,
        load_orbax_payload,
    )

    ckpt_dirs = sorted(workdir.glob("exp/overfit_flowse/*/version_0/checkpoints"))
    assert ckpt_dirs, f"no checkpoints under {workdir}"
    ckpt = str(ckpt_dirs[-1])
    uids, clean, noisy = load_pool(workdir)
    lengths = jnp.full((clean.shape[0],), clean.shape[1], jnp.int32)
    rows = []
    score("noisy-input", clean, noisy, rows)

    kind, ema_params, cfg, _ = load_model_for_inference(ckpt)
    assert kind == "flowse", kind

    # ORACLE ceiling: a perfectly-trained CFM sampler's endpoint is exactly
    # x0 + sigma_min*z in the compressed-spec domain ((x-mean)/std is
    # conserved along the optimal flow; the final Euler step integrates the
    # linear sigma(t) exactly).  This row is what "memorized" can at best
    # look like — scale-dependent, since the hiss is fixed while the
    # compressed signal scales with input peak (round-5 finding).
    from urgent2026_challenge_track1_tpu.dsp import stft as dsp
    from urgent2026_challenge_track1_tpu.models.odes import complex_normal_like

    x0 = dsp.stft_encode(jnp.asarray(clean), FS, cfg.stft_cfg)
    z = complex_normal_like(jax.random.PRNGKey(0), x0)
    oracle = np.asarray(dsp.stft_decode(
        x0 + cfg.sigma_min * z, FS, cfg.stft_cfg, length=clean.shape[-1]))
    score(f"oracle-x0+sigma_min*z({cfg.sigma_min})", clean, oracle, rows)
    payload, _ = load_orbax_payload(ckpt)
    variants = [("ema", ema_params)]
    if "params" in payload:
        variants.append(("raw", payload["params"]))
    for name, params in variants:
        for N in grid:
            fn = jax.jit(lambda p, k, x, N=N: FM.flowse_enhance(
                p, cfg, k, x, FS, N=N, solver="euler", lengths=lengths,
                scale_norm=scale_norm))
            est = np.asarray(fn(params, jax.random.PRNGKey(0), jnp.asarray(noisy)))
            score(f"{name}-euler-N{N}", clean, est, rows)

    result = {
        "pool": {"n": int(clean.shape[0]), "fs": FS,
                 "seconds": clean.shape[1] / FS},
        "ckpt": ckpt, "step": latest_step(workdir / "exp" / "overfit_flowse"),
        "rows": rows,
    }
    noisy_snr = rows[0]["si_snr"]
    oracle_snr = next(r["si_snr"] for r in rows if r["which"].startswith("oracle"))
    best = max((r for r in rows[1:] if not r["which"].startswith("oracle")),
               key=lambda r: r["si_snr"])
    result["verdict"] = {
        "beats_noisy_si_snr_db": round(best["si_snr"] - noisy_snr, 3),
        "gap_to_oracle_db": round(oracle_snr - best["si_snr"], 3),
        "best_row": best["which"],
        "memorized": bool(best["si_snr"] > noisy_snr + 3.0),
    }
    Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps(result["verdict"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--workdir", type=str, default="/tmp/flow_overfit")
    ap.add_argument("--device", type=str, default="tpu", choices=("tpu", "cpu"))
    ap.add_argument("--hidden", type=int, default=192)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--restart-seconds", type=int, default=1500)
    ap.add_argument("--out", type=str, default="flow_overfit_r5.json")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--no-scale-norm", action="store_true",
                    help="evaluate with flowse_enhance(scale_norm=False) — "
                         "for checkpoints trained on pre-v4 (non-0.9-peak) "
                         "pools, whose training distribution the default "
                         "input normalization would mismatch")
    args = ap.parse_args()

    work = Path(args.workdir)
    exp_dir = work / "exp" / "overfit_flowse"
    if args.report_only:
        if args.device == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        evaluate(work, args.out, scale_norm=not args.no_scale_norm)
        return
    build_pool(work, args.n, args.seconds)

    import yaml

    base = yaml.safe_load((REPO / "conf/models/BSRNN_flowse.yaml").read_text())
    base.update(
        train_set_path=str(work / "pool"),
        valid_set_path=str(work / "pool"),  # train == val: memorization run
        batch_size=args.batch_size,
        num_train_epochs=10**9,
        learning_rate=args.lr,
        lr_step_size=10**6,  # constant lr: memorize, don't anneal
        val_check_interval=min(500, max(20, args.steps // 8)),
        max_duration=int(FS * args.seconds),
        num_worker=2,
        compute_dtype="bfloat16" if args.device == "tpu" else "float32",
        device=args.device,
        log_every_steps=25,
        save_top_k=1,
        bsrnn_hidden=args.hidden,
        num_layer=args.layers,
        train_name="overfit_flowse",
    )
    cfg_path = work / "overfit_flowse.yaml"
    cfg_path.write_text(yaml.safe_dump(base))

    t0 = time.time()
    restart = stall = 0
    while True:
        step = latest_step(exp_dir)
        if step >= args.steps:
            break
        restart += 1
        print(f"[overfit] restart {restart}: step {step}/{args.steps}, "
              f"{time.time() - t0:.0f}s elapsed", flush=True)
        r = subprocess.run(
            ["timeout", str(args.restart_seconds), sys.executable,
             str(REPO / "train_se.py"), "--config_file", str(cfg_path)],
            cwd=str(work),
            env={**os.environ, "JAX_CACHE_DIR": str(work / "jax_cache")},
        )
        progressed = latest_step(exp_dir) > step
        stall = 0 if progressed else stall + 1
        if r.returncode not in (0, 124):
            print(f"[overfit] rc={r.returncode} (stall {stall}/4); retrying",
                  flush=True)
            if stall >= 4:
                break
            continue
        if not progressed and r.returncode == 0:
            break
    print(f"[overfit] trained to step {latest_step(exp_dir)} "
          f"({time.time() - t0:.0f}s)", flush=True)
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    evaluate(work, args.out, scale_norm=not args.no_scale_norm)


if __name__ == "__main__":
    main()
