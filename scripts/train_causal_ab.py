#!/bin/env python
"""Causal-vs-noncausal quality A/B on the real TPU.

Trains the SAME discriminative BSRNN twice on the same 16 kHz pool with the
same seed — arm "offline" (bidirectional time LSTM + GroupNorm, the
reference default) vs arm "streaming" (``causal: true, streaming_norm:
true``, the configuration the real-time runtime serves) — then scores both
final checkpoints with the native SI-SNR / PESQ-wb / ESTOI suite on a
held-out synthetic set.  This quantifies what the 30 ms-latency streaming
path costs in quality, the number the reference never measured (its
``causal`` switch exists, models/bsrnn_flowse.py:199, but its GroupNorm
spans the full utterance so the flag was never stream-servable).

The causal arm's checkpoint is additionally pushed through
``StreamingSession`` to prove the TRAINED weights stream exactly
(streamed == offline forward).

Reuses the restart-bounded driver pattern of train_multifs_soak (the axon
tunnel leaks host RSS; remote-worker crashes are retried).

Usage:
  python scripts/train_causal_ab.py [--steps 4000] [--workdir /tmp/causal_ab]
      [--report-only]   # score existing checkpoints, no training
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

from train_flowse_soak import build_pool  # noqa: E402  (16 kHz paired pool)
from train_multifs_soak import latest_step  # noqa: E402

FS = 16000
SECONDS = 3
N_UTTS = 8

# arm name -> model_configs overrides on top of the baseline YAML
ARMS = {
    "offline": {},
    "streaming": {"causal": True, "streaming_norm": True},
}


def score_set():
    """Held-out scoring utterances (disjoint seeds from the training pool)."""
    from train_multifs_soak import colored_noise, mix_at_nominal_snr, speechlike

    rng = np.random.default_rng(9)
    cleans, noisys = [], []
    for i in range(N_UTTS):
        c = speechlike(rng, FS, SECONDS, 103 + 12 * i)
        snr = 2.0 + 2.0 * i  # 2..16 dB
        n = colored_noise(rng, c.size, 0.6)
        noisys.append(mix_at_nominal_snr(c, n, snr))
        cleans.append(c)
    return np.stack(cleans), np.stack(noisys).astype(np.float32)


def run_arm(work: Path, cfg_path: Path, exp_dir: Path, steps: int,
            restart_seconds: int) -> None:
    t0 = time.time()
    restart = stall = 0
    while True:
        step = latest_step(exp_dir)
        if step >= steps:
            break
        restart += 1
        print(f"[{cfg_path.stem}] restart {restart}: step {step}/{steps}, "
              f"{time.time() - t0:.0f}s elapsed", flush=True)
        r = subprocess.run(
            ["timeout", str(restart_seconds), sys.executable,
             str(REPO / "train_se.py"), "--config_file", str(cfg_path)],
            cwd=str(work),
            env={**os.environ, "JAX_CACHE_DIR": str(work / "jax_cache")},
        )
        progressed = latest_step(exp_dir) > step
        stall = 0 if progressed else stall + 1
        if r.returncode not in (0, 124):
            print(f"[{cfg_path.stem}] rc={r.returncode} (stall {stall}/4)",
                  flush=True)
            if stall >= 4:
                raise SystemExit(f"{cfg_path.stem}: no progress in 4 restarts")
            continue
        if not progressed and r.returncode == 0:
            break
    print(f"[{cfg_path.stem}] done at step {latest_step(exp_dir)} "
          f"({time.time() - t0:.0f}s)", flush=True)


def ckpt_dir(exp_dir: Path) -> Path:
    for name in ("checkpoints_last", "checkpoints"):
        hits = sorted(exp_dir.glob(f"*/version_*/{name}"))
        if hits and any(p.is_dir() for p in sorted(hits[-1].iterdir())):
            return hits[-1]
    raise SystemExit(f"no checkpoints under {exp_dir}")


def score_arm(path: Path, clean: np.ndarray, noisy: np.ndarray) -> dict:
    import jax
    import jax.numpy as jnp

    from urgent2026_challenge_track1_tpu.metrics.pesq import pesq_metric
    from urgent2026_challenge_track1_tpu.metrics.stoi import stoi
    from urgent2026_challenge_track1_tpu.models.bsrnn import bsrnn_se_apply
    from urgent2026_challenge_track1_tpu.train.losses import si_snr
    from urgent2026_challenge_track1_tpu.utils.checkpoint import (
        load_model_for_inference,
    )

    kind, params, cfg, stft_cfg = load_model_for_inference(str(path))
    assert kind == "discriminative", kind
    lengths = jnp.full((noisy.shape[0],), noisy.shape[1], jnp.int32)
    fn = jax.jit(lambda p, x: bsrnn_se_apply(
        p, cfg, stft_cfg, x, FS, lengths=lengths)[0])
    est = np.asarray(fn(params, jnp.asarray(noisy)))
    row = {
        "si_snr": round(float(np.mean(np.asarray(
            si_snr(jnp.asarray(clean), jnp.asarray(est))))), 3),
        "pesq_wb": round(float(np.mean(
            [pesq_metric(clean[i], est[i], FS) for i in range(len(clean))])), 3),
        "estoi": round(float(np.mean(
            [stoi(clean[i], est[i], FS, extended=True)
             for i in range(len(clean))])), 4),
        "causal": bool(cfg.causal),
    }
    if cfg.causal and cfg.streaming_norm:
        # the trained weights must stream exactly (parity of the runtime the
        # causal arm exists for)
        from urgent2026_challenge_track1_tpu.models.streaming_causal import (
            StreamingSession,
        )

        sess = StreamingSession(params, cfg, stft_cfg, FS, batch=1,
                                chunk_frames=8)
        streamed = sess.process(noisy[:1])
        offline = np.asarray(fn(params, jnp.asarray(noisy))[:1])
        row["stream_max_abs"] = float(np.max(np.abs(streamed - offline)))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--workdir", type=str, default="/tmp/causal_ab")
    ap.add_argument("--restart-seconds", type=int, default=1200)
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--out", type=str, default="causal_ab.json")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    import yaml

    base = yaml.safe_load((REPO / "conf/models/BSRNN_baseline.yaml").read_text())
    cfgs = {}
    for arm, overrides in ARMS.items():
        cfg = dict(base)
        cfg.update(
            train_set_path=str(work / "train"),
            valid_set_path=str(work / "validation"),
            batch_size=2,
            num_train_epochs=100000,
            # stretched per-epoch StepLR for tiny soak epochs (PARITY.md)
            lr_step_size=25,
            val_check_interval=500,
            max_duration=96000,
            num_worker=2,
            compute_dtype="bfloat16",
            log_every_steps=10,
            save_top_k=2,
            model_configs={**base["model_configs"], **overrides},
        )
        p = work / f"causal_ab_{arm}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        cfgs[arm] = p

    if not args.report_only:
        build_pool(work)
        for arm, cfg_path in cfgs.items():
            run_arm(work, cfg_path, work / "exp" / cfg_path.stem,
                    args.steps, args.restart_seconds)

    clean, noisy = score_set()
    results = {"steps": {}, "arms": {}}
    # noisy-input floor for context
    from urgent2026_challenge_track1_tpu.metrics.pesq import pesq_metric
    from urgent2026_challenge_track1_tpu.metrics.stoi import stoi

    results["arms"]["noisy_input"] = {
        "si_snr": round(float(np.mean([
            10 * np.log10(np.sum(clean[i] ** 2) /
                          np.sum((noisy[i] - clean[i]) ** 2))
            for i in range(len(clean))])), 3),
        "pesq_wb": round(float(np.mean(
            [pesq_metric(clean[i], noisy[i], FS) for i in range(len(clean))])), 3),
        "estoi": round(float(np.mean(
            [stoi(clean[i], noisy[i], FS, extended=True)
             for i in range(len(clean))])), 4),
    }
    for arm, cfg_path in cfgs.items():
        exp_dir = work / "exp" / cfg_path.stem
        results["steps"][arm] = latest_step(exp_dir)
        results["arms"][arm] = score_arm(ckpt_dir(exp_dir), clean, noisy)
        print(arm, results["arms"][arm], flush=True)
    out = Path(args.out)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
