#!/bin/env python
"""Multi-fs convergence soak on the real TPU (VERDICT r2 item 2).

Runs the REAL ``train_se.py`` CLI in the real GroupedBatchSampler regime —
three sampling rates mixed in one run (one compiled program per (fs, T)
bucket, fs-grouped batches interleaved by the epoch-seeded sampler) — for
``target_steps`` steps, restart-bounded: the axon TPU tunnel leaks host RSS
per dispatch (see CLAUDE.md), so the trainer subprocess is restarted every
``--restart-seconds`` and auto-resumes from the latest orbax checkpoint
(mid-epoch fast-forward included).  Per-fs validation SI-SNR
(``val_sisnr_{fs}``, reference d_model.py:82-87) is printed as a curve at
the end.

Usage:
  python scripts/train_multifs_soak.py [--steps 20000] [--workdir DIR]
      [--restart-seconds 1200] [--report-only]
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

from urgent2026_challenge_track1_tpu.utils import audio_io  # noqa: E402

SAMPLE_RATES = (8000, 16000, 48000)  # default; --rates overrides (the full
#                                      challenge set is 8000,16000,22050,
#                                      24000,32000,44100,48000)
SECONDS = 2
N_TRAIN_PER_FS = 120
N_VAL_PER_FS = 4


def speechlike(rng, fs, seconds, f0):
    """Formant-synthesized pseudo-speech (utils/speech_synth.py) — replaced
    round 4: the old harmonic-complex-under-global-envelope signal kept
    ESTOI at its ~0.35 floor (VERDICT r3 weak #2); the synthesizer's
    syllabic rhythm + per-band envelope diversity makes every downstream
    quality study (soaks, NFE study, causal A/B) carry real ESTOI signal."""
    from urgent2026_challenge_track1_tpu.utils.speech_synth import synth_speech

    return synth_speech(rng, fs, seconds, f0)


def colored_noise(rng, n, pole):
    x = rng.standard_normal(n)
    for k in range(1, n):
        x[k] += pole * x[k - 1]
    return (x / np.abs(x).max()).astype(np.float32)


def mix_at_nominal_snr(clean, noise, snr_db):
    """Host-spec SNR mixing + reference joint peak normalization.  Returns
    the (clean, noisy) PAIR, both scaled by the same factor.

    Mixing: powers over non-silent regions on BOTH sides (simulation/dsp.py
    mix_noise, mirroring the reference's mix).  The v2 pools scaled
    max-normalized noise by the active-speech STD instead, which landed
    ~11 dB milder than the nominal label; v3 mixed so nominal == effective.

    Normalization (v4): the reference renderer jointly scales every pair so
    max(|noisy|, |clean|, |noise|) peaks at 0.9
    (simulate_data_from_param.py:575-589) — its whole training/eval universe
    is 0.9-peak.  The v3 pools skipped this (clean peaked at the ~0.3
    synthesizer scale), which silently crippled the GENERATIVE leg: the CFM
    sampler's quality ceiling is x0 + sigma_min*z in the compressed-spec
    domain, whose hiss is fixed while the signal scales with input peak —
    ~4.6 dB SI-SNR oracle floor at 0.3 peak vs ~12.5 dB at 0.9 peak
    (round-5 falsifier, flow_overfit_r5.json).  SNR itself is
    scale-invariant, so v3 conclusions about nominal-vs-effective SNR stand."""
    from urgent2026_challenge_track1_tpu.simulation.dsp import mix_noise

    noisy, noise_scaled = mix_noise(clean[None, :].astype(np.float64),
                                    noise[None, :].astype(np.float64),
                                    float(snr_db))
    noisy = noisy[0]
    scale = 0.9 / max(np.abs(noisy).max(), np.abs(clean).max(),
                      np.abs(noise_scaled).max(), 1e-6)
    return ((clean * scale).astype(np.float32),
            (noisy * scale).astype(np.float32))


def build_pool(root: Path, rates=SAMPLE_RATES):
    """Pre-simulated paired pools across the requested sampling rates."""
    done_marker = root / ".pool_done"
    # v4: joint 0.9 peak normalization (see mix_at_nominal_snr); v3 was
    # spec-SNR mixing without it; v2 mixed ~11 dB milder than nominal.
    # Stale pools are refused.
    stamp = "v4:" + ",".join(str(r) for r in rates)
    if done_marker.exists():
        have = done_marker.read_text().strip()
        if have != stamp:
            raise SystemExit(
                f"workdir {root} holds a pool built for rates [{have}]; "
                f"requested [{stamp}] — use a fresh --workdir")
        return
    for split, n in (("train", N_TRAIN_PER_FS), ("validation", N_VAL_PER_FS)):
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        scps = {k: open(d / k, "w")
                for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
        for fs in rates:
            rng = np.random.default_rng(fs + (0 if split == "train" else 777))
            for i in range(n):
                uid = f"{split[:2]}_{fs}_{i}"
                clean = speechlike(rng, fs, SECONDS, 100 + 9 * (i % 25))
                snr_db = rng.uniform(0.0, 15.0)
                noise = colored_noise(rng, clean.size, 0.5 + 0.3 * rng.random())
                clean, noisy = mix_at_nominal_snr(clean, noise, snr_db)
                cp, np_ = d / f"{uid}_c.wav", d / f"{uid}_n.wav"
                audio_io.write(str(cp), clean, fs)
                audio_io.write(str(np_), noisy.astype(np.float32), fs)
                print(uid, cp.resolve(), file=scps["spk1.scp"])
                print(uid, np_.resolve(), file=scps["wav.scp"])
                print(uid, fs, file=scps["utt2fs"])
                print(uid, clean.size, file=scps["speech_length.scp"])
        for f in scps.values():
            f.close()
    done_marker.write_text(stamp)


def latest_step(exp_dir: Path) -> int:
    best = 0
    for jsonl in exp_dir.glob("*/version_0/metrics.jsonl"):
        for line in jsonl.read_text().splitlines():
            try:
                best = max(best, json.loads(line).get("step", 0))
            except json.JSONDecodeError:
                pass
    return best


def report(exp_dir: Path):
    curves = {}
    losses = []
    for jsonl in sorted(exp_dir.glob("*/version_0/metrics.jsonl")):
        for line in jsonl.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            for k, v in rec.items():
                if k.startswith("val_sisnr_"):
                    curves.setdefault(k, []).append((rec["step"], v))
            if "train_loss" in rec:
                losses.append((rec["step"], rec["train_loss"]))
    if losses:
        print(f"train_loss: {losses[0][1]:.4f} (step {losses[0][0]}) -> "
              f"{losses[-1][1]:.4f} (step {losses[-1][0]})")
    for k in sorted(curves):
        pts = curves[k]
        shown = pts if len(pts) <= 10 else pts[:3] + pts[-7:]
        print(k + ":", " ".join(f"{s}:{v:.2f}" for s, v in shown))
    nan_free = all(np.isfinite(v) for pts in curves.values() for _, v in pts)
    print("NaN-free:", nan_free)
    return curves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--workdir", type=str, default="/tmp/multifs_soak")
    ap.add_argument("--restart-seconds", type=int, default=1200)
    ap.add_argument("--rates", type=str, default="",
                    help="comma-separated sampling rates for the pool "
                         "(default 8000,16000,48000; pass all seven to "
                         "exercise every STFT geometry)")
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()

    work = Path(args.workdir)
    exp_dir = work / "exp" / "soak_multifs"
    if args.report_only:
        report(exp_dir)
        return
    rates = tuple(int(r) for r in args.rates.split(",") if r) or SAMPLE_RATES
    build_pool(work, rates)

    import yaml

    base = yaml.safe_load((REPO / "conf/models/BSRNN_baseline.yaml").read_text())
    base.update(
        train_set_path=str(work / "train"),
        valid_set_path=str(work / "validation"),
        train_set_dynamic_mixing=False,
        # B=2 default: with one compiled program per fs resident, the 48 kHz
        # step's peak HBM at B=4 crashes the 16 GB worker (round-3
        # finding; B=2 interleaves all three programs stably).  The
        # reference notes ~14 GB at batch=2 for this model, too.  With all
        # seven rates resident, drop to --batch_size 1.
        batch_size=args.batch_size,
        num_train_epochs=100000,   # bounded by --steps below, not epochs
        # the reference's per-epoch StepLR (gamma 0.85) assumes real epoch
        # sizes; this soak's epochs are ~180 steps, so the unscaled schedule
        # froze the 21.6k-step round-3 run at lr~3e-12 after ~10k steps.
        # Stretch the decay interval to keep lr meaningful over a soak.
        lr_step_size=25,
        # checkpoint often: remote-worker crashes must not erase progress
        val_check_interval=200,
        max_duration=96000,        # no cropping: pool clips are 2 s
        num_worker=2,
        compute_dtype="bfloat16",
        log_every_steps=1,
        save_top_k=2,
    )
    cfg_path = work / "soak_multifs.yaml"
    cfg_path.write_text(yaml.safe_dump(base))

    t0 = time.time()
    restart = 0
    stall = 0  # consecutive restarts with no step progress
    while True:
        step = latest_step(exp_dir)
        if step >= args.steps:
            break
        restart += 1
        print(f"[soak] restart {restart}: step {step}/{args.steps}, "
              f"{time.time() - t0:.0f}s elapsed", flush=True)
        # bounded subprocess: auto-resume picks up the newest checkpoint
        r = subprocess.run(
            ["timeout", str(args.restart_seconds), sys.executable,
             str(REPO / "train_se.py"), "--config_file", str(cfg_path)],
            cwd=str(work),
            env={**os.environ, "JAX_CACHE_DIR": str(work / "jax_cache")},
        )
        progressed = latest_step(exp_dir) > step
        stall = 0 if progressed else stall + 1
        if r.returncode not in (0, 124):  # 124 = timeout(1) expiry
            # remote-TPU tunnel errors are often transient; retry until the
            # run stalls repeatedly at the same step
            print(f"[soak] trainer exited rc={r.returncode} "
                  f"(stall {stall}/4); retrying", flush=True)
            if stall >= 4:
                print("[soak] no progress across 4 failed restarts; stopping")
                break
            continue
        if not progressed and r.returncode == 0:
            print("[soak] no progress and clean exit (epochs done?); stopping")
            break
    print(f"[soak] done at step {latest_step(exp_dir)} after {restart} restarts, "
          f"{time.time() - t0:.0f}s")
    report(exp_dir)


if __name__ == "__main__":
    main()
