#!/bin/env python
"""Seven-rate end-to-end CLI user journey (VERDICT r3 item 8).

Round 3's user journey covered 8/16/48 kHz; the band-truncation break
conditions and the GradDecoder overhang at 22.05/24/32/44.1 kHz only ran
through unit tests.  This drives the COMPLETE reference workflow — train a
checkpoint with ``train_se.py``, enhance with ``inference.py``, score with
``eval_all.sh``, group with ``get_breakdown.py`` — across ALL SEVEN
challenge sampling rates (reference fs set:
/root/reference/baseline_code/models/bsrnn_flowse.py:82-85, band layouts
truncated per fs), and prints a per-fs noisy-vs-enhanced score table
(native PESQ / ESTOI / SI-SNR).

Everything runs on CPU by default (no TPU required — the point of the
journey is the CLI path, not speed); pass --device tpu to run the training
leg on the chip.

Usage:
  python scripts/journey_7rates.py [--workdir DIR] [--epochs 60]
      [--hidden 48] [--layers 2] [--device cpu] [--report-only]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

RATES = (8000, 16000, 22050, 24000, 32000, 44100, 48000)
SECONDS = 2
N_TRAIN_PER_FS = 10
# The val loader keeps reference parity (drop_last=True, dataset.py:515),
# so each (fs, length) group needs >= batch_size (2) utterances or the
# whole group is dropped and validation runs empty (val_loss=inf -> null
# in metrics.jsonl, as in the r4 journey).  Final scores are unaffected
# (inference uses checkpoints_last), but live per-rate val curves need 2+.
N_VAL_PER_FS = 2
N_TEST_PER_FS = 2


def build_pools(work: Path):
    """Paired train/validation pools + a held-out 7-rate inference set with
    a simulation-style meta.tsv for get_breakdown."""
    from train_multifs_soak import colored_noise, mix_at_nominal_snr
    from urgent2026_challenge_track1_tpu.utils import audio_io
    from urgent2026_challenge_track1_tpu.utils.speech_synth import synth_speech

    marker = work / ".pool_done"
    # v4: joint 0.9-peak + spec-SNR mixing (v2 lacked peak norm; v1 mixed ~11 dB milder)
    if marker.exists():
        if marker.read_text().strip() != "v4":
            raise SystemExit(
                f"workdir {work} holds a stale pool (old mixing) — "
                "use a fresh --workdir")
        return
    splits = (("train", N_TRAIN_PER_FS), ("validation", N_VAL_PER_FS),
              ("test", N_TEST_PER_FS))
    meta_rows = []
    for split, n in splits:
        d = work / split
        d.mkdir(parents=True, exist_ok=True)
        scps = {k: open(d / k, "w")
                for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
        for fs in RATES:
            rng = np.random.default_rng(
                fs + {"train": 0, "validation": 71, "test": 1009}[split])
            for i in range(n):
                uid = f"fileid_{split[:2]}_{fs}_{i}"
                clean = synth_speech(rng, fs, SECONDS, 100 + 9 * (i % 12))
                snr_db = float(rng.uniform(2.0, 14.0))
                noise = colored_noise(rng, clean.size,
                                      0.5 + 0.3 * rng.random())
                clean, noisy = mix_at_nominal_snr(clean, noise, snr_db)
                cp, np_ = d / f"{uid}_c.wav", d / f"{uid}_n.wav"
                audio_io.write(str(cp), clean, fs)
                audio_io.write(str(np_), noisy, fs)
                print(uid, cp.resolve(), file=scps["spk1.scp"])
                print(uid, np_.resolve(), file=scps["wav.scp"])
                print(uid, fs, file=scps["utt2fs"])
                print(uid, clean.size, file=scps["speech_length.scp"])
                if split == "test":
                    meta_rows.append({
                        "id": uid, "fs": fs, "length": clean.size,
                        "snr_dB": round(snr_db, 2),
                        "speech_sid": f"synth_{uid}", "noise_uid": "synthnz",
                        "rir_uid": "none", "augmentation": "none",
                    })
        for f in scps.values():
            f.close()
    cols = ["id", "fs", "length", "snr_dB", "speech_sid", "noise_uid",
            "rir_uid", "augmentation"]
    with open(work / "test" / "meta.tsv", "w") as f:
        print("\t".join(cols), file=f)
        for row in meta_rows:
            print("\t".join(str(row[c]) for c in cols), file=f)
    # utt2lang / text for the (skipped-without-models) LID and WER legs
    with open(work / "test" / "utt2lang", "w") as f:
        for row in meta_rows:
            print(row["id"], "eng", file=f)
    with open(work / "test" / "text", "w") as f:
        for row in meta_rows:
            print(row["id"], "synthetic formant speech", file=f)
    marker.write_text("v4")


def run_cli(cmd, **kw):
    print("+", " ".join(str(c) for c in cmd), flush=True)
    subprocess.run([str(c) for c in cmd], check=True, **kw)


def score_table(work: Path, args) -> dict:
    """Per-fs noisy vs enhanced PESQ / ESTOI / SI-SNR (native metrics)."""
    from urgent2026_challenge_track1_tpu.metrics.pesq import pesq_metric
    from urgent2026_challenge_track1_tpu.metrics.stoi import stoi
    from urgent2026_challenge_track1_tpu.utils import audio_io

    def read_scp(p):
        return dict(line.split() for line in Path(p).read_text().splitlines())

    refs = read_scp(work / "test" / "spk1.scp")
    noisy = read_scp(work / "test" / "wav.scp")
    enh = read_scp(work / "enhanced" / "inf.scp")
    utt2fs = {u: int(v)
              for u, v in read_scp(work / "test" / "utt2fs").items()}

    def sisnr(ref, est):
        est = est[: ref.size]
        ref = ref[: est.size]
        a = np.dot(ref, est) / (np.dot(ref, ref) + 1e-12)
        e = est - a * ref
        return 10 * np.log10((a * a * np.dot(ref, ref) + 1e-12) /
                             (np.dot(e, e) + 1e-12))

    table = {}
    for uid, ref_path in refs.items():
        fs = utt2fs[uid]
        ref, _ = audio_io.read(ref_path)
        row = table.setdefault(fs, {"n": 0})
        row["n"] += 1
        for tag, scp in (("noisy", noisy), ("enh", enh)):
            est, _ = audio_io.read(scp[uid])
            m = min(ref.size, est.size)
            row.setdefault(f"pesq_{tag}", []).append(
                pesq_metric(ref[:m], est[:m], fs))
            row.setdefault(f"estoi_{tag}", []).append(
                stoi(ref[:m], est[:m], fs, extended=True))
            row.setdefault(f"sisnr_{tag}", []).append(sisnr(ref[:m], est[:m]))

    print(f"\n== 7-rate journey scores ({args.device}, "
          f"{N_TEST_PER_FS} utts/fs) ==")
    print(f"{'fs':>6}  {'PESQ n->e':>12}  {'ESTOI n->e':>13}  "
          f"{'SI-SNR n->e (dB)':>18}")
    out = {}
    for fs in sorted(table):
        r = table[fs]
        mm = lambda k: float(np.mean(r[k]))
        print(f"{fs:>6}  {mm('pesq_noisy'):5.2f}->{mm('pesq_enh'):5.2f}  "
              f"{mm('estoi_noisy'):5.3f}->{mm('estoi_enh'):6.3f}  "
              f"{mm('sisnr_noisy'):7.2f}->{mm('sisnr_enh'):8.2f}")
        out[fs] = {k: round(float(np.mean(v)), 4)
                   for k, v in r.items() if k != "n"}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default="/tmp/journey7")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--hidden", type=int, default=48)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--device", type=str, default="cpu")
    ap.add_argument("--out", type=str, default="journey7_r5.json")
    ap.add_argument("--report-only", action="store_true",
                    help="score existing outputs; skip train/infer/eval")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    build_pools(work)

    import yaml

    exp_dir = work / "exp" / "journey7"
    if not args.report_only:
        # ---- leg 1: train_se.py (real CLI, all seven rates grouped) ----
        base = yaml.safe_load(
            (REPO / "conf/models/BSRNN_baseline.yaml").read_text())
        base.update(
            train_set_path=str(work / "train"),
            valid_set_path=str(work / "validation"),
            device=args.device,
            batch_size=2,
            num_train_epochs=args.epochs,
            lr_step_size=25,
            val_check_interval=200,
            max_duration=48000 * SECONDS,
            num_worker=2,
            compute_dtype="bfloat16" if args.device == "tpu" else "float32",
            log_every_steps=20,
            save_top_k=2,
            bsrnn_hidden=args.hidden,
            num_layer=args.layers,
        )
        cfg_path = work / "journey7.yaml"
        cfg_path.write_text(yaml.safe_dump(base))
        run_cli([sys.executable, REPO / "train_se.py",
                 "--config_file", cfg_path], cwd=str(work))

        # ---- leg 2: inference.py over the 7-rate held-out set ----
        ckpts = sorted(exp_dir.glob("*/version_*/checkpoints_last"))
        if not ckpts:
            ckpts = sorted(exp_dir.glob("*/version_*/checkpoints"))
        run_cli([sys.executable, REPO / "inference.py",
                 "--input_scp", work / "test" / "wav.scp",
                 "--ckpt_path", ckpts[-1],
                 "--output_dir", work / "enhanced",
                 "--device", args.device, "--batch_size", "2"])

        # ---- leg 3: eval_all.sh on enhanced AND noisy (for the deltas) ----
        env = {**os.environ,
               "ref_scp": str(work / "test" / "spk1.scp"),
               "utt2lang": str(work / "test" / "utt2lang"),
               "text": str(work / "test" / "text"),
               "meta_tsv": str(work / "test" / "meta.tsv"),
               "nj": "2", "device": "cpu"}
        run_cli(["bash", REPO / "eval_all.sh"], cwd=str(REPO),
                env={**env, "inf_scp": str(work / "enhanced" / "inf.scp"),
                     "output_dir": str(work / "eval_enh")})
        run_cli(["bash", REPO / "eval_all.sh"], cwd=str(REPO),
                env={**env, "inf_scp": str(work / "test" / "wav.scp"),
                     "output_dir": str(work / "eval_noisy")})

    # ---- leg 4: per-fs table (the journey's deliverable) ----
    table = score_table(work, args)
    # sanity: every fs must actually have been enhanced (band truncation +
    # GradDecoder overhang exercised at all seven geometries)
    assert sorted(table) == sorted(RATES), sorted(table)
    # the eval_all breakdown grouped by fs must list all seven groups
    bd = next((work / "eval_enh" / "score" / "se").glob(
        "PESQ*.breakdown.txt"), None)
    if bd is not None:
        groups = [ln for ln in bd.read_text().splitlines()
                  if ln.startswith("[Group] fs=")]
        print(f"breakdown fs groups: {len(groups)}")
    Path(args.out).write_text(json.dumps(
        {"device": args.device, "epochs": args.epochs,
         "hidden": args.hidden, "layers": args.layers,
         "per_fs": {str(k): v for k, v in table.items()}}, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
