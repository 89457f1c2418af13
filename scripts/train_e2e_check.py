#!/bin/env python
"""End-to-end on-chip learning check through the real user surface.

Builds a synthetic speech/noise/RIR/wind source pool, then runs the actual
``train_se.py`` CLI path (dynamic mixing — with the codec augmentation live
now that the libavcodec shim exists — GroupedBatchSampler, jitted bf16 train
step with Pallas kernels, orbax checkpoints, JSONL metrics) for a few
hundred steps on whatever platform jax picks (the real TPU by default), and
prints the train/val SI-SNR trajectory.

Usage: python scripts/train_e2e_check.py [epochs] [workdir] [model]
  epochs  default 40 (~480 steps at the built pool size / batch 4)
  model   "baseline" (discriminative, default), "flowse" (CFM generative),
          or "baseline-device" (discriminative with on-device rendering:
          dynamic_mixing_on_device=True, the TPU-first augmentation path)
"""

import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from urgent2026_challenge_track1_tpu.utils import audio_io


def speechlike(rng, fs, seconds, f0):
    """Formant-synthesized pseudo-speech (utils/speech_synth.py) — real
    syllabic rhythm + formant structure so ESTOI/PESQ discriminate."""
    from urgent2026_challenge_track1_tpu.utils.speech_synth import synth_speech

    return synth_speech(rng, fs, seconds, f0)


def build_train_sources(root: Path, fs=16000, seconds=4, n_speech=48):
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)

    def save(name, data):
        p = root / name
        audio_io.write(str(p), data, fs)
        return p.resolve()

    speech, noise, rirs, wind = [], [], [], []
    for i in range(n_speech):
        speech.append((f"sp{i}", save(f"sp{i}.wav", speechlike(rng, fs, seconds, 110 + 7 * i))))
    for i in range(8):
        n = rng.standard_normal(fs * seconds)
        # coloured noise: one-pole lowpass with varying cutoff
        a = 0.6 + 0.04 * i
        for k in range(1, n.size):
            n[k] += a * n[k - 1]
        noise.append((f"nz{i}", save(f"nz{i}.wav", (0.1 * n / np.abs(n).max()).astype(np.float32))))
    for i in range(4):
        rir = np.zeros(3200, np.float32)
        rir[8] = 1.0
        rir[300 + 150 * i] = 0.5
        rir[900 + 200 * i] = 0.2
        rirs.append((f"rir{i}", save(f"rir{i}.wav", rir)))
    wind.append(("wind_noise0", save("wind0.wav", (0.1 * rng.standard_normal(fs * seconds)).astype(np.float32))))

    def scp(name, rows):
        with open(root / name, "w") as f:
            for uid, p in rows:
                print(uid, fs, p, file=f)

    scp("speech_sources.scp", speech)
    scp("noise_scoures.scp", noise)  # reference-compatible filename (sic)
    scp("rirs.scp", rirs)
    scp("wind_noise_scoures.scp", wind)
    with open(root / "source_length.scp", "w") as f:
        for uid, _ in speech:
            print(uid, fs * seconds, file=f)
    return fs, seconds


def build_valid_pairs(root: Path, fs=16000, seconds=4, n=8):
    rng = np.random.default_rng(99)
    root.mkdir(parents=True, exist_ok=True)
    scps = {k: open(root / k, "w") for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
    for i in range(n):
        clean = speechlike(rng, fs, seconds, 120 + 11 * i)
        noisy = clean + (0.08 * rng.standard_normal(clean.size)).astype(np.float32)
        cp, np_ = root / f"v{i}_clean.wav", root / f"v{i}_noisy.wav"
        audio_io.write(str(cp), clean, fs)
        audio_io.write(str(np_), noisy, fs)
        print(f"v{i}", cp.resolve(), file=scps["spk1.scp"])
        print(f"v{i}", np_.resolve(), file=scps["wav.scp"])
        print(f"v{i}", fs, file=scps["utt2fs"])
        print(f"v{i}", clean.size, file=scps["speech_length.scp"])
    for f in scps.values():
        f.close()


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    work = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(tempfile.mkdtemp(prefix="e2e_"))
    model = sys.argv[3] if len(sys.argv) > 3 else "baseline"
    if model not in ("baseline", "flowse", "baseline-device"):
        raise SystemExit(f"unknown model {model!r}: baseline | flowse | baseline-device")
    fs, seconds = build_train_sources(work / "train_sources")
    build_valid_pairs(work / "validation")

    os.chdir(work)  # exp/ lands under the workdir
    repo = Path(__file__).resolve().parent.parent
    import train_se  # noqa: E402  (repo root is on sys.path)
    import yaml  # noqa: E402

    # YAML wins over flags (reference config precedence, config.py:41-52),
    # so derive a config file with this run's paths from the chosen baseline
    src_yaml = (
        "conf/models/BSRNN_flowse.yaml" if model == "flowse"
        else "conf/models/BSRNN_baseline_dm.yaml"
    )
    base = yaml.safe_load((repo / src_yaml).read_text())
    if model == "flowse":
        base.update(train_set_dynamic_mixing=True, batch_size=4)
    if model == "baseline-device":
        base.update(dynamic_mixing_on_device=True)
    base.update(
        train_set_path=str(work / "train_sources"),
        valid_set_path=str(work / "validation"),
        num_train_epochs=epochs,
        val_check_interval=200,
        max_duration=fs * seconds,
        num_worker=2,
        compute_dtype="bfloat16",
        log_every_steps=20,
        save_top_k=2,
    )
    cfg_path = work / "e2e_check.yaml"  # train_tag derives from the basename
    cfg_path.write_text(yaml.safe_dump(base))
    state = train_se.main(["--config_file", str(cfg_path)])
    print(f"finished at step {state.step}")

    # most recent run: the workdir may hold earlier runs of other models
    # (train_name differs per model family)
    jsonl = max(
        (work / "exp/e2e_check").glob("*/version_0/metrics.jsonl"),
        key=lambda p: p.stat().st_mtime,
    )
    train_pts, val_pts, loss_pts = [], [], []
    for line in jsonl.read_text().splitlines():
        rec = json.loads(line)
        if "train_sisnr" in rec:
            train_pts.append((rec["step"], rec["train_sisnr"]))
        if "train_loss" in rec:
            loss_pts.append((rec["step"], rec["train_loss"]))
        if "val_sisnr" in rec:
            val_pts.append((rec["step"], rec["val_sisnr"]))
    show = lambda pts: " ".join(f"{s}:{v:.2f}" for s, v in pts)
    print("train loss:", show(loss_pts[:3] + loss_pts[-3:]))
    print("train SI-SNR:", show(train_pts[:3] + train_pts[-3:]))
    print("val SI-SNR:", show(val_pts[-6:]))
    if len(loss_pts) >= 2:
        print(f"loss {loss_pts[0][1]:.3f} -> {loss_pts[-1][1]:.3f}; workdir: {work}")


if __name__ == "__main__":
    main()
