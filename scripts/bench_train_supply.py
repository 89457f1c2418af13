#!/bin/env python
"""Flagship 48 kHz training supply-vs-demand study (VERDICT r3 item 3).

The reference trains with ONLINE dynamic mixing feeding the GPU
(dataset.py:154-335, prepare_train_data.sh:103); round 3 measured host DM at
0.8-1.5 M audio samples/s on this 1-CPU host while the flagship step demands
~1.5-3.1 M samples/s — but only at 16 kHz and never end-to-end.  This script
measures, same-process at the flagship geometry (B=4, 2 s @ 48 kHz, 192 ch
x 6 layers, bf16):

  demand       the masked train step alone on a cached device batch
  presim       PreSimulatedDataset -> PrefetchLoader -> step
  host_dm      DynamicMixingDataset (wind + codec augs live) -> loader -> step
  device_dm    DynamicMixingSourceDataset -> collate_device_render ->
               render_on_device -> step (two dispatches; the r4 path)
  device_dm_fused
               same sources, but render FUSED into the jitted train step
               (trainer.make_train_step_rendered): ONE dispatch per step

Each leg reports a *blocking* end-to-end pass (loader wait vs device time
per step — clean attribution) AND a *pipelined* pass that mimics the
production trainer loop: no per-step block, device run-ahead bounded by
syncing every runahead_sync_steps=4 (Config default; the remote TPU worker
crashes when dispatch runs tens of steps ahead — CLAUDE.md).  VERDICT r4
item 2: the blocking numbers hid the real trainer rate (presim paid
~160 ms/step of tunnel dispatch+h2d latency that pipelining hides).

Wind (p=0.05) and codec (~25 % of items) stay LIVE in both DM legs (r4
item 6); the recipe fractions actually drawn are recorded per leg.

Usage: python scripts/bench_train_supply.py [--steps 24] [--cpu]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_sources(root: Path, fs: int, n_speech: int, seconds: int = 4):
    """Raw source pools (speech/noise/rir/wind) in the DM scp layout."""
    from urgent2026_challenge_track1_tpu.utils import audio_io
    from urgent2026_challenge_track1_tpu.utils.speech_synth import synth_speech

    rng = np.random.default_rng(0)
    rows = {"speech": [], "noise": [], "rir": [], "wind": []}

    def wav(name, data):
        p = root / name
        audio_io.write(str(p), data.astype(np.float32), fs)
        return str(p)

    for i in range(n_speech):
        sp = synth_speech(np.random.default_rng(100 + i), fs, seconds,
                          95.0 + 7 * (i % 12))
        rows["speech"].append((f"sp{i}", fs, wav(f"sp{i}.wav", sp)))
    for i in range(12):
        nz = rng.standard_normal(fs * seconds)
        for k in range(1, nz.size):  # 1/f-ish
            nz[k] += 0.5 * nz[k - 1]
        rows["noise"].append(
            (f"nz{i}", fs, wav(f"nz{i}.wav", 0.2 * nz / np.abs(nz).max()))
        )
    for i in range(6):
        L = int(0.3 * fs)
        rir = rng.standard_normal(L) * np.exp(-np.arange(L) / (0.05 * fs))
        rir[: int(0.002 * fs)] = 0.0
        rir[0] = 1.0
        rows["rir"].append((f"rir{i}", fs, wav(f"rir{i}.wav", rir)))
    for i in range(2):
        rows["wind"].append(
            (f"wind_noise{i}", fs,
             wav(f"wind{i}.wav", 0.2 * rng.standard_normal(fs * seconds)))
        )
    scps = {}
    for kind, rs in rows.items():
        p = root / f"{kind}.scp"
        with open(p, "w") as f:
            for uid, fs_, path in rs:
                print(uid, fs_, path, file=f)
        scps[kind] = str(p)
    with open(root / "length.scp", "w") as f:
        for uid, fs_, path in rows["speech"]:
            print(uid, fs * seconds, file=f)
    scps["length"] = str(root / "length.scp")
    return scps


def build_presim(root: Path, fs: int, n: int, seconds: int = 2):
    """Paired pre-simulated pool (spk1/wav/utt2fs/speech_length layout)."""
    from urgent2026_challenge_track1_tpu.utils import audio_io
    from urgent2026_challenge_track1_tpu.utils.speech_synth import synth_speech

    d = root / "presim"
    d.mkdir(parents=True, exist_ok=True)
    scps = {k: open(d / k, "w")
            for k in ("spk1.scp", "wav.scp", "utt2fs", "speech_length.scp")}
    rng = np.random.default_rng(7)
    for i in range(n):
        uid = f"ps{i}"
        clean = synth_speech(np.random.default_rng(200 + i), fs, seconds)
        noise = rng.standard_normal(clean.size).astype(np.float32)
        noisy = clean + 0.05 * noise
        cp, npth = d / f"{uid}_c.wav", d / f"{uid}_n.wav"
        audio_io.write(str(cp), clean, fs)
        audio_io.write(str(npth), noisy, fs)
        print(uid, cp.resolve(), file=scps["spk1.scp"])
        print(uid, npth.resolve(), file=scps["wav.scp"])
        print(uid, fs, file=scps["utt2fs"])
        print(uid, clean.size, file=scps["speech_length.scp"])
    for f in scps.values():
        f.close()
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24,
                    help="steps per end-to-end pass (per supply path)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--seconds", type=int, default=2)
    ap.add_argument("--num_workers", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke run (tiny model; plumbing check)")
    ap.add_argument("--out", type=str, default="train_supply_r5.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.data.dataset import (
        GroupedBatchSampler,
        PreSimulatedDataset,
        PrefetchLoader,
    )
    from urgent2026_challenge_track1_tpu.data.dynamic import DynamicMixingDataset
    from urgent2026_challenge_track1_tpu.data.dynamic_device import (
        DynamicMixingSourceDataset,
        collate_device_render,
        render_on_device,
    )
    from urgent2026_challenge_track1_tpu.dsp import stft as dsp
    from urgent2026_challenge_track1_tpu.models import bsrnn as M
    from urgent2026_challenge_track1_tpu.train import trainer as TR

    fs, B = args.fs, args.batch
    T = fs * args.seconds
    cdtype = "float32" if args.cpu else "bfloat16"
    cfg = Config(batch_size=B, compute_dtype=cdtype)
    mcfg = M.BSRNNConfig(
        input_dim=481, num_channel=16 if args.cpu else 192,
        num_layer=2 if args.cpu else 6, causal=False, compute_dtype=cdtype,
        use_pallas_lstm=jax.devices()[0].platform == "tpu",
    )
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    bundle = TR.ModelBundle("discriminative", mcfg, stft_cfg)
    optimizer = TR.make_optimizer(cfg)
    params0 = M.init_bsrnn(jax.random.PRNGKey(1), mcfg)
    opt0 = optimizer.init(params0)
    step = TR.make_train_step(bundle, optimizer, cfg, fs)
    key = jax.random.PRNGKey(0)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

    results = {"geometry": {"B": B, "fs": fs, "seconds": args.seconds,
                            "device": jax.devices()[0].platform}}

    # ---- demand: step alone on a cached batch ----
    rng = np.random.default_rng(0)
    clean_h = (rng.standard_normal((B, T)) * 0.1).astype(np.float32)
    noisy_h = clean_h + (rng.standard_normal((B, T)) * 0.03).astype(np.float32)
    lengths_h = np.asarray([T, T - 1711, T - 3000, T - 4801][:B]
                           + [T] * max(0, B - 4), np.int32)
    batch_dev = (jnp.asarray(clean_h), jnp.asarray(noisy_h),
                 jnp.asarray(lengths_h))
    p, o = copy(params0), copy(opt0)
    p, o, _, m = step(p, o, None, key, *batch_dev)
    jax.block_until_ready(m["loss"])
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        p, o, _, m = step(p, o, None, key, *batch_dev)
        jax.block_until_ready(m["loss"])
        ts.append(time.perf_counter() - t0)
    t_step = float(np.median(ts))
    demand_sps = float(lengths_h.sum()) / t_step
    results["demand"] = {"step_ms": round(t_step * 1e3, 1),
                         "samples_per_s": round(demand_sps)}
    print(f"demand: {t_step*1e3:.1f} ms/step -> {demand_sps/1e6:.2f} M samples/s")
    del p, o

    fused_steps = {}  # shape-keyed by jit; one builder per process

    def get_fused_step():
        if "fn" not in fused_steps:
            fused_steps["fn"] = TR.make_train_step_rendered(
                bundle, optimizer, cfg, fs
            )
        return fused_steps["fn"]

    recipe_counts = {}

    def counting(ds_cls, leg_name):
        """Wrap a DM dataset class so the wind/codec recipe draws actually
        taken during the run are recorded (r4 item 6: prove they are live)."""
        counts = recipe_counts.setdefault(
            leg_name, {"items": 0, "wind": 0, "codec": 0})

        class Counting(ds_cls):
            def _sample_recipe(self):
                use_wind, aug = super()._sample_recipe()
                counts["items"] += 1
                counts["wind"] += bool(use_wind)
                counts["codec"] += "codec" in aug
                return use_wind, aug

        return Counting

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        n_speech = max(args.steps * B + 2 * B, 32)
        scps = build_sources(td, fs, n_speech)
        presim_dir = build_presim(td, fs, n_speech)

        def presim_loader():
            ds = PreSimulatedDataset(
                str(presim_dir / "spk1.scp"), str(presim_dir / "wav.scp"),
                str(presim_dir / "utt2fs"),
                str(presim_dir / "speech_length.scp"), max_duration=T)
            samp = GroupedBatchSampler(ds, batch_size=B)
            return PrefetchLoader(ds, samp, num_workers=args.num_workers,
                                  use_processes=False)

        def host_dm_loader():
            ds = counting(DynamicMixingDataset, "host_dm")(
                speech_source_scp=scps["speech"],
                noise_source_scp=scps["noise"],
                rir_scp=scps["rir"],
                windnoise_scp=scps["wind"],
                speech_length_file=scps["length"],
                max_duration=T,
                use_high_pass=True,
            )
            samp = GroupedBatchSampler(ds, batch_size=B)
            # threads, not processes: the 1-CPU host (CLAUDE.md) — matches
            # what AudioDataModule picks here
            return PrefetchLoader(ds, samp, num_workers=args.num_workers,
                                  use_processes=False)

        def device_dm_loader(leg="device_dm"):
            ds = counting(DynamicMixingSourceDataset, leg)(
                speech_source_scp=scps["speech"],
                noise_source_scp=scps["noise"],
                rir_scp=scps["rir"],
                windnoise_scp=scps["wind"],
                speech_length_file=scps["length"],
                max_duration=T,
                use_high_pass=True,
            )
            samp = GroupedBatchSampler(ds, batch_size=B)
            return PrefetchLoader(ds, samp, num_workers=args.num_workers,
                                  use_processes=False,
                                  collate=collate_device_render)

        def to_dev_batch(item, fused):
            """item -> (step_fn, device_args).  Transfers dispatch async."""
            if isinstance(item, dict):
                if fused:
                    arrays = tuple(jnp.asarray(item[k]) for k in TR.RENDER_KEYS)
                    return get_fused_step(), arrays, item["lengths"]
                target, noisy = render_on_device(item, highpass=True, mesh=None)
                lens = jnp.asarray(np.asarray(item["lengths"], np.int32))
                return step, (target, noisy, lens), item["lengths"]
            clean, noisy_h, fs_, lens = item
            return step, (jnp.asarray(clean[:, 0]), jnp.asarray(noisy_h[:, 0]),
                          jnp.asarray(lens)), lens

        # leg -> (loader factory, fused render?)
        paths = {
            "presim": (presim_loader, False),
            "host_dm": (host_dm_loader, False),
            "device_dm": (lambda: device_dm_loader("device_dm"), False),
            "device_dm_fused": (lambda: device_dm_loader("device_dm_fused"),
                                True),
        }

        for name, (make_loader, fused) in paths.items():
            # ---- supply only: drain the loader, no training ----
            n_samples, n_utt, t0 = 0, 0, None
            for item in make_loader():
                if t0 is None:  # first batch warms the worker pool
                    t0 = time.perf_counter()
                    continue
                lens = item["lengths"] if isinstance(item, dict) else item[3]
                n_samples += int(np.sum(lens))
                n_utt += len(lens)
            dt = time.perf_counter() - t0
            supply_sps = n_samples / dt
            print(f"{name}: supply {supply_sps/1e6:.2f} M samples/s "
                  f"({n_utt} utts in {dt:.2f}s)")

            # ---- end-to-end BLOCKING: loader -> (render) -> step ----
            p, o = copy(params0), copy(opt0)
            t_wait = t_dev = 0.0
            done = 0
            e2e_samples = 0
            compiled = False
            t_e2e0 = None
            while done < args.steps:
                loader = make_loader()
                it = iter(loader)
                while done < args.steps:
                    tw0 = time.perf_counter()
                    try:
                        item = next(it)
                    except StopIteration:
                        break
                    tw1 = time.perf_counter()
                    step_fn, dev_batch, lens = to_dev_batch(item, fused)
                    p, o, _, m = step_fn(p, o, None, key, *dev_batch)
                    jax.block_until_ready(m["loss"])
                    td1 = time.perf_counter()
                    if not compiled:
                        # first step includes compile; restart the clock
                        compiled = True
                        t_e2e0 = time.perf_counter()
                        continue
                    t_wait += tw1 - tw0
                    t_dev += td1 - tw1
                    e2e_samples += int(np.sum(np.asarray(lens)))
                    done += 1
            t_e2e = time.perf_counter() - t_e2e0
            steps_s = done / t_e2e
            e2e_sps = e2e_samples / t_e2e
            results[name] = {
                "supply_samples_per_s": round(supply_sps),
                "e2e_steps_per_s": round(steps_s, 3),
                "e2e_samples_per_s": round(e2e_sps),
                "loader_wait_ms_per_step": round(1e3 * t_wait / done, 1),
                "device_ms_per_step": round(1e3 * t_dev / done, 1),
            }
            print(f"{name}: e2e {steps_s:.2f} steps/s "
                  f"({e2e_sps/1e6:.2f} M samples/s) — loader wait "
                  f"{1e3*t_wait/done:.0f} ms/step, device "
                  f"{1e3*t_dev/done:.0f} ms/step")

            # ---- end-to-end PIPELINED: the production-trainer loop ----
            # no per-step block; device run-ahead bounded at 4 dispatched
            # steps (Config.runahead_sync_steps — the trainer's backpressure
            # against the remote-worker crash, CLAUDE.md)
            p, o = copy(params0), copy(opt0)
            done = 0
            e2e_samples = 0
            t_pipe0 = None
            last_m = None
            while done < args.steps:
                loader = make_loader()
                it = iter(loader)
                while done < args.steps:
                    try:
                        item = next(it)
                    except StopIteration:
                        break
                    step_fn, dev_batch, lens = to_dev_batch(item, fused)
                    p, o, _, last_m = step_fn(p, o, None, key, *dev_batch)
                    if t_pipe0 is None:
                        # first step compiled above; start the clock at the
                        # first pipelined dispatch
                        t_pipe0 = time.perf_counter()
                    done += 1
                    e2e_samples += int(np.sum(np.asarray(lens)))
                    if done % 4 == 0:
                        jax.block_until_ready(last_m["loss"])
            jax.block_until_ready(last_m["loss"])
            t_pipe = time.perf_counter() - t_pipe0
            steps_s = done / t_pipe
            results[name]["pipelined_steps_per_s"] = round(steps_s, 3)
            results[name]["pipelined_samples_per_s"] = round(
                e2e_samples / t_pipe)
            results[name]["pipelined_ms_per_step"] = round(
                1e3 * t_pipe / done, 1)
            print(f"{name}: pipelined {steps_s:.2f} steps/s "
                  f"({1e3 * t_pipe / done:.0f} ms/step)")

        for leg, counts in recipe_counts.items():
            if counts["items"]:
                results.setdefault(leg, {})["recipes"] = {
                    "items": counts["items"],
                    "wind_frac": round(counts["wind"] / counts["items"], 4),
                    "codec_frac": round(counts["codec"] / counts["items"], 4),
                }

    Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
