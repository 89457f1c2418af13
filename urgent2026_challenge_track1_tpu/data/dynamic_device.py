"""Dynamic mixing with on-device rendering: host loads sources + samples
parameters; the TPU renders the augmentation batch inside the train step.

Split of responsibilities (TPU-first redesign of the reference's
all-on-host DataLoader simulation, SURVEY.md §3.1):

  host (this module): scp pools, recipe sampling via simulation/params.py
    (same distributions, same wind/codec gating), audio decode, random
    noise offset fitting, RIR loading — all IO-bound;
  device (simulation/jax_dsp.render_batch): high-pass, reverb (full +
    early-RIR target), VAD-masked SNR mixing, bandwidth masks, clipping,
    packet loss, joint peak normalization — all compute-bound.

Wind-noise items keep the host path (sequential sidechain compressor),
arriving pre-rendered with identity device parameters.
"""

from __future__ import annotations

import re

import numpy as np

from urgent2026_challenge_track1_tpu.data.dynamic import DynamicMixingDataset
from urgent2026_challenge_track1_tpu.simulation import render as sim_render

__all__ = ["DeviceRenderBatch", "DynamicMixingSourceDataset", "collate_device_render"]

_PACKET_MS = 20


class DeviceRenderBatch(dict):
    """numpy struct consumed by simulation.jax_dsp.render_batch."""


class DynamicMixingSourceDataset(DynamicMixingDataset):
    """Per item: raw sources + recipe parameters (no DSP on host except the
    wind-noise path)."""

    rir_pad = 8000  # static RIR length (samples); real RIRs are cropped/padded

    def __getitem__(self, index):
        speech_fs, real_idx = self._get_from_index(index)
        speech_uid = self.speech_uids[speech_fs][real_idx]
        speech_path = self.speech_source[speech_fs][speech_uid]
        from urgent2026_challenge_track1_tpu.utils import audio_io

        speech_length = min(self.max_duration, audio_io.info_frames(speech_path))

        import urgent2026_challenge_track1_tpu.simulation.params as sim_params

        use_wind_noise, aug = self._sample_recipe()
        info = sim_params.sample_meta(
            self.cfg, speech_length, speech_fs,
            noise_dic=self.noise_source, used_noise_dic=None,
            wind_noise_dic=self.wind_noises, used_wind_noise_dic=None,
            use_wind_noise=use_wind_noise,
            snr_range=(self.cfg.snr_low_bound, self.cfg.snr_high_bound),
            wind_noise_snr_range=(
                self.cfg.wind_noise_config["wind_noise_snr_low_bound"],
                self.cfg.wind_noise_config["wind_noise_snr_high_bound"],
            ),
            rir_dic=self.rirs, used_rir_dic=None, augmentations=aug,
        )
        info["speech_uid"] = speech_uid
        info["id"] = speech_uid
        info["snr_dB"] = info["snr"]

        if info["noise_uid"].startswith("wind_noise") or "codec" in info["augmentation"]:
            # host-render path: the wind sidechain compressor is sequential
            # and the codec round-trip (libavcodec) is inherently host-side;
            # both would otherwise be silently dropped from the device chain
            clean, noisy, fs = sim_render.render_one(
                info, speech_dic=self.speech_source_flt,
                noise_dic=self.all_noise_flt, rir_dic=self.rirs_flt,
                highpass=self.use_high_pass, on_the_fly=True,
                max_duration=self.max_duration,
            )
            return {
                "prerendered": True, "clean": clean[0], "noisy": noisy[0],
                "fs": fs, "length": clean.shape[-1],
            }

        rng = np.random.default_rng()
        speech = sim_render.read_audio(
            speech_path, force_1ch=True, fs=speech_fs,
            max_duration=self.max_duration, rng=rng,
        )[0][0]
        noise = sim_render.read_audio(
            self.all_noise_flt[info["noise_uid"]], force_1ch=True, fs=speech_fs,
            max_duration=self.max_duration, rng=rng,
        )[0][0]
        T = speech.shape[-1]
        # fit noise length on host (random wrap/crop, renderer :107-119)
        if len(noise) < T:
            off = rng.integers(0, T - len(noise))
            noise = np.pad(noise, (off, T - len(noise) - off), mode="wrap")
        elif len(noise) > T:
            off = rng.integers(0, len(noise) - T)
            noise = noise[off : off + T]

        rir = np.zeros(self.rir_pad, np.float64)
        use_rir = 0.0
        if info["rir_uid"] != "none":
            r = sim_render.read_audio(
                self.rirs_flt[info["rir_uid"]], force_1ch=True, fs=speech_fs
            )[0][0][: self.rir_pad]
            rir[: len(r)] = r
            use_rir = 1.0
        else:
            rir[0] = 1.0  # identity impulse

        params = {
            "snr_db": float(info["snr_dB"]), "use_rir": use_rir,
            **parse_augmentation_ops(info["augmentation"], speech_fs),
        }
        return {
            "prerendered": False, "speech": speech, "noise": noise, "rir": rir,
            "fs": speech_fs, "length": T, **params,
        }


def parse_augmentation_ops(augmentation: str, fs: int) -> dict:
    """Device-op parameters + per-item op order from the sampled chain.

    Order codes: 0=bandwidth, 1=clipping, 2=packet loss; the augmentation
    string lists the ops in the SAMPLED chain order the host renderer would
    apply (simulate_data_from_param.py:529-570).  Absent ops get identity
    parameters and canonical-order slots.  A chain that repeats an op type
    (last occurrence wins the parameters) is de-duplicated so ``aug_order``
    always has exactly 3 entries — the fixed-shape collate requires it.
    """
    params = {
        "clip_lo": 0.0, "clip_hi": 1.0, "bw_fs_new": fs, "lost_packets": [],
    }
    order = []
    for a in augmentation.split("/"):
        if a.startswith("bandwidth_limitation"):
            m = re.fullmatch(r"bandwidth_limitation-(.*)->(\d+)", a)
            params["bw_fs_new"] = int(m.group(2))
            order.append(0)
        elif a.startswith("clipping"):
            m = re.fullmatch(r"clipping\(min=(.*),max=(.*)\)", a)
            params["clip_lo"], params["clip_hi"] = float(m.group(1)), float(m.group(2))
            order.append(1)
        elif a.startswith("packet_loss"):
            m = re.fullmatch(
                r"packet_loss\(packet_loss_indices=(.*),packet_duration_ms=(.*)\)", a
            )
            import ast

            params["lost_packets"] = ast.literal_eval(m.group(1))
            order.append(2)
    order = list(dict.fromkeys(order))
    params["aug_order"] = order + [i for i in (0, 1, 2) if i not in order]
    return params


def collate_device_render(items, pad_quantum_ms: int = 1000) -> DeviceRenderBatch:
    """Assemble a DeviceRenderBatch (numpy) from source items; prerendered
    (wind) items pass through with identity device parameters."""
    from urgent2026_challenge_track1_tpu.data.dataset import bucket_length

    fs = items[0]["fs"]
    assert all(it["fs"] == fs for it in items)
    B = len(items)
    T = bucket_length(max(it["length"] for it in items), fs, pad_quantum_ms)
    rir_len = max(
        (it["rir"].shape[-1] for it in items if not it["prerendered"]), default=1
    )
    n_packets = T // (_PACKET_MS * fs // 1000)
    n_bins = T // 2 + 1

    out = DeviceRenderBatch(
        speech=np.zeros((B, T), np.float32),
        noise=np.zeros((B, T), np.float32),
        rir=np.zeros((B, rir_len), np.float32),
        snr_db=np.zeros(B, np.float32),
        use_rir=np.zeros(B, np.float32),
        clip_lo=np.zeros(B, np.float32),
        clip_hi=np.ones(B, np.float32),
        packet_mask=np.ones((B, max(n_packets, 1)), np.float32),
        bw_mask=np.ones((B, n_bins), np.float32),
        aug_order=np.tile(np.arange(3, dtype=np.int32), (B, 1)),
        prerendered_mask=np.zeros(B, np.float32),
        clean_pre=np.zeros((B, T), np.float32),
        noisy_pre=np.zeros((B, T), np.float32),
        fs=fs,
        lengths=np.asarray([it["length"] for it in items], np.int32),
    )
    freqs = np.fft.rfftfreq(T, 1.0 / fs)
    for j, it in enumerate(items):
        L = it["length"]
        if it["prerendered"]:
            out["prerendered_mask"][j] = 1.0
            out["clean_pre"][j, :L] = it["clean"]
            out["noisy_pre"][j, :L] = it["noisy"]
            out["rir"][j, 0] = 1.0
            out["snr_db"][j] = 100.0  # mixing no-op (noise scaled to ~0)
            continue
        out["speech"][j, :L] = it["speech"]
        out["noise"][j, :L] = it["noise"]
        out["rir"][j, : it["rir"].shape[-1]] = it["rir"]
        out["snr_db"][j] = it["snr_db"]
        out["use_rir"][j] = it["use_rir"]
        out["clip_lo"][j] = it["clip_lo"]
        out["clip_hi"][j] = it["clip_hi"]
        out["aug_order"][j] = it["aug_order"]
        for p in it["lost_packets"]:
            if p < out["packet_mask"].shape[1]:
                out["packet_mask"][j, p] = 0.0
        if it["bw_fs_new"] < fs:
            out["bw_mask"][j] = (freqs <= it["bw_fs_new"] / 2).astype(np.float32)
    return out


_RENDER_JIT = None  # module-level: one jit wrapper, shape-keyed cache inside


def _get_render_jit():
    global _RENDER_JIT
    if _RENDER_JIT is None:
        import functools

        import jax

        from urgent2026_challenge_track1_tpu.simulation.jax_dsp import render_batch

        @functools.partial(jax.jit, static_argnames=("fs", "highpass"))
        def _render(speech, noise, rir, snr_db, use_rir, clip_lo, clip_hi,
                    packet_mask, bw_mask, aug_order, pre_mask, clean_pre,
                    noisy_pre, lengths, fs, highpass):
            target, noisy = render_batch(
                speech, noise, rir, snr_db, use_rir, clip_lo, clip_hi,
                packet_mask, bw_mask, fs=fs, highpass=highpass, lengths=lengths,
                aug_order=aug_order,
            )
            m = pre_mask[:, None]
            return (
                (1 - m) * target + m * clean_pre,
                (1 - m) * noisy + m * noisy_pre,
            )

        _RENDER_JIT = _render
    return _RENDER_JIT


def render_on_device(batch: DeviceRenderBatch, highpass: bool = True, mesh=None):
    """Run jax_dsp.render_batch and merge pre-rendered (wind/codec) items.

    With ``mesh`` the batch arrays are placed batch-sharded over ``dp`` first
    so rendering and the subsequent train step stay SPMD.  The jitted program
    is a module-level singleton — re-wrapping per call would re-trace the
    augmentation graph on every training batch."""
    import jax.numpy as jnp

    keys = [
        "speech", "noise", "rir", "snr_db", "use_rir", "clip_lo", "clip_hi",
        "packet_mask", "bw_mask", "aug_order", "prerendered_mask", "clean_pre",
        "noisy_pre", "lengths",
    ]
    arrays = [batch[k] for k in keys]
    if mesh is not None:
        from urgent2026_challenge_track1_tpu.parallel import shard_batch

        arrays = list(shard_batch(mesh, tuple(arrays)))
    else:
        arrays = [jnp.asarray(a) for a in arrays]

    return _get_render_jit()(*arrays, fs=batch["fs"], highpass=highpass)
