#!/bin/env python
"""Non-intrusive DNSMOS OVRL (reference calculate_nonintrusive_dnsmos.py).

Scores with the Microsoft DNS-Challenge ONNX predictors (sig_bak_ovr.onnx +
model_v8.onnx).  Native inference pipeline: 9.01 s windows, 120-band log-mel
for the P808 model, raw waveform for the primary model, polynomial MOS
mapping, averaged over hops.
"""

import numpy as np

from _backends import BackendUnavailable, load_dnsmos
from _shared import audio_io, base_parser, read_pairs, shard, write_results
from urgent2026_challenge_track1_tpu.simulation.dsp import resample

METRICS = ("OVRL",)
INPUT_LENGTH = 9.01
FS = 16000


def _poly_fit(sig, bak, ovr):
    """DNSMOS P835 polynomial mapping (from the DNS-Challenge recipe)."""
    p_ovr = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
    p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
    p_bak = np.poly1d([-0.13166888, 1.60915514, -0.39604546])
    return p_sig(sig), p_bak(bak), p_ovr(ovr)


def _logmel(audio, fs=FS, n_mels=120):
    from urgent2026_challenge_track1_tpu.dsp.stft import stft
    import jax.numpy as jnp

    frame, hop = 320 + 1, 160
    spec = np.abs(np.asarray(stft(jnp.asarray(audio[None]), 320, 160)))[0]
    n_bins = spec.shape[-1]
    mel = _mel_matrix(fs, 320, n_mels)
    melspec = spec**2 @ mel.T
    return (np.log10(np.maximum(melspec, 1e-10)) + 1e-10).astype(np.float32)


def _mel_matrix(fs, n_fft, n_mels):
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, fs / 2, n_bins)
    mels = np.linspace(hz2mel(0), hz2mel(fs / 2), n_mels + 2)
    pts = mel2hz(mels)
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / max(c - lo, 1e-9)
        down = (hi - freqs) / max(hi - c, 1e-9)
        weights[i] = np.maximum(0, np.minimum(up, down))
    return weights


def score_one(sessions, audio, fs):
    primary, p808 = sessions
    if fs != FS:
        audio = resample(audio[None], fs, FS, "soxr_hq")[0]
    need = int(INPUT_LENGTH * FS)
    while len(audio) < need:
        audio = np.concatenate([audio, audio])
    num_hops = int(np.floor(len(audio) / FS) - INPUT_LENGTH) + 1
    hop_len = FS
    ovrl = []
    for i in range(max(num_hops, 1)):
        seg = audio[int(i * hop_len) : int(i * hop_len) + need]
        if len(seg) < need:
            break
        inp = np.array(seg, np.float32)[None]
        oi = {"input_1": inp}
        mos_sig_raw, mos_bak_raw, mos_ovr_raw = primary.run(None, oi)[0][0]
        _, _, mos_ovr = _poly_fit(mos_sig_raw, mos_bak_raw, mos_ovr_raw)
        ovrl.append(mos_ovr)
    return float(np.mean(ovrl))


def main(args):
    pairs = read_pairs(args)
    pairs, suffix = shard(pairs, args)
    sessions = load_dnsmos(args.primary_model, args.p808_model, args.device)
    ret = []
    for uid, path in pairs:
        audio, fs = audio_io.read(path)
        ret.append((uid, {"OVRL": score_one(sessions, audio, fs)}))
    write_results(args.output_dir, METRICS, ret, suffix)


if __name__ == "__main__":
    parser = base_parser()
    parser.add_argument("--primary_model", type=str, default="./DNSMOS/sig_bak_ovr.onnx")
    parser.add_argument("--p808_model", type=str, default="./DNSMOS/model_v8.onnx")
    parser.add_argument("--convert_to_torch", type=bool, default=False)
    try:
        main(parser.parse_args())
    except BackendUnavailable as e:
        raise SystemExit(f"ERROR: {e}")
