"""STFT/iSTFT parity vs torch.stft/torch.istft (the reference's backend)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from urgent2026_challenge_track1_tpu.dsp import stft as dsp

FS_GEOMS = [
    (48000, 960, 480),
    (44100, 882, 441),
    (32000, 640, 320),
    (24000, 480, 240),
    (22050, 441, 220),
    (16000, 320, 160),
    (8000, 160, 80),
]


def _torch_stft(x, n_fft, hop):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        normalized=False,
        onesided=True,
        return_complex=True,
    ).transpose(-1, -2)


@pytest.mark.parametrize("fs,n_fft,hop", FS_GEOMS)
def test_stft_matches_torch(fs, n_fft, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, fs // 2)).astype(np.float32)
    ours = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop))
    ref = _torch_stft(x, n_fft, hop).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3 * np.abs(ref).max())


@pytest.mark.parametrize("fs,n_fft,hop", FS_GEOMS[:3] + FS_GEOMS[-2:])
def test_istft_matches_torch(fs, n_fft, hop):
    rng = np.random.default_rng(1)
    T = fs // 2
    x = rng.standard_normal((1, T)).astype(np.float32)
    spec = _torch_stft(x, n_fft, hop)
    ref = torch.istft(
        spec.transpose(-1, -2),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        length=T,
    ).numpy()
    ours = np.asarray(
        dsp.istft(jnp.asarray(spec.numpy()), n_fft, hop, length=T)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("fs", [48000, 22050, 16000])
def test_roundtrip(fs):
    cfg = dsp.STFTConfig(n_fft=960, hop_length=480, default_fs=48000)
    rng = np.random.default_rng(2)
    T = fs // 2
    x = jnp.asarray(rng.standard_normal((3, T)).astype(np.float32))
    spec = dsp.stft_encode(x, fs, cfg)
    n_fft, _, hop = cfg.geometry(fs)
    assert spec.shape == (3, dsp.num_frames(T, n_fft, hop), cfg.n_bins(fs))
    y = dsp.stft_decode(spec, fs, cfg, length=T)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_exponent_transform_roundtrip():
    cfg = dsp.STFTConfig(
        n_fft=1536,
        hop_length=384,
        spec_transform_type="exponent",
        spec_abs_exponent=0.667,
        spec_factor=0.065,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 24000)).astype(np.float32))
    spec = dsp.stft_encode(x, 48000, cfg)
    y = dsp.stft_decode(spec, 48000, cfg, length=24000)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-3)


def test_exponent_transform_matches_torch_formula():
    cfg = dsp.STFTConfig(
        spec_transform_type="exponent", spec_abs_exponent=0.667, spec_factor=0.065
    )
    rng = np.random.default_rng(4)
    s = rng.standard_normal((64,)) + 1j * rng.standard_normal((64,))
    s = s.astype(np.complex64)
    ours = np.asarray(dsp.spec_transform(jnp.asarray(s), cfg))
    st = torch.from_numpy(s)
    ref = (st.abs() ** 0.667 * torch.exp(1j * st.angle()) * 0.065).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
