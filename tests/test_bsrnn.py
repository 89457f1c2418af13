"""BSRNN model: band layout, shapes, jit, grad, fs truncation semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.ops.norms import group_norm


def test_subband_layouts_sum():
    assert sum(M.subband_layout(481)) == 481
    assert len(M.subband_layout(481)) == 34
    assert sum(M.subband_layout(769)) == 769
    assert len(M.subband_layout(769)) == 48


@pytest.mark.parametrize(
    "fs,expected_bins",
    [(48000, 481), (32000, 321), (16000, 161), (8000, 81)],
)
def test_band_count_matches_reference_loop(fs, expected_bins):
    """Re-run the reference's two break conditions literally and compare."""
    subbands = M.subband_layout(481)
    freqs = np.cumsum(subbands) - 1
    freqs = freqs * 50.0  # 48000 / 960
    hz = 0
    k_ref = 0
    for i, sub in enumerate(subbands):
        k_ref = i + 1
        hz += sub
        if hz >= expected_bins:
            break
        if freqs[i] >= fs / 2:
            break
    assert M.band_count(481, 48000, fs, expected_bins) == k_ref


def test_group_norm_matches_torch():
    torch.manual_seed(0)
    B, C, T, K = 2, 12, 9, 5
    gn = torch.nn.GroupNorm(1, C, eps=1e-8)
    with torch.no_grad():
        gn.weight.uniform_(-1, 1)
        gn.bias.uniform_(-1, 1)
    x = torch.randn(B, C, T, K)
    ref = gn(x).detach().numpy()
    # ours operates on (B, T, K, C) layout
    xj = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)
    ours = group_norm(
        xj,
        jnp.asarray(gn.weight.detach().numpy()),
        jnp.asarray(gn.bias.detach().numpy()),
        axes=(1, 2, 3),
        eps=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-4
    )


@pytest.fixture(scope="module")
def tiny_cfg():
    return M.BSRNNConfig(input_dim=481, num_channel=16, num_layer=2)


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return M.init_bsrnn(jax.random.PRNGKey(0), tiny_cfg)


@pytest.mark.parametrize("fs", [48000, 44100, 32000, 24000, 22050, 16000, 8000])
def test_bsrnn_apply_shapes(tiny_cfg, tiny_params, fs):
    stft_cfg = STFTConfig(n_fft=960, hop_length=480)
    F = stft_cfg.n_bins(fs)
    B, T = 2, 7
    key = jax.random.PRNGKey(1)
    spec = jax.random.normal(key, (B, T, F)) + 1j * jax.random.normal(key, (B, T, F))
    out = M.bsrnn_apply(tiny_params, spec.astype(jnp.complex64), tiny_cfg, fs)
    assert out.shape == (B, T, F)
    assert out.dtype == jnp.complex64
    assert np.all(np.isfinite(np.asarray(out.real)))


def test_bsrnn_se_wav_to_wav(tiny_cfg, tiny_params):
    stft_cfg = STFTConfig(n_fft=960, hop_length=480)
    fs = 16000
    x = jax.random.normal(jax.random.PRNGKey(2), (2, fs // 2))
    wav, spec = M.bsrnn_se_apply(tiny_params, tiny_cfg, stft_cfg, x, fs)
    assert wav.shape == x.shape
    assert np.all(np.isfinite(np.asarray(wav)))


def test_bsrnn_grad_finite(tiny_cfg, tiny_params):
    stft_cfg = STFTConfig(n_fft=960, hop_length=480)
    fs = 8000
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (1, 4000))

    @jax.jit
    def loss_fn(p):
        wav, _ = M.bsrnn_se_apply(p, tiny_cfg, stft_cfg, x, fs)
        return jnp.mean(jnp.square(wav))

    g = jax.grad(loss_fn)(tiny_params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in leaves)
    # band-truncation: layers beyond the fs=8k band set still get zero grads
    # through band_split weights of untouched bands
    gw = np.asarray(g["band_split"]["w"])
    k8 = M.band_count(481, 48000, 8000, 81)
    assert np.all(gw[k8:] == 0.0)
    assert np.any(gw[:k8] != 0.0)


def test_flow_condition_variant_shapes():
    from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM

    cfg = FM.FlowSEConfig(n_fft=960, hop_length=480, bsrnn_hidden=16, num_layer=2)
    params = FM.init_flowse(jax.random.PRNGKey(0), cfg)
    fs, F = 16000, 161
    B, T = 2, 5
    k = jax.random.PRNGKey(1)
    x = (jax.random.normal(k, (B, T, F)) + 1j * jax.random.normal(k, (B, T, F))).astype(
        jnp.complex64
    )
    t = jnp.asarray([0.3, 0.9])
    out = FM.vector_field(params, cfg, x, t, x, fs)
    assert out.shape == (B, T, F)


def test_masked_group_norm_zero_length_row_is_zero_not_nan():
    """An all-masked row (zero-length padding item, e.g. a serving filler)
    must come out as zeros: NaN*0 is NaN, so the primitive clamps its
    denominator instead of relying on the final mask multiply."""
    import jax.numpy as jnp
    from urgent2026_challenge_track1_tpu.ops.norms import masked_group_norm

    x = jnp.ones((2, 4, 3))
    mask = jnp.stack([jnp.ones((4, 3)), jnp.zeros((4, 3))])
    out = masked_group_norm(x, scale=jnp.ones(3), bias=jnp.zeros(3),
                            mask=mask, axes=(1, 2))
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out[1]).max()) == 0.0
