"""Length-masked numerics: padding-exactness property tests (VERDICT r2 #1).

The reference pads batches only to the batch max and computes every loss/
metric on those exact-length signals (dataset.py:404-441, d_model.py:61-89).
This rebuild pads to static 1 s buckets; these tests prove the promised
invariant: with ``lengths`` given, loss(x, pad->T1) == loss(x, pad->T2) and
model outputs over the valid region are independent of the bucket padding —
through the losses, the bidirectional recurrences, the norms, and the iSTFT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
from urgent2026_challenge_track1_tpu.ops import lstm as lstm_ops
from urgent2026_challenge_track1_tpu.train import losses

RNG = np.random.default_rng(0)


def _pad_to(x, T, garbage=0.0):
    """Right-pad (B, L) to (B, T); nonzero ``garbage`` simulates the model's
    undefined output past each utterance's end."""
    B, L = x.shape
    pad = garbage * RNG.standard_normal((B, T - L)).astype(np.float32)
    return np.concatenate([x, pad], axis=1)


def test_mrl1_pad_invariant():
    B, L = 3, 5000
    tgt = RNG.standard_normal((B, L)).astype(np.float32)
    est = (tgt + 0.1 * RNG.standard_normal((B, L))).astype(np.float32)
    lengths = jnp.full((B,), L, jnp.int32)
    l1 = losses.multi_res_l1_spec_loss(
        jnp.asarray(_pad_to(tgt, 8000)), jnp.asarray(_pad_to(est, 8000, garbage=1.0)),
        lengths,
    )
    l2 = losses.multi_res_l1_spec_loss(
        jnp.asarray(_pad_to(tgt, 16000)), jnp.asarray(_pad_to(est, 16000, garbage=1.0)),
        lengths,
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-6)


def test_mrl1_masked_matches_unmasked_at_full_length():
    B, L = 2, 4096
    tgt = RNG.standard_normal((B, L)).astype(np.float32)
    est = (tgt + 0.2 * RNG.standard_normal((B, L))).astype(np.float32)
    full = losses.multi_res_l1_spec_loss(jnp.asarray(tgt), jnp.asarray(est))
    masked = losses.multi_res_l1_spec_loss(
        jnp.asarray(tgt), jnp.asarray(est), jnp.full((B,), L, jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(masked), rtol=1e-6)


def test_si_snr_pad_invariant():
    B, L = 3, 5000
    ref = RNG.standard_normal((B, L)).astype(np.float32)
    est = (ref + 0.3 * RNG.standard_normal((B, L))).astype(np.float32)
    lengths = jnp.full((B,), L, jnp.int32)
    v1 = losses.si_snr(
        jnp.asarray(_pad_to(ref, 8000)), jnp.asarray(_pad_to(est, 8000, 1.0)), lengths
    )
    v2 = losses.si_snr(
        jnp.asarray(_pad_to(ref, 16000)), jnp.asarray(_pad_to(est, 16000, 1.0)), lengths
    )
    exact = losses.si_snr(jnp.asarray(ref), jnp.asarray(est))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(exact), rtol=1e-5, atol=1e-4)


def test_bilstm_masked_matches_exact_length_rows():
    """Each row of bilstm_masked equals a plain bilstm run on that row's
    exact-length slice (the cuDNN packed-sequence semantics)."""
    B, T, I, H = 3, 12, 8, 16
    key = jax.random.PRNGKey(1)
    params = lstm_ops.init_lstm(key, I, H, bidirectional=True)
    x = RNG.standard_normal((B, T, I)).astype(np.float32)
    lens = np.array([5, 12, 9], np.int32)
    out = lstm_ops.bilstm_masked(params, jnp.asarray(x), jnp.asarray(lens))
    for b, L in enumerate(lens):
        exact = lstm_ops.bilstm(params, jnp.asarray(x[b : b + 1, :L]))
        np.testing.assert_allclose(
            np.asarray(out[b, :L]), np.asarray(exact[0]), rtol=1e-5, atol=1e-5
        )


def test_bilstm_masked_pallas_interpret_matches_scan():
    B, T, I, H = 2, 9, 8, 16
    params = lstm_ops.init_lstm(jax.random.PRNGKey(2), I, H, bidirectional=True)
    x = jnp.asarray(RNG.standard_normal((B, T, I)).astype(np.float32))
    lens = np.array([6, 9], np.int32)
    ref = lstm_ops.bilstm_masked(params, x, jnp.asarray(lens), use_pallas=False)
    got = lstm_ops.bilstm_masked(
        params, x, jnp.asarray(lens), use_pallas=True, interpret=True
    )
    # outputs at padded positions are unspecified (the reverse-masked kernel
    # leaves different garbage there than the gather formulation)
    for b, L in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(got[b, :L]), np.asarray(ref[b, :L]), rtol=1e-5, atol=1e-5
        )


def test_masked_istft_matches_exact_frames():
    """istft(frame_mask=nf valid) over [0, L) == istft of the nf frames."""
    n_fft, hop = 320, 160
    L = 3000
    x = RNG.standard_normal((2, L)).astype(np.float32)
    spec = dsp.stft(jnp.asarray(x), n_fft, hop)
    nf = spec.shape[1]
    # embed into a longer (padded) frame axis with garbage frames after nf
    pad_frames = 7
    garbage = RNG.standard_normal((2, pad_frames, spec.shape[2])).astype(np.float32)
    spec_pad = jnp.concatenate([spec, jnp.asarray(garbage) * (1 + 1j)], axis=1)
    fm = (jnp.arange(nf + pad_frames)[None, :] < nf).astype(jnp.float32)
    fm = jnp.broadcast_to(fm, (2, nf + pad_frames))
    out_masked = dsp.istft(spec_pad, n_fft, hop, length=L, frame_mask=fm)
    out_exact = dsp.istft(spec, n_fft, hop, length=L)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_exact), rtol=1e-5, atol=1e-5
    )


@pytest.fixture(scope="module")
def tiny_bsrnn():
    cfg = M.BSRNNConfig(input_dim=481, num_channel=16, num_layer=2, causal=False)
    params = M.init_bsrnn(jax.random.PRNGKey(3), cfg)
    return cfg, params


def test_bsrnn_se_pad_invariant(tiny_bsrnn):
    """Model outputs over the valid region are independent of the bucket
    padding: the FULL discriminative pipeline (STFT -> masked norms ->
    length-reversed recurrences -> masked-envelope iSTFT)."""
    cfg, params = tiny_bsrnn
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    fs, L = 8000, 7000
    noisy = 0.1 * RNG.standard_normal((2, L)).astype(np.float32)
    lengths = jnp.full((2,), L, jnp.int32)
    w1, _ = M.bsrnn_se_apply(
        params, cfg, stft_cfg, jnp.asarray(_pad_to(noisy, 8000)), fs, lengths=lengths
    )
    w2, _ = M.bsrnn_se_apply(
        params, cfg, stft_cfg, jnp.asarray(_pad_to(noisy, 16000)), fs, lengths=lengths
    )
    np.testing.assert_allclose(
        np.asarray(w1[:, :L]), np.asarray(w2[:, :L]), rtol=1e-5, atol=1e-5
    )
    # and therefore the train loss is bucket-invariant
    clean = noisy + 0.01 * RNG.standard_normal((2, L)).astype(np.float32)
    l1 = losses.multi_res_l1_spec_loss(
        jnp.asarray(_pad_to(clean, 8000)), w1, lengths
    )
    l2 = losses.multi_res_l1_spec_loss(
        jnp.asarray(_pad_to(clean, 16000)), w2, lengths
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-6)
    # val SI-SNR invariant to the bucket quantum (VERDICT done-criterion)
    s1 = losses.si_snr(jnp.asarray(_pad_to(clean, 8000)), w1, lengths)
    s2 = losses.si_snr(jnp.asarray(_pad_to(clean, 16000)), w2, lengths)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-4)


def test_bsrnn_se_masked_matches_exact_batchmax(tiny_bsrnn):
    """A bucket-padded masked forward reproduces the exact-length forward
    (what the reference computes, on exact batch-max-length signals) over
    the FULL valid region: the reflect-tail emulation makes the valid STFT
    frames bitwise-equal to the exact-length reflect-padded STFT, the
    masked norms / length-reversed recurrences keep them padding-free, and
    the masked-envelope iSTFT resynthesizes identically."""
    cfg, params = tiny_bsrnn
    stft_cfg = dsp.STFTConfig(n_fft=960, hop_length=480)
    fs = 8000
    L = 6400
    noisy = 0.1 * RNG.standard_normal((1, L)).astype(np.float32)
    exact, _ = M.bsrnn_se_apply(params, cfg, stft_cfg, jnp.asarray(noisy), fs)
    padded, _ = M.bsrnn_se_apply(
        params, cfg, stft_cfg, jnp.asarray(_pad_to(noisy, 8000)), fs,
        lengths=jnp.asarray([L], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(padded[0, :L]), np.asarray(exact[0]), rtol=1e-4, atol=1e-6
    )


def test_mrl1_masked_matches_exact_length():
    """Masked loss on a bucket-padded batch == unmasked loss on the
    exact-length signals (the reference's numbers, d_model.py:61-89)."""
    B, L = 2, 5000
    tgt = RNG.standard_normal((B, L)).astype(np.float32)
    est = (tgt + 0.1 * RNG.standard_normal((B, L))).astype(np.float32)
    exact = losses.multi_res_l1_spec_loss(jnp.asarray(tgt), jnp.asarray(est))
    masked = losses.multi_res_l1_spec_loss(
        jnp.asarray(_pad_to(tgt, 8000)), jnp.asarray(_pad_to(est, 8000, 1.0)),
        jnp.full((B,), L, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(masked), np.asarray(exact), rtol=1e-5)


def test_flowse_loss_pad_invariant():
    cfg = FM.FlowSEConfig(n_fft=960, hop_length=480, bsrnn_hidden=8, num_layer=1)
    fs, L = 8000, 7000
    clean = 0.1 * RNG.standard_normal((2, L)).astype(np.float32)
    noisy = clean + 0.02 * RNG.standard_normal((2, L)).astype(np.float32)
    params = FM.init_flowse(jax.random.PRNGKey(4), cfg)
    lengths = jnp.full((2,), L, jnp.int32)
    # pin t and the CFM noise: random draws are shape-dependent, so the
    # invariance property is over fixed draws (valid-frame slices agree)
    t = jnp.asarray([0.3, 0.8], jnp.float32)
    spec_shape2 = dsp.stft_encode(
        jnp.asarray(_pad_to(clean, 16000)), fs, cfg.stft_cfg
    ).shape
    z2 = FM.complex_normal_like(jax.random.PRNGKey(5), jnp.zeros(spec_shape2, jnp.complex64))
    nf1 = dsp.stft_encode(jnp.asarray(_pad_to(clean, 8000)), fs, cfg.stft_cfg).shape[1]
    z1 = z2[:, :nf1]
    key = jax.random.PRNGKey(6)
    l1 = FM.flowse_loss(
        params, cfg, key, jnp.asarray(_pad_to(clean, 8000)),
        jnp.asarray(_pad_to(noisy, 8000)), fs, lengths=lengths, noise=z1, t=t,
    )
    l2 = FM.flowse_loss(
        params, cfg, key, jnp.asarray(_pad_to(clean, 16000)),
        jnp.asarray(_pad_to(noisy, 16000)), fs, lengths=lengths, noise=z2, t=t,
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
