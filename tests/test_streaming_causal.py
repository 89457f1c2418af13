"""Stateful streaming-causal BSRNN: chunked == offline parity.

The reference's ``causal`` flag (``models/bsrnn_flowse.py:199,216,235``)
produces a causal LSTM stack but keeps GroupNorm over the full utterance, so
it cannot stream.  ``BSRNNConfig(causal=True, streaming_norm=True)`` swaps in
cumulative norms; these tests pin the contract that makes the streaming
runtime trustworthy: a ``StreamingSession`` fed arbitrary chunk sizes
reproduces the OFFLINE full-utterance forward of the same model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.models import streaming_causal as SC
from urgent2026_challenge_track1_tpu.ops import norms

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# cumulative_group_norm unit behavior
# ---------------------------------------------------------------------------


def test_cumulative_norm_is_causal():
    """Changing future frames does not change past outputs."""
    x = RNG.standard_normal((2, 10, 3, 4)).astype(np.float32)
    y = RNG.standard_normal((2, 10, 3, 4)).astype(np.float32)
    y[:, :6] = x[:, :6]
    s = jnp.ones((4,))
    b = jnp.zeros((4,))
    ox = norms.cumulative_group_norm(jnp.asarray(x), s, b, axes=(2, 3))
    oy = norms.cumulative_group_norm(jnp.asarray(y), s, b, axes=(2, 3))
    np.testing.assert_allclose(np.asarray(ox)[:, :6], np.asarray(oy)[:, :6],
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(np.asarray(ox)[:, 6:], np.asarray(oy)[:, 6:])


def test_cumulative_norm_chunked_equals_full():
    x = RNG.standard_normal((2, 12, 3, 4)).astype(np.float32)
    s = jnp.full((4,), 1.3)
    b = jnp.full((4,), -0.2)
    full = norms.cumulative_group_norm(jnp.asarray(x), s, b, axes=(2, 3))
    state = tuple(jnp.zeros((2, 1, 1, 1)) for _ in range(3))
    outs = []
    for lo in (0, 5, 9):
        hi = {0: 5, 5: 9, 9: 12}[lo]
        y, state = norms.cumulative_group_norm(
            jnp.asarray(x[:, lo:hi]), s, b, axes=(2, 3), state=state
        )
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), np.asarray(full), rtol=1e-5, atol=1e-6
    )


def test_cumulative_norm_final_frame_matches_group_norm():
    """At the last frame the cumulative statistics equal the full-sequence
    statistics, so the final frame matches the non-causal group_norm."""
    x = RNG.standard_normal((1, 8, 2, 5)).astype(np.float32)
    s = jnp.ones((5,))
    b = jnp.zeros((5,))
    cum = norms.cumulative_group_norm(jnp.asarray(x), s, b, axes=(2, 3))
    full = norms.group_norm(jnp.asarray(x), s, b, axes=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(cum)[:, -1], np.asarray(full)[:, -1],
                               rtol=1e-4, atol=1e-5)


def test_cumulative_norm_differentiable():
    """Training a streaming-deployable model backprops through the norm."""
    x = jnp.asarray(RNG.standard_normal((1, 6, 2, 3)).astype(np.float32))

    def f(x):
        y = norms.cumulative_group_norm(
            x, jnp.ones((3,)), jnp.zeros((3,)), axes=(2, 3)
        )
        return jnp.sum(jnp.square(y))

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


# ---------------------------------------------------------------------------
# end-to-end streaming parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_causal():
    cfg = M.BSRNNConfig(input_dim=481, num_channel=16, num_layer=2,
                        causal=True, streaming_norm=True)
    params = M.init_bsrnn(jax.random.PRNGKey(5), cfg)
    return cfg, params


STFT_CFG = dsp.STFTConfig(n_fft=960, hop_length=480)


def _offline(params, cfg, noisy, fs):
    out, _ = M.bsrnn_se_apply(params, cfg, STFT_CFG, jnp.asarray(noisy), fs)
    return np.asarray(out)


@pytest.mark.parametrize("fs,L", [(16000, 9873), (22050, 13011)])
def test_streaming_equals_offline(tiny_causal, fs, L):
    """Chunked streaming == offline forward, incl. the odd 22.05 kHz
    geometry (n_fft=441, hop=220: scatter OLA, n_fft != 2*hop)."""
    cfg, params = tiny_causal
    noisy = 0.1 * RNG.standard_normal((1, L)).astype(np.float32)
    ref = _offline(params, cfg, noisy, fs)
    sess = SC.StreamingSession(params, cfg, STFT_CFG, fs, chunk_frames=3)
    out = sess.process(noisy, feed_size=1000)
    assert out.shape == noisy.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)


def test_streaming_priming_window_feed_sizes(tiny_causal):
    """Feed sizes in [chunk - pad, chunk - 1] land between 'a full chunk is
    pending' judged before vs after priming consumes the STFT left context —
    the round-3 review found this dispatched a short first chunk (silent
    corruption).  fs=16 kHz, chunk_frames=2: chunk=320, pad=160."""
    cfg, params = tiny_causal
    fs, L = 16000, 6000
    noisy = 0.1 * RNG.standard_normal((1, L)).astype(np.float32)
    ref = _offline(params, cfg, noisy, fs)
    for feed in (161, 200, 319):
        sess = SC.StreamingSession(params, cfg, STFT_CFG, fs, chunk_frames=2)
        out = sess.process(noisy, feed_size=feed)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5,
                                   err_msg=f"feed_size={feed}")


def test_streaming_feed_size_irrelevant(tiny_causal):
    """The output is independent of how the caller slices the feeds."""
    cfg, params = tiny_causal
    fs, L = 16000, 6500
    noisy = 0.1 * RNG.standard_normal((1, L)).astype(np.float32)
    outs = []
    for feed in (333, 4096):
        sess = SC.StreamingSession(params, cfg, STFT_CFG, fs, chunk_frames=2)
        outs.append(sess.process(noisy, feed_size=feed))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_streaming_batch_rows_independent(tiny_causal):
    """Each batch row streams as if alone (no cross-row statistics)."""
    cfg, params = tiny_causal
    fs, L = 16000, 5000
    noisy = 0.1 * RNG.standard_normal((2, L)).astype(np.float32)
    sess = SC.StreamingSession(params, cfg, STFT_CFG, fs, batch=2,
                               chunk_frames=2)
    both = sess.process(noisy)
    solo = SC.StreamingSession(params, cfg, STFT_CFG, fs, chunk_frames=2)
    one = solo.process(noisy[:1])
    np.testing.assert_allclose(both[:1], one, rtol=1e-5, atol=1e-6)


def test_streaming_emission_latency(tiny_causal):
    """feed() starts returning audio once latency_samples have arrived, and
    total output length equals total input length."""
    cfg, params = tiny_causal
    fs = 16000
    sess = SC.StreamingSession(params, cfg, STFT_CFG, fs, chunk_frames=2)
    hop = sess.hop
    got = 0
    fed = 0
    first_at = None
    for _ in range(12):
        out = sess.feed(0.1 * RNG.standard_normal((1, hop)).astype(np.float32))
        fed += hop
        got += out.shape[-1]
        if out.shape[-1] and first_at is None:
            first_at = fed
    assert first_at is not None and first_at <= sess.latency_samples + hop
    got += sess.flush().shape[-1]
    assert got == fed


def test_streaming_rejects_noncausal_config():
    cfg = M.BSRNNConfig(input_dim=481, num_channel=8, num_layer=1)
    params = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="causal"):
        SC.StreamingSession(params, cfg, STFT_CFG, 16000)


def test_streaming_too_short_stream_raises(tiny_causal):
    cfg, params = tiny_causal
    sess = SC.StreamingSession(params, cfg, STFT_CFG, 16000)
    sess.feed(np.zeros((1, 10), np.float32))
    with pytest.raises(ValueError, match="too short"):
        sess.flush()
