"""Pallas LSTM kernel parity vs the lax.scan reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.ops import lstm as lstm_ops
from urgent2026_challenge_track1_tpu.ops.pallas_lstm import bilstm_pallas, lstm_scan_pallas


@pytest.mark.parametrize("reverse", [False, True])
def test_kernel_matches_scan(reverse):
    rng = np.random.default_rng(0)
    B, T, H = 16, 23, 128
    xp = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    ref = lstm_ops._scan_dir(xp, whh, H, reverse)
    out = lstm_scan_pallas(xp, whh, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_bilstm_pallas_matches_bilstm_with_padding():
    """B not a sublane multiple exercises the pad/unpad path."""
    key = jax.random.PRNGKey(0)
    B, T, I, H = 13, 9, 64, 128
    params = lstm_ops.init_lstm(key, I, H, bidirectional=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, I))
    ref = lstm_ops.bilstm(params, x)
    out = bilstm_pallas(params, x, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
