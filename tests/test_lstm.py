"""Scan-LSTM parity vs torch.nn.LSTM (the reference's recurrence backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from urgent2026_challenge_track1_tpu.ops import lstm as lstm_ops


def _copy_from_torch(tl, bidirectional):
    p = {}
    p["w_ih"] = jnp.asarray(tl.weight_ih_l0.detach().numpy())
    p["w_hh"] = jnp.asarray(tl.weight_hh_l0.detach().numpy())
    p["b_ih"] = jnp.asarray(tl.bias_ih_l0.detach().numpy())
    p["b_hh"] = jnp.asarray(tl.bias_hh_l0.detach().numpy())
    if bidirectional:
        p["w_ih_reverse"] = jnp.asarray(tl.weight_ih_l0_reverse.detach().numpy())
        p["w_hh_reverse"] = jnp.asarray(tl.weight_hh_l0_reverse.detach().numpy())
        p["b_ih_reverse"] = jnp.asarray(tl.bias_ih_l0_reverse.detach().numpy())
        p["b_hh_reverse"] = jnp.asarray(tl.bias_hh_l0_reverse.detach().numpy())
    return p


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(bidirectional):
    torch.manual_seed(0)
    B, T, I, H = 3, 17, 12, 24
    tl = torch.nn.LSTM(I, H, batch_first=True, bidirectional=bidirectional)
    x = torch.randn(B, T, I)
    ref, _ = tl(x)
    p = _copy_from_torch(tl, bidirectional)
    xj = jnp.asarray(x.numpy())
    if bidirectional:
        ours = lstm_ops.bilstm(p, xj)
    else:
        ours = lstm_ops.lstm(p, xj)
    np.testing.assert_allclose(
        np.asarray(ours), ref.detach().numpy(), atol=1e-5, rtol=1e-5
    )


def test_lstm_jit_and_grad():
    key = jax.random.PRNGKey(0)
    p = lstm_ops.init_lstm(key, 8, 16, bidirectional=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 11, 8))

    @jax.jit
    def loss(p, x):
        return jnp.sum(lstm_ops.bilstm(p, x) ** 2)

    g = jax.grad(loss)(p, x)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))
