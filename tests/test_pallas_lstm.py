"""Pallas LSTM kernel parity vs the lax.scan reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.ops import lstm as lstm_ops
from urgent2026_challenge_track1_tpu.ops import pallas_lstm as pl_ops
from urgent2026_challenge_track1_tpu.ops.pallas_lstm import (
    bilstm_pallas,
    bilstm_pallas_train,
    lstm_pallas_train,
    lstm_scan_pallas,
)


@pytest.mark.parametrize("reverse", [False, True])
def test_kernel_matches_scan(reverse):
    rng = np.random.default_rng(0)
    B, T, H = 16, 23, 128
    xp = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    ref = lstm_ops._scan_dir(xp, whh, H, reverse)
    out = lstm_scan_pallas(xp, whh, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("b_block", [0, 8])
def test_train_kernel_forward_matches_scan(reverse, b_block):
    rng = np.random.default_rng(1)
    B, T, H = 16, 17, 128
    xp = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    ref = lstm_ops._scan_dir(xp, whh, H, reverse)
    out = lstm_pallas_train(xp, whh, reverse, b_block, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("b_block", [0, 8])
def test_train_kernel_grads_match_scan(reverse, b_block):
    """Gradcheck vs the lax.scan path (VERDICT r1 item 2 done-criterion)."""
    rng = np.random.default_rng(2)
    B, T, H = 16, 11, 128
    xp = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.3)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    def loss_ref(xp_, whh_):
        return jnp.sum(lstm_ops._scan_dir(xp_, whh_, H, reverse) * cot)

    def loss_pl(xp_, whh_):
        return jnp.sum(lstm_pallas_train(xp_, whh_, reverse, b_block, True) * cot)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(xp, whh)
    gx, gw = jax.grad(loss_pl, argnums=(0, 1))(xp, whh)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-4)


def test_bilstm_train_grads_match_bilstm():
    """Full bilstm wrapper: grads w.r.t. every torch-layout param + input."""
    key = jax.random.PRNGKey(3)
    B, T, I, H = 13, 7, 64, 128
    params = lstm_ops.init_lstm(key, I, H, bidirectional=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, I))
    cot = jax.random.normal(jax.random.PRNGKey(5), (B, T, 2 * H))

    def loss_ref(p, x_):
        return jnp.sum(lstm_ops.bilstm(p, x_) * cot)

    def loss_pl(p, x_):
        return jnp.sum(bilstm_pallas_train(p, x_, interpret=True) * cot)

    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    (gp, gx) = jax.grad(loss_pl, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), atol=1e-4, err_msg=k
        )


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


def test_streamin_training_forward_matches_hoisted():
    """STREAM_INPUT_TRAIN=True (in-kernel input projection) must reproduce
    the hoisted-projection training numerics exactly — forward AND custom
    VJP (the backward rule is shared)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from urgent2026_challenge_track1_tpu.ops import lstm as lstm_ops
    from urgent2026_challenge_track1_tpu.ops import pallas_lstm as pl_ops

    B, T, I, H = 4, 9, 8, 16
    params = lstm_ops.init_lstm(jax.random.PRNGKey(0), I, H, bidirectional=True)
    x = jnp.asarray(
        0.3 * np.random.default_rng(1).standard_normal((B, T, I)), jnp.float32
    )
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, T, 2 * H)), jnp.float32
    )

    def loss(p, x_):
        return jnp.sum(pl_ops.bilstm_pallas(p, x_, interpret=True) * cot)

    ref_out = pl_ops.bilstm_pallas(params, x, interpret=True)
    ref_grad = jax.grad(loss)(params, x)
    assert not pl_ops.STREAM_INPUT_TRAIN
    pl_ops.STREAM_INPUT_TRAIN = True
    try:
        out = pl_ops.bilstm_pallas(params, x, interpret=True)
        grad = jax.grad(loss)(params, x)
    finally:
        pl_ops.STREAM_INPUT_TRAIN = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-6)
    for k in ref_grad:
        np.testing.assert_allclose(
            np.asarray(grad[k]), np.asarray(ref_grad[k]), atol=2e-5, err_msg=k
        )


def test_streamin_masked_path_matches_scan():
    """bilstm_masked with STREAM_INPUT_TRAIN + Pallas (interpret) ==
    the scan masked reference, forward and grad."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from urgent2026_challenge_track1_tpu.ops import lstm as lstm_ops
    from urgent2026_challenge_track1_tpu.ops import pallas_lstm as pl_ops

    B, T, I, H = 3, 10, 8, 16
    params = lstm_ops.init_lstm(jax.random.PRNGKey(5), I, H, bidirectional=True)
    x = jnp.asarray(
        0.3 * np.random.default_rng(6).standard_normal((B, T, I)), jnp.float32
    )
    lens = jnp.asarray([6, 10, 8], jnp.int32)
    cot = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, T, 2 * H)), jnp.float32
    )
    vm = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)[..., None]

    def loss(p, x_, pallas):
        h = lstm_ops.bilstm_masked(p, x_, lens, use_pallas=pallas, interpret=True)
        return jnp.sum(h * cot * vm)

    ref = lstm_ops.bilstm_masked(params, x, lens)
    gref = jax.grad(loss)(params, x, False)
    pl_ops.STREAM_INPUT_TRAIN = True
    try:
        out = lstm_ops.bilstm_masked(params, x, lens, use_pallas=True, interpret=True)
        got = jax.grad(loss)(params, x, True)
    finally:
        pl_ops.STREAM_INPUT_TRAIN = False
    np.testing.assert_allclose(
        np.asarray(out * vm), np.asarray(ref * vm), atol=2e-6
    )
    for k in gref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(gref[k]), atol=2e-5, err_msg=k
        )


def test_unidirectional_lstm_pallas_matches_scan():
    """ops/lstm.lstm(use_pallas=True): the causal (forward-only) time path
    routes through the custom-VJP kernel; parity with the scan incl. grads."""
    rng = np.random.default_rng(9)
    B, T, N, H = 5, 17, 24, 128
    params = lstm_ops.init_lstm(jax.random.PRNGKey(0), N, H)
    x = jnp.asarray(rng.standard_normal((B, T, N)).astype(np.float32))
    ref = lstm_ops.lstm(params, x)
    out = lstm_ops.lstm(params, x, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    cot = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))

    def loss(p, pallas):
        y = lstm_ops.lstm(p, x, use_pallas=pallas, interpret=True)
        return jnp.sum(y * cot)

    g_ref = jax.grad(loss)(params, False)
    g_pl = jax.grad(loss)(params, True)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pl[k]), np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_fused_bidir_training_matches_per_direction():
    """FUSED_BIDIR_TRAIN=True (both directions in one Pallas call, forward
    AND backward kernels) must reproduce the per-direction training numerics
    exactly — the band-path fusion experiment (VERDICT r2 item 10a)."""
    B, T, I, H = 4, 9, 8, 16
    params = lstm_ops.init_lstm(jax.random.PRNGKey(0), I, H, bidirectional=True)
    x = jnp.asarray(
        0.3 * np.random.default_rng(1).standard_normal((B, T, I)), jnp.float32
    )
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, T, 2 * H)), jnp.float32
    )

    def loss(p, x_):
        return jnp.sum(pl_ops.bilstm_pallas(p, x_, interpret=True) * cot)

    ref_out = pl_ops.bilstm_pallas(params, x, interpret=True)
    ref_gp, ref_gx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert not pl_ops.FUSED_BIDIR_TRAIN
    pl_ops.FUSED_BIDIR_TRAIN = True
    try:
        out = pl_ops.bilstm_pallas(params, x, interpret=True)
        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    finally:
        pl_ops.FUSED_BIDIR_TRAIN = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx), atol=2e-5)
    for k in ref_gp:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(ref_gp[k]), atol=2e-5, err_msg=k
        )


def test_fused_bidir_training_blocked_grid():
    """Same parity through the grid-blocked fused kernels (b_block < B)."""
    B, T, I, H = 16, 5, 8, 16
    params = lstm_ops.init_lstm(jax.random.PRNGKey(7), I, H, bidirectional=True)
    x = jnp.asarray(
        0.3 * np.random.default_rng(8).standard_normal((B, T, I)), jnp.float32
    )
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal((B, T, 2 * H)), jnp.float32
    )
    dtype = x.dtype
    args = (
        x,
        params["w_ih"].T.astype(dtype),
        params["w_ih_reverse"].T.astype(dtype),
        params["w_hh"].T.astype(dtype),
        params["w_hh_reverse"].T.astype(dtype),
        (params["b_ih"] + params["b_hh"])[None],
        (params["b_ih_reverse"] + params["b_hh_reverse"])[None],
    )

    def loss(*a):
        return jnp.sum(
            pl_ops.lstm_pallas_bidir_fusedin(*a, b_block=8, interpret=True) * cot
        )

    ref_out = pl_ops.lstm_pallas_bidir_fusedin(*args, b_block=8, interpret=True)
    ref_grads = jax.grad(loss, argnums=tuple(range(7)))(*args)
    assert not pl_ops.FUSED_BIDIR_TRAIN
    pl_ops.FUSED_BIDIR_TRAIN = True
    try:
        out = pl_ops.lstm_pallas_bidir_fusedin(*args, b_block=8, interpret=True)
        grads = jax.grad(loss, argnums=tuple(range(7)))(*args)
    finally:
        pl_ops.FUSED_BIDIR_TRAIN = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-6)
    for i, (g, g_ref) in enumerate(zip(grads, ref_grads)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), atol=2e-5, err_msg=f"arg {i}"
        )
