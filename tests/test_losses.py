"""Loss functions: SI-SNR sanity + MR-L1 properties."""

import jax
import jax.numpy as jnp
import numpy as np

from urgent2026_challenge_track1_tpu.train import losses


def test_si_snr_perfect_and_scaled():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)), jnp.float32)
    # scale invariance: est = 3*ref has infinite-ish si-snr
    v = losses.si_snr(x, 3.0 * x)
    assert np.all(np.asarray(v) > 70.0)
    # loss is the negative
    np.testing.assert_allclose(np.asarray(losses.si_snr_loss(x, 3.0 * x)), -np.asarray(v))


def test_si_snr_known_value():
    rng = np.random.default_rng(1)
    ref = rng.standard_normal((1, 16000)).astype(np.float32)
    noise = rng.standard_normal((1, 16000)).astype(np.float32)
    # est = ref + noise with matched power -> si-snr ~ 0 dB
    noise = noise / np.linalg.norm(noise) * np.linalg.norm(ref)
    v = float(losses.si_snr(jnp.asarray(ref), jnp.asarray(ref + noise))[0])
    assert abs(v) < 0.5


def test_mr_l1_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4096)), jnp.float32)
    v = np.asarray(losses.multi_res_l1_spec_loss(x, x))
    assert np.all(v < 1e-3)


def test_mr_l1_scale_invariant_via_projection():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4096)), jnp.float32)
    v1 = float(losses.multi_res_l1_spec_loss(x, x)[0])
    v2 = float(losses.multi_res_l1_spec_loss(x, 2.5 * x)[0])
    assert abs(v1 - v2) < 1e-4


def test_mr_l1_monotone_in_noise():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((1, 4096)), jnp.float32)
    small = float(losses.multi_res_l1_spec_loss(x, x + 0.01 * n)[0])
    big = float(losses.multi_res_l1_spec_loss(x, x + 0.5 * n)[0])
    assert small < big


def test_mr_l1_jit_grad():
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 4096)), jnp.float32)
    y = x + 0.1

    @jax.jit
    def f(y):
        return losses.multi_res_l1_spec_loss(x, y).mean()

    g = jax.grad(f)(y)
    assert np.all(np.isfinite(np.asarray(g)))
