"""FlowSE: CFM loss, sampler, enhance — shapes, jit, grad, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
from urgent2026_challenge_track1_tpu.models.odes import FlowMatching, complex_normal_like
from urgent2026_challenge_track1_tpu.sampling import sample_flow, _timegrid


@pytest.fixture(scope="module")
def tiny():
    cfg = FM.FlowSEConfig(n_fft=960, hop_length=480, bsrnn_hidden=16, num_layer=2)
    params = FM.init_flowse(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_timegrid_matches_reference_rule():
    ts, steps = _timegrid(1.0, 0.03, 5)
    ts = np.asarray(ts)
    steps = np.asarray(steps)
    ref_ts = np.linspace(1.0, 0.03, 5)
    np.testing.assert_allclose(ts, ref_ts, atol=1e-7)
    np.testing.assert_allclose(steps[:-1], ref_ts[:-1] - ref_ts[1:], atol=1e-7)
    assert steps[-1] == pytest.approx(ref_ts[-1])


def test_complex_normal_variance():
    z = complex_normal_like(jax.random.PRNGKey(0), jnp.zeros((200, 200), jnp.complex64))
    v = np.var(np.asarray(z.real)) + np.var(np.asarray(z.imag))
    assert abs(v - 1.0) < 0.05


def test_flowse_loss_finite_and_jit(tiny):
    cfg, params = tiny
    fs = 16000
    k = jax.random.PRNGKey(1)
    clean = 0.1 * jax.random.normal(k, (2, 8000))
    noisy = clean + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (2, 8000))

    loss_fn = jax.jit(
        lambda p, key: FM.flowse_loss(p, cfg, key, clean, noisy, fs),
    )
    l1 = loss_fn(params, jax.random.PRNGKey(3))
    assert np.isfinite(float(l1))
    # deterministic under the same key
    l2 = loss_fn(params, jax.random.PRNGKey(3))
    assert float(l1) == float(l2)
    g = jax.grad(lambda p: FM.flowse_loss(p, cfg, jax.random.PRNGKey(4), clean, noisy, fs))(
        params
    )
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))


@pytest.mark.parametrize("solver", ["euler", "midpoint", "heun"])
def test_sampler_on_trivial_vf(solver):
    """With VF(x,t,y) = y - x0_true and prior ~ y, integrating from T=1 to
    t_eps must move x towards x0_true (linear path)."""
    ode = FlowMatching(sigma_min=0.0, sigma_max=0.0)
    x0_true = jnp.ones((1, 4, 4), jnp.complex64) * (2.0 + 1.0j)
    y = jnp.zeros((1, 4, 4), jnp.complex64)

    def vf(x, t, y_):
        return (y_ - x0_true).astype(jnp.complex64) * jnp.ones_like(x)

    out, nfe = sample_flow(vf, ode, jax.random.PRNGKey(0), y, solver=solver, N=50, t_eps=0.001)
    # x(T_rev)=y, dx/dt = y - x0 -> x(t) = x0 + t*(y-x0); at t_eps ~ x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true) * np.ones((1, 4, 4)), atol=0.05)


def test_flowse_enhance_shapes(tiny):
    cfg, params = tiny
    fs = 8000
    noisy = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (1, 4000))
    out = FM.flowse_enhance(params, cfg, jax.random.PRNGKey(6), noisy, fs, N=3)
    assert out.shape == noisy.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_sgmse_loss_and_enhance():
    from urgent2026_challenge_track1_tpu.models import sgmse as SG

    cfg = SG.SGMSEConfig(n_fft=960, hop_length=480, bsrnn_hidden=8, num_layer=1)
    params = SG.init_sgmse(jax.random.PRNGKey(0), cfg)
    fs = 8000
    clean = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 4000))
    noisy = clean + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (1, 4000))
    l = SG.sgmse_loss(params, cfg, jax.random.PRNGKey(3), clean, noisy, fs)
    assert np.isfinite(float(l))
    out = SG.sgmse_enhance(params, cfg, jax.random.PRNGKey(4), noisy, fs, N=3)
    assert out.shape == noisy.shape
    assert np.isfinite(np.asarray(out)).all()


def test_ouve_sde_properties():
    from urgent2026_challenge_track1_tpu.models.sgmse import OUVESDE

    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5)
    t = jnp.asarray([0.0, 0.5, 1.0])
    std = np.asarray(sde.std(t))
    assert std[0] < 1e-6  # no noise at t=0
    assert std[1] < std[2]  # variance exploding
    x0 = jnp.ones((3, 2, 2), jnp.complex64)
    y = jnp.zeros((3, 2, 2), jnp.complex64)
    mean = np.asarray(sde.mean(x0, t, y))
    assert abs(mean[0, 0, 0] - 1.0) < 1e-6  # mean starts at x0
    assert abs(mean[2, 0, 0]) < abs(mean[1, 0, 0])  # decays towards y


def test_flowse_enhance_scale_norm_semantics(tiny):
    """scale_norm (round-5): (a) exact scale-EQUIVARIANCE — enhance(c*x) ==
    c*enhance(x) for any c, because the sampler always sees the 0.9-peak
    normalized input with the same key; (b) at an exactly-0.9-peak input it
    matches scale_norm=False (the reference operating point is a no-op)."""
    cfg, params = tiny
    fs = 16000
    key = jax.random.PRNGKey(3)
    x = 0.2 * np.sin(2 * np.pi * 440 * np.arange(4000) / fs).astype(np.float32)
    x[100] = 0.3  # make the peak unambiguous
    xb = jnp.asarray(x[None, :])

    y1 = np.asarray(FM.flowse_enhance(params, cfg, key, xb, fs, N=2))
    y3 = np.asarray(FM.flowse_enhance(params, cfg, key, 3.0 * xb, fs, N=2))
    np.testing.assert_allclose(3.0 * y1, y3, rtol=1e-3, atol=5e-4)

    x09 = xb * (0.9 / 0.3)
    y_on = np.asarray(FM.flowse_enhance(params, cfg, key, x09, fs, N=2))
    y_off = np.asarray(
        FM.flowse_enhance(params, cfg, key, x09, fs, N=2, scale_norm=False))
    np.testing.assert_allclose(y_on, y_off, rtol=1e-3, atol=5e-4)
