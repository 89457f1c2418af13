"""Flow-matching ODE path (Lipman-style conditional flow matching).

Behavioral spec: ``/root/reference/baseline_code/models/odes.py:52-98``.
Pure functions over complex spectra; `t` is a per-batch vector (B,).

  mean_t    = (1-t) x0 + t y
  std_t     = (1-t) sigma_min + t sigma_max
  prior x_T = y + sigma_max * z,  z complex standard normal (var 1, i.e.
              re/im ~ N(0, 1/2) — torch.randn_like on complex tensors)
  der_mean  = y - x0
  der_std   = sigma_max - sigma_min
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["FlowMatching", "complex_normal_like"]


def complex_normal_like(key, x: jnp.ndarray) -> jnp.ndarray:
    """Complex normal with unit complex variance (re/im each N(0, 1/2))."""
    kr, ki = jax.random.split(key)
    shape = x.shape
    re = jax.random.normal(kr, shape, jnp.float32)
    im = jax.random.normal(ki, shape, jnp.float32)
    return jax.lax.complex(re, im) * jnp.sqrt(0.5).astype(jnp.float32)


def _bcast(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """(B,) -> (B, 1, ..., 1) to broadcast against (B, T, F[, ...])."""
    return t.reshape(t.shape + (1,) * (ndim - 1))


@dataclasses.dataclass(frozen=True)
class FlowMatching:
    sigma_min: float = 0.0
    sigma_max: float = 0.5
    T_rev: float = 1.0

    def mean(self, x0, t, y):
        tb = _bcast(t, x0.ndim)
        return (1.0 - tb) * x0 + tb * y

    def std(self, t):
        return (1.0 - t) * self.sigma_min + t * self.sigma_max

    def marginal_prob(self, x0, t, y):
        return self.mean(x0, t, y), self.std(t)

    def prior_sampling(self, key, y):
        """x_T = y + sigma_max * z.  Returns (x_T, z)."""
        z = complex_normal_like(key, y)
        std = self.std(jnp.ones((y.shape[0],), jnp.float32))
        return y + z * _bcast(std, y.ndim), z

    def der_mean(self, x0, t, y):
        return y - x0

    def der_std(self, t):
        return jnp.full_like(t, self.sigma_max - self.sigma_min)
