"""Fixed-step ODE samplers for flow-matching inference, fully jitted.

Behavioral spec: ``/root/reference/baseline_code/sampling/__init__.py:30-65``
(white-box fixed-grid sampler) and ``sampling/odesolvers.py:71-107``
(euler / midpoint / heun update rules).

TPU-first: the reference's Python step loop becomes a `lax.scan` over a
trace-time-constant (t, stepsize) grid, so the whole N-step sampler fuses
into ONE compiled program (no host round-trips between steps); N is static.
The scipy black-box RK45 sampler (reference :67-117) is kept for API parity
but host-loops a jitted model call per function evaluation — prefer the
white-box solvers on TPU.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ODE_SOLVERS",
    "get_white_box_solver",
    "get_black_box_solver",
    "sample_flow",
]


def _euler(vf_fn, x, t, y, stepsize):
    dt = -stepsize
    return x + vf_fn(x, t, y) * dt


def _midpoint(vf_fn, x, t, y, stepsize):
    dt = -stepsize
    return x + dt * vf_fn(x + dt / 2.0 * vf_fn(x, t, y), t + dt / 2.0, y)


def _heun(vf_fn, x, t, y, stepsize):
    dt = -stepsize
    v = vf_fn(x, t, y)
    x_next = x + dt * v
    return x + dt / 2.0 * (v + vf_fn(x_next, t + dt, y))


ODE_SOLVERS = {"euler": _euler, "midpoint": _midpoint, "heun": _heun}


class Registry:
    """Name -> thing registry (reference sampling/odesolvers.py:11-43)."""

    def __init__(self, managed_thing: str):
        self.managed_thing = managed_thing
        self._registry = {}

    def register(self, name: str):
        def inner(wrapped):
            self._registry[name] = wrapped
            return wrapped

        return inner

    def get_by_name(self, name: str):
        if name in self._registry:
            return self._registry[name]
        raise ValueError(f"{self.managed_thing} with name '{name}' unknown.")

    def get_all_names(self):
        return list(self._registry.keys())


ODEsolverRegistry = Registry("ODEsolver")
for _name, _fn in ODE_SOLVERS.items():
    ODEsolverRegistry.register(_name)(_fn)


def _timegrid(T_rev: float, t_eps: float, N: int):
    """Reference grid: linspace(T_rev, t_eps, N); step i uses
    stepsize = t_i - t_{i+1}, last step uses t_{N-1} (sampling/__init__.py:51-58)."""
    ts = np.linspace(T_rev, t_eps, N, dtype=np.float32)
    steps = np.empty_like(ts)
    steps[:-1] = ts[:-1] - ts[1:]
    steps[-1] = ts[-1]
    return jnp.asarray(ts), jnp.asarray(steps)


def sample_flow(
    vf_fn: Callable,
    ode,
    key,
    y: jnp.ndarray,
    solver: str = "euler",
    N: int = 15,
    T_rev: float = 1.0,
    t_eps: float = 0.03,
):
    """Integrate the reverse flow from the prior at T_rev down to t_eps.

    vf_fn(x, t, y) with t of shape (B,); y: (B, T, F) complex conditioning.
    Returns (sample, nfe).
    """
    update = ODE_SOLVERS[solver]
    ts, steps = _timegrid(T_rev, t_eps, N)
    x0, _ = ode.prior_sampling(key, y)
    B = y.shape[0]

    def body(x, t_and_step):
        t, step = t_and_step
        vec_t = jnp.full((B,), t, jnp.float32)
        return update(vf_fn, x, vec_t, y, step), None

    x, _ = jax.lax.scan(body, x0, (ts, steps))
    nfe = N * {"euler": 1, "midpoint": 2, "heun": 2}[solver]
    return x, nfe


def get_white_box_solver(
    solver_name: str, ode, vf_fn, Y, T_rev: float = 1.0, t_eps: float = 0.03, N: int = 30
):
    """Reference-signature factory (sampling/__init__.py:30): returns a
    zero-arg callable producing (sample, n_steps)."""

    def run(key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        x, _ = sample_flow(
            vf_fn, ode, key, Y, solver=solver_name, N=N, T_rev=T_rev, t_eps=t_eps
        )
        return x, N

    return run


def get_black_box_solver(
    ode, vf_fn, y, rtol: float = 1e-5, atol: float = 1e-5,
    T_rev: float = 1.0, t_eps: float = 0.03, method: str = "RK45", **kwargs
):
    """Adaptive scipy solve_ivp sampler (reference sampling/__init__.py:67-117).

    Flattens the complex state to float64 for scipy; each ODE-function
    evaluation is one (jitted) model call on device.  Returns a zero-arg
    callable producing (sample, nfe).
    """
    from scipy import integrate

    shape = y.shape
    B = shape[0]

    def to_flat(x):
        x = np.asarray(x)
        return np.concatenate([x.real.reshape(-1), x.imag.reshape(-1)])

    def from_flat(v):
        half = v.shape[0] // 2
        return jnp.asarray(
            (v[:half] + 1j * v[half:]).reshape(shape), jnp.complex64
        )

    def run(key=None):
        key = jax.random.PRNGKey(0) if key is None else key
        x0, _ = ode.prior_sampling(key, y)

        def ode_func(t, v):
            x = from_flat(v)
            vec_t = jnp.full((B,), t, jnp.float32)
            drift = vf_fn(x, vec_t, y)
            return to_flat(drift)

        sol = integrate.solve_ivp(
            ode_func, (T_rev, t_eps), to_flat(x0),
            rtol=rtol, atol=atol, method=method, **kwargs
        )
        return from_flat(sol.y[:, -1]), sol.nfev

    return run
