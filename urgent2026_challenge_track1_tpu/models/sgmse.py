"""Score-based diffusion SE (SGMSE) with the conditional BSRNN backbone.

Behavioral spec: ``/root/reference/baseline_code/models/bsrnn_flowse.py:
323-477`` — ``BSRNNScoreModel`` (OUVE SDE with sigma/theta from cfg, N=1000,
likelihood-weighted denoising score matching, score = -dnn(cat(x, y), t))
and ``SGMSE_BSRNN`` (n_fft=1536/hop=384 exponent-compressed STFT,
``enhance(snr=0.3, N=50)``).  The SDE and the predictor-corrector sampler
follow the published SGMSE recipe (Richter et al.; espnet
``espnet2/enh/diffusion/sdes.py`` OUVESDE):

  drift      f(x,t) = theta * (y - x)
  diffusion  g(t)   = sigma_min * (sigma_max/sigma_min)^t
                      * sqrt(2 log(sigma_max/sigma_min))
  mean_t = exp(-theta t) x0 + (1 - exp(-theta t)) y
  std_t^2 = sigma_min^2 * ((sigma_max/sigma_min)^(2t) - exp(-2 theta t))
            * log(sigma_max/sigma_min) / (theta + log(sigma_max/sigma_min))

TPU-first: the N-step PC sampler is one `lax.scan` (static N), each step =
annealed-Langevin corrector + reverse-diffusion predictor around the jitted
score network.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from urgent2026_challenge_track1_tpu.dsp import stft as dsp
from urgent2026_challenge_track1_tpu.models import bsrnn as B
from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
from urgent2026_challenge_track1_tpu.models.odes import complex_normal_like

__all__ = ["OUVESDE", "SGMSEConfig", "init_sgmse", "sgmse_loss", "sgmse_enhance"]


def _bcast(t, ndim):
    return t.reshape(t.shape + (1,) * (ndim - 1))


@dataclasses.dataclass(frozen=True)
class OUVESDE:
    """Ornstein-Uhlenbeck Variance-Exploding SDE."""

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 1000
    T: float = 1.0

    @property
    def _logsig(self):
        return float(np.log(self.sigma_max / self.sigma_min))

    def diffusion(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t * jnp.sqrt(
            2.0 * self._logsig
        )

    def drift(self, x, t, y):
        return self.theta * (y - x)

    def mean(self, x0, t, y):
        e = _bcast(jnp.exp(-self.theta * t), x0.ndim)
        return e * x0 + (1.0 - e) * y

    def std(self, t):
        ls = self._logsig
        var = (
            self.sigma_min**2
            * ((self.sigma_max / self.sigma_min) ** (2 * t) - jnp.exp(-2 * self.theta * t))
            * ls
            / (self.theta + ls)
        )
        return jnp.sqrt(jnp.maximum(var, 0.0))

    def marginal_prob(self, x0, t, y):
        return self.mean(x0, t, y), self.std(t)

    def prior_sampling(self, key, y):
        z = complex_normal_like(key, y)
        std = self.std(jnp.full((y.shape[0],), self.T, jnp.float32))
        return y + _bcast(std, y.ndim) * z, z


@dataclasses.dataclass(frozen=True)
class SGMSEConfig:
    n_fft: int = 1536
    hop_length: int = 384
    spec_abs_exponent: float = 0.667
    spec_factor: float = 0.065
    bsrnn_hidden: int = 196
    num_layer: int = 6
    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    t_eps: float = 3e-2
    likelihood_weighting: bool = True

    @property
    def stft_cfg(self) -> dsp.STFTConfig:
        return dsp.STFTConfig(
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            spec_transform_type="exponent",
            spec_abs_exponent=self.spec_abs_exponent,
            spec_factor=self.spec_factor,
        )

    @property
    def dnn_cfg(self) -> B.BSRNNConfig:
        return B.BSRNNConfig(
            input_dim=self.n_fft // 2 + 1,
            num_channel=self.bsrnn_hidden,
            num_layer=self.num_layer,
            causal=False,
            with_condition=True,
        )

    @property
    def sde(self) -> OUVESDE:
        return OUVESDE(self.theta, self.sigma_min, self.sigma_max)


def init_sgmse(key, cfg: SGMSEConfig):
    return FM.init_flowse(
        key,
        FM.FlowSEConfig(
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            bsrnn_hidden=cfg.bsrnn_hidden,
            num_layer=cfg.num_layer,
        ),
    )


def score_fn(params, cfg: SGMSEConfig, x, t, y, fs: int):
    """score = -dnn(cat(x, y), t)  (models/bsrnn_flowse.py:347-360)."""
    return -FM._dnn_apply(params, cfg.dnn_cfg, x, y, t, fs)


def sgmse_loss(params, cfg: SGMSEConfig, key, clean, noisy, fs: int):
    """Likelihood-weighted DSM loss (models/bsrnn_flowse.py:363-420)."""
    x0 = dsp.stft_encode(clean, fs, cfg.stft_cfg)
    y = dsp.stft_encode(noisy, fs, cfg.stft_cfg)
    sde = cfg.sde
    kt, kz = jax.random.split(key)
    Bsz = x0.shape[0]
    t = jax.random.uniform(kt, (Bsz,), jnp.float32) * (sde.T - cfg.t_eps) + cfg.t_eps
    mean, std = sde.marginal_prob(x0, t, y)
    z = complex_normal_like(kz, x0)
    sigmas = _bcast(std, x0.ndim)
    xt = mean + sigmas * z
    score = score_fn(params, cfg, xt, t, y, fs)
    if cfg.likelihood_weighting:
        g2 = sde.diffusion(t) ** 2
        err = score + z / sigmas
        losses = jnp.square(jnp.abs(err))
        per = 0.5 * jnp.mean(losses.reshape(Bsz, -1), axis=-1)
        return jnp.mean(per * g2)
    err = score * sigmas + z
    losses = jnp.square(jnp.abs(err))
    return jnp.mean(0.5 * jnp.mean(losses.reshape(Bsz, -1), axis=-1))


def sgmse_enhance(
    params, cfg: SGMSEConfig, key, noisy, fs: int, N: int = 50, snr: float = 0.3,
    corrector_steps: int = 1,
):
    """Predictor-corrector reverse sampling (enhance(snr=0.3, N=50),
    models/bsrnn_flowse.py:464-476)."""
    y = dsp.stft_encode(noisy, fs, cfg.stft_cfg)
    sde = cfg.sde
    Bsz = y.shape[0]
    k0, kloop = jax.random.split(key)
    xt, _ = sde.prior_sampling(k0, y)
    ts = jnp.linspace(sde.T, cfg.t_eps, N)
    dt = -(sde.T - cfg.t_eps) / (N - 1)

    def flat_norm(v):
        # per-item L2 over non-batch dims, then batch mean (espnet corrector:
        # torch.norm(x.reshape(B, -1), dim=-1).mean()) — a whole-batch norm
        # would couple the Langevin step size across unrelated utterances
        return jnp.mean(jnp.sqrt(jnp.sum(jnp.abs(v.reshape(v.shape[0], -1)) ** 2, axis=-1)))

    def step(carry, t):
        x, key = carry
        vec_t = jnp.full((Bsz,), t, jnp.float32)
        # corrector: annealed Langevin dynamics
        for _ in range(corrector_steps):
            key, kz = jax.random.split(key)
            grad = score_fn(params, cfg, x, vec_t, y, fs)
            noise = complex_normal_like(kz, x)
            eps = 2.0 * (snr * flat_norm(noise) / jnp.maximum(flat_norm(grad), 1e-12)) ** 2
            x = x + eps * grad + jnp.sqrt(2.0 * eps) * noise
        # predictor: reverse diffusion
        key, kz = jax.random.split(key)
        g = sde.diffusion(t)
        score = score_fn(params, cfg, x, vec_t, y, fs)
        drift = sde.drift(x, vec_t, y) - (g**2) * score
        z = complex_normal_like(kz, x)
        x = x + drift * dt + g * jnp.sqrt(-dt) * z
        return (x, key), None

    (xt, _), _ = jax.lax.scan(step, (xt, kloop), ts)
    return dsp.stft_decode(xt, fs, cfg.stft_cfg, length=noisy.shape[-1])
