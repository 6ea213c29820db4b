"""Action distribution heads (reference rl/networks/distributions.py:59-109)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

LOG_2PI = math.log(2.0 * math.pi)


class DiagGaussianParams(nn.Module):
    """DiagGaussian head: state-dependent mean + state-independent logstd
    (distributions.py:76-95; logstd is the reference's AddBias over zeros)."""

    num_outputs: int

    @nn.compact
    def __call__(self, x):
        mean = nn.Dense(self.num_outputs, name="fc_mean",
                        kernel_init=nn.initializers.orthogonal(1.0),
                        bias_init=nn.initializers.zeros)(x)
        logstd = self.param("logstd", nn.initializers.zeros,
                            (self.num_outputs,))
        return mean, jnp.broadcast_to(logstd, mean.shape)


def sample(key, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape)


def log_prob(mean, logstd, actions):
    """Summed-over-dims Gaussian log prob (FixedNormal.log_probs,
    distributions.py:37-38)."""
    var = jnp.exp(2.0 * logstd)
    lp = -((actions - mean) ** 2) / (2.0 * var) - logstd - 0.5 * LOG_2PI
    return jnp.sum(lp, axis=-1, keepdims=True)


def entropy(logstd):
    """Per-dimension Gaussian entropies (torch Normal.entropy()).

    The reference's scalar `dist_entropy` is `.entropy().mean()` — the mean
    over batch AND action dims (FixedNormal's summed variant is dead code, a
    typo'd `entrop`, distributions.py:40-41) — so callers take jnp.mean."""
    return 0.5 + 0.5 * LOG_2PI + logstd


def mode(mean):
    return mean
