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


class CategoricalParams(nn.Module):
    """Categorical head (reference distributions.py:59-72): a single linear
    with orthogonal(gain=0.01) init producing logits."""

    num_outputs: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_outputs, name="linear",
                        kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(x)


def categorical_sample(key, logits):
    """FixedCategorical.sample (distributions.py:19-20): index, unsqueezed."""
    return jax.random.categorical(key, logits, axis=-1)[..., None]


def categorical_log_prob(logits, actions):
    """FixedCategorical.log_probs (distributions.py:22-29): (B,1) summed."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    idx = actions.reshape(actions.shape[0]).astype(jnp.int32)
    return jnp.take_along_axis(logp, idx[:, None], axis=-1)


def categorical_entropy(logits):
    """torch Categorical.entropy(): -(p * log p).sum over categories."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_mode(logits):
    """FixedCategorical.mode (distributions.py:31-32): argmax, keepdim."""
    return jnp.argmax(logits, axis=-1, keepdims=True)


class BernoulliParams(nn.Module):
    """Bernoulli head (reference distributions.py:97-109): a single linear
    with orthogonal(gain=1.0) init producing per-dim logits."""

    num_outputs: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_outputs, name="linear",
                        kernel_init=nn.initializers.orthogonal(1.0),
                        bias_init=nn.initializers.zeros)(x)


def bernoulli_sample(key, logits):
    return (jax.random.uniform(key, logits.shape)
            < jax.nn.sigmoid(logits)).astype(jnp.float32)


def bernoulli_log_prob(logits, actions):
    """FixedBernoulli.log_probs (distributions.py:48-49): per-dim
    logits-based BCE, summed over dims with keepdim."""
    lp = actions * jax.nn.log_sigmoid(logits) \
        + (1.0 - actions) * jax.nn.log_sigmoid(-logits)
    return jnp.sum(lp.reshape(lp.shape[0], -1), axis=-1, keepdims=True)


def bernoulli_entropy(logits):
    """FixedBernoulli.entropy (distributions.py:51-52): summed over dims."""
    p = jax.nn.sigmoid(logits)
    ent = -(p * jax.nn.log_sigmoid(logits)
            + (1.0 - p) * jax.nn.log_sigmoid(-logits))
    return jnp.sum(ent, axis=-1)


def bernoulli_mode(logits):
    """FixedBernoulli.mode (distributions.py:54-55): probs > 0.5."""
    return (logits > 0.0).astype(jnp.float32)
