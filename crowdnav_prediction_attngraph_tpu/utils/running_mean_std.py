"""Running mean/std + observation/reward normalization
(reference rl/vec_env/running_mean_std.py + vec_normalize.py — vendored
baselines utilities; unused by the shipped recipes but part of the wrapper
toolkit). Functional JAX form: state in, state out, jit-friendly."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class RMSState(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray


def rms_init(shape=()) -> RMSState:
    return RMSState(jnp.zeros(shape), jnp.ones(shape), jnp.float32(1e-4))


def rms_update(state: RMSState, batch) -> RMSState:
    """Parallel-variance update (running_mean_std.py:18-37)."""
    batch = jnp.asarray(batch)
    batch_mean = jnp.mean(batch, axis=0)
    batch_var = jnp.var(batch, axis=0)
    batch_count = batch.shape[0]

    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta ** 2 * state.count * batch_count / tot
    return RMSState(new_mean, m2 / tot, tot)


def normalize_obs(state: RMSState, obs, clip: float = 10.0,
                  epsilon: float = 1e-8):
    """(obs - mean) / sqrt(var + eps), clipped (vec_normalize.py:27-33)."""
    return jnp.clip((obs - state.mean) / jnp.sqrt(state.var + epsilon),
                    -clip, clip)


def normalize_reward(state: RMSState, rew, clip: float = 10.0,
                     epsilon: float = 1e-8):
    """Reward scaled by return std (vec_normalize.py:35-39)."""
    return jnp.clip(rew / jnp.sqrt(state.var + epsilon), -clip, clip)
