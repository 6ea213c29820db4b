"""Vectorized environment: the TPU-native replacement for the reference's
16-process ShmemVecEnv (rl/networks/shmem_vec_env.py). A batch of envs is a
leading axis over the pure reset/step functions; auto-reset on done matches
the worker semantics (shmem_vec_env.py:140-142); the obs/reward rewrite of
VecPretextNormalize is fused in when the config uses the neural predictor."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from . import crowd_sim
from .pretext import pretext_process
from .types import EnvState, Observation, StepInfo


def vec_reset(cfg: Config, key, n_envs: int):
    keys = jax.random.split(key, n_envs)
    return jax.vmap(lambda k: crowd_sim.reset(cfg, k))(keys)


def vec_step(cfg: Config, states: EnvState, actions, phase: str = "train",
             gst_params=None):
    """Batched step with auto-reset. Returns (states', obs', rewards (B,),
    dones (B,), infos, pretext_penalties (B,)) — the penalty component is
    reported separately so episode-reward metrics can match the reference's
    Monitor (which sits below the predictor wrapper and excludes it)."""
    states, obs, rew, done, info = jax.vmap(
        lambda s, a: crowd_sim.step(cfg, s, a, phase))(states, actions)

    # auto-reset (worker semantics: obs of done envs is the new episode's
    # first obs; reward/done refer to the terminated step)
    reset_keys = jax.vmap(lambda s: jax.random.fold_in(s.key, 1))(states)
    fresh_states, fresh_obs = jax.vmap(
        lambda k: crowd_sim.reset(cfg, k))(reset_keys)

    def select(a, b):
        d = done.reshape(done.shape + (1,) * (a.ndim - 1))
        return jnp.where(d, a, b)

    states = jax.tree.map(select, fresh_states, states)
    obs = jax.tree.map(select, fresh_obs, obs)

    if cfg.sim.predict_method == "inferred":
        if gst_params is None:
            raise ValueError("GST env requires gst_params")
        states, obs, rew, penalty = jax.vmap(
            lambda s, o, r: pretext_process(cfg, gst_params, s, o, r))(
                states, obs, rew)
    else:
        penalty = jnp.zeros_like(rew)
    return states, obs, rew, done, info, penalty


def vec_reset_with_pretext(cfg: Config, key, n_envs: int, gst_params=None):
    """Reset + initial pretext pass (VecPretextNormalize.reset:85-101)."""
    states, obs = vec_reset(cfg, key, n_envs)
    if cfg.sim.predict_method == "inferred":
        states, obs, _, _ = jax.vmap(
            lambda s, o: pretext_process(cfg, gst_params, s, o,
                                         jnp.float32(0.0)))(states, obs)
    return states, obs
