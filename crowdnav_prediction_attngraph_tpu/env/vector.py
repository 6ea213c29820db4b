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


def batched_human_actions(cfg: Config, states: EnvState):
    """ORCA for every human of every env in one flat batch, with the LP3
    projection pass behind a single batch-level cond (env/orca.py::
    orca_velocity_batch) — a per-env cond under vmap would lower to a select
    that always pays the sequential O(lines^2) LP3 nest. Non-ORCA crowd
    policies return None (the per-env path inside step handles them)."""
    if cfg.humans.policy != "orca" or not cfg.orca.lazy_lp3:
        return None
    from .crowd_sim import build_human_neighbor_inputs, orca_pref_velocity
    from .orca import orca_velocity_batch

    nbr_pos, nbr_vel, nbr_radius, nbr_mask, active = jax.vmap(
        lambda s: build_human_neighbor_inputs(cfg, s))(states)
    pref_vel = jax.vmap(orca_pref_velocity)(states)
    inflate = 0.01 + cfg.orca.safety_space
    B, A = nbr_mask.shape[:2]
    flat = lambda x: x.reshape((B * A,) + x.shape[2:])
    nd = jnp.broadcast_to(states.orca_neighbor_dist[:, None], (B, A))
    act = orca_velocity_batch(
        flat(states.humans.pos), flat(states.humans.vel),
        flat(states.humans.radius + inflate), flat(states.humans.v_pref),
        flat(pref_vel), flat(nbr_pos), flat(nbr_vel),
        flat(nbr_radius + inflate), flat(nbr_mask),
        cfg.env.time_step, cfg.orca.time_horizon, flat(nd))
    act = act.reshape(B, A, 2)
    return jnp.where(active[:, :, None], act, 0.0)


def vec_step(cfg: Config, states: EnvState, actions, phase: str = "train",
             gst_params=None, spin_coef=None):
    """Batched step with auto-reset. Returns (states', obs', rewards (B,),
    dones (B,), infos, pretext_penalties (B,)) — the penalty component is
    reported separately so episode-reward metrics can match the reference's
    Monitor (which sits below the predictor wrapper and excludes it)."""
    human_actions = batched_human_actions(cfg, states)
    if human_actions is None:
        states, obs, rew, done, info = jax.vmap(
            lambda s, a: crowd_sim.step(cfg, s, a, phase,
                                        spin_coef=spin_coef))(states, actions)
    else:
        states, obs, rew, done, info = jax.vmap(
            lambda s, a, h: crowd_sim.step(cfg, s, a, phase,
                                           human_actions=h,
                                           spin_coef=spin_coef))(
                states, actions, human_actions)

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
