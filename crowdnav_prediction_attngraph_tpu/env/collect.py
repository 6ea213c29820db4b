"""Data-collection environment for GST predictor training
(reference crowd_sim/envs/crowd_sim_var_num_collect.py + collect_data.py).

An ORCA-driven robot wanders the crowd forever (goal re-targeted on arrival:
median of humans w.p. 0.5 else uniform; collisions do not terminate —
crowd_sim_var_num_collect.py:163-181) while each step emits
``pred_info = (frame, tracking_id, px, py)`` for every visible human. Humans
that leave the FOV get fresh tracking ids on re-entry
(crowd_sim_var_num_collect.py:106-110), matching the partial-observation
statistics the GST sees at deployment.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import Config
from . import crowd_sim, spawn
from .types import EnvState


@struct.dataclass
class CollectState:
    env: EnvState
    last_observability: jnp.ndarray   # (A,) bool
    pred_id: jnp.ndarray              # (A,) int32 tracking ids
    max_id: jnp.ndarray               # () int32


class PredInfo(NamedTuple):
    frame: jnp.ndarray                # (A,)
    pred_id: jnp.ndarray              # (A,) int32
    pos: jnp.ndarray                  # (A, 2) absolute positions
    valid: jnp.ndarray                # (A,) bool


def reset(cfg: Config, key) -> Tuple[CollectState, PredInfo]:
    env_state, _ = crowd_sim.reset(cfg, key)
    A = cfg.sim.max_human_num
    state = CollectState(
        env=env_state,
        last_observability=jnp.zeros((A,), bool),
        pred_id=jnp.arange(A, dtype=jnp.int32),
        max_id=env_state.human_num.astype(jnp.int32),
    )
    return _emit(cfg, state)


def _emit(cfg: Config, state: CollectState) -> Tuple[CollectState, PredInfo]:
    vis = crowd_sim.robot_human_visibility(cfg, state.env)
    # re-entering humans get fresh ids (crowd_sim_var_num_collect.py:106-110)
    out = state.last_observability & ~vis
    n_out = jnp.sum(out.astype(jnp.int32))
    new_ids = state.max_id + jnp.cumsum(out.astype(jnp.int32)) - 1
    pred_id = jnp.where(out, new_ids, state.pred_id)
    state = state.replace(pred_id=pred_id, max_id=state.max_id + n_out,
                          last_observability=vis)
    frame = state.env.global_time / cfg.data.pred_timestep
    info = PredInfo(
        frame=jnp.full((cfg.sim.max_human_num,), frame),
        pred_id=pred_id,
        pos=state.env.humans.pos,
        valid=vis,
    )
    return state, info


def step(cfg: Config, state: CollectState, key=None
         ) -> Tuple[CollectState, PredInfo]:
    """One collect step: ORCA robot, wandering goal, no terminal states."""
    env_state = state.env

    # redirect the goal when reached (crowd_sim_var_num_collect.py:168-180)
    reached = (jnp.linalg.norm(env_state.robot.pos - env_state.robot.goal)
               < env_state.robot.radius)
    k_env, k_coin, k_goal = jax.random.split(env_state.key, 3)
    active = jnp.arange(cfg.sim.max_human_num) < env_state.human_num
    med = jnp.median(jnp.where(active[:, None], env_state.humans.pos, jnp.nan),
                     axis=0)
    med = jnp.nan_to_num(med)
    rand_goal = jax.random.uniform(k_goal, (2,), minval=-cfg.sim.arena_size,
                                   maxval=cfg.sim.arena_size)
    use_median = jax.random.uniform(k_coin, ()) < 0.5
    new_goal = jnp.where(use_median, med, rand_goal)
    goal = jnp.where(reached, new_goal, env_state.robot.goal)
    env_state = env_state.replace(
        robot=env_state.robot.replace(goal=goal), key=k_env)

    env_state, _, _, _, _ = crowd_sim.step(
        cfg, env_state, jnp.zeros(2), phase="train", robot_policy="orca")
    state = state.replace(env=env_state)
    return _emit(cfg, state)
