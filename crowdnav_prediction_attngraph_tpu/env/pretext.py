"""Fused GST-prediction observation/reward processing.

Pure-function equivalent of ``VecPretextNormalize.process_obs_rew``
(rl/vec_env/vec_pretext_normalize.py:112-191). In the reference this runs on
the GPU between the env processes and the policy; here the predictor, the
simulator and the policy live in one XLA program, so this is just another
stage of the fused step — the talk2Env pipe and the host<->device copies
disappear.

Operates on ONE env; batch via ``jax.vmap`` (the predictor's pedestrian
attention then batches over envs x peds on the MXU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.gst.predictor import gst_predict
from .types import EnvState, Observation


def pretext_process(cfg: Config, gst_params, state: EnvState,
                    obs: Observation, rew):
    """Push history, predict 5-step futures, rewrite spatial_edges, add the
    future-collision penalty, sort humans by distance.

    Returns (new_state, new_obs, new_rew, penalty)."""
    A = cfg.sim.max_human_num
    K = cfg.sim.predict_steps
    robot_pos = obs.robot_node[:2]

    # rolling history buffers (vec_pretext_normalize.py:117-128)
    human_pos = robot_pos[None, :] + obs.spatial_edges[:, :2]
    traj_buffer = jnp.roll(state.traj_buffer, -1, axis=0).at[-1].set(human_pos)
    mask_buffer = jnp.roll(state.mask_buffer, -1, axis=0).at[-1].set(
        obs.visible_masks)
    state = state.replace(traj_buffer=traj_buffer, mask_buffer=mask_buffer)

    in_traj = jnp.transpose(traj_buffer[::cfg.pred_interval], (1, 0, 2))
    in_mask = jnp.transpose(mask_buffer[::cfg.pred_interval], (1, 0))

    out_traj, out_mask = gst_predict(cfg.pred, gst_params, in_traj, in_mask)
    out_mask = out_mask[:, 0]                                  # (A,)

    # future-collision penalty (vec_pretext_normalize.py:134-159)
    hr = out_traj[:, :, :2] - robot_pos                        # (A, K, 2)
    hit = jnp.linalg.norm(hr, axis=-1) < cfg.robot.radius + cfg.humans.radius
    hit = hit & out_mask[:, None]
    coeff = 2.0 ** jnp.arange(2, K + 2)                        # 4..64
    penalties = cfg.reward.collision_penalty / coeff           # negative
    penalty = jnp.min(hit * penalties[None, :])
    rew = rew + penalty

    # robot-frame predictions into spatial_edges[:, 2:] only where predicted
    # (vec_pretext_normalize.py:162-170)
    rel = (out_traj[:, :, :2] - robot_pos).reshape(A, 2 * K)
    edges = obs.spatial_edges
    edges = edges.at[:, 2:].set(
        jnp.where(out_mask[:, None], rel, edges[:, 2:]))

    # sort humans by current distance (vec_pretext_normalize.py:173-178)
    order = jnp.argsort(jnp.linalg.norm(edges[:, :2], axis=-1), stable=True)
    edges = edges[order]

    obs = obs.replace(spatial_edges=edges)
    return state, obs, rew, penalty
