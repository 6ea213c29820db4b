"""Pure-function agent kinematics (reference crowd_sim/envs/utils/agent.py:143-183)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def step_holonomic(pos, action_vxy, dt):
    """Holonomic integration (agent.py:145-147, 177-179).

    Returns (new_pos, new_vel)."""
    return pos + action_vxy * dt, action_vxy


def step_unicycle(pos, theta, action_v, action_r, dt):
    """Differential-drive integration (agent.py:156-165, 181-183).

    ``action_r`` is a delta-heading per step. Returns (pos, theta, vel)."""
    eps = 1e-4
    w = action_r / dt
    r_turn = jnp.where(jnp.abs(action_r) < eps, 0.0,
                       action_v / jnp.where(jnp.abs(action_r) < eps, 1.0, w))
    px = pos[0] - r_turn * jnp.sin(theta) + r_turn * jnp.sin(theta + action_r)
    py = pos[1] + r_turn * jnp.cos(theta) - r_turn * jnp.cos(theta + action_r)
    new_theta = jnp.mod(theta + action_r, TWO_PI)
    vel = jnp.stack([action_v * jnp.cos(new_theta), action_v * jnp.sin(new_theta)])
    return jnp.stack([px, py]), new_theta, vel


def clip_holonomic_action(raw_action, v_pref):
    """Norm-clip a raw (vx, vy) to the preferred speed (srnn.py:28-33)."""
    norm = jnp.linalg.norm(raw_action)
    scale = jnp.where(norm > v_pref, v_pref / jnp.maximum(norm, 1e-9), 1.0)
    return raw_action * scale


def clip_unicycle_action(raw_action):
    """Clip (delta_v, delta_theta) for the unicycle robot (srnn.py:37-44)."""
    dv = jnp.clip(raw_action[0], -0.1, 0.087)
    dtheta = jnp.clip(raw_action[1], -0.06, 0.06)
    return jnp.stack([dv, dtheta])
