"""Episode-generation primitives: seeded robot/human spawning.

Replaces the reference's NumPy rejection-sampling loops
(crowd_sim_var_num.py:64-146, crowd_sim.py:203-236, 413-485) with
bounded-iteration ``lax.while_loop`` + key folding so the whole reset is
jittable. Exact RNG-stream equality with NumPy is impossible; parity is
distributional (SURVEY.md section 7 design stance).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

MAX_TRIES = 128


def sample_robot_position(key, arena_size: float, min_goal_dist: float):
    """Holonomic robot spawn: U(-arena, arena)^4 until |p-g| >= min_goal_dist
    (crowd_sim_var_num.py:96-101; min dist 8)."""

    def cond(carry):
        key, pxy_gxy, ok = carry
        return ~ok

    def body(carry):
        key, _, _ = carry
        key, sub = jax.random.split(key)
        vals = jax.random.uniform(sub, (4,), minval=-arena_size, maxval=arena_size)
        ok = jnp.linalg.norm(vals[:2] - vals[2:]) >= min_goal_dist
        return key, vals, ok

    key, sub = jax.random.split(key)
    vals = jax.random.uniform(sub, (4,), minval=-arena_size, maxval=arena_size)
    ok = jnp.linalg.norm(vals[:2] - vals[2:]) >= min_goal_dist
    _, vals, _ = jax.lax.while_loop(cond, body, (key, vals, ok))
    return vals[:2], vals[2:]


def sample_unicycle_robot(key, arena_size: float, min_goal_dist: float):
    """Unicycle robot spawn on the arena circle (crowd_sim_var_num.py:78-87)."""
    key, k1, k2, k3 = jax.random.split(key, 4)
    angle = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
    pos = arena_size * jnp.stack([jnp.cos(angle), jnp.sin(angle)])

    def cond(carry):
        key, g, ok = carry
        return ~ok

    def body(carry):
        key, _, _ = carry
        key, sub = jax.random.split(key)
        g = jax.random.uniform(sub, (2,), minval=-arena_size, maxval=arena_size)
        return key, g, jnp.linalg.norm(pos - g) >= min_goal_dist

    g0 = jax.random.uniform(k2, (2,), minval=-arena_size, maxval=arena_size)
    _, goal, _ = jax.lax.while_loop(cond, body,
                                    (key, g0, jnp.linalg.norm(pos - g0) >= min_goal_dist))
    theta = jax.random.uniform(k3, (), minval=0.0, maxval=2 * jnp.pi)
    return pos, goal, theta


def sample_human_attributes(key, randomize: bool, default_radius: float,
                            default_v_pref: float):
    """v_pref ~ U(0.5, 1.5), radius ~ U(0.3, 0.5) when randomized (agent.py:44-50)."""
    if not randomize:
        return jnp.float32(default_radius), jnp.float32(default_v_pref)
    k1, k2 = jax.random.split(key)
    v_pref = jax.random.uniform(k1, (), minval=0.5, maxval=1.5)
    radius = jax.random.uniform(k2, (), minval=0.3, maxval=0.5)
    return radius, v_pref


def _position_collides(pos, self_radius, agent_pos, agent_goal, agent_radius,
                       agent_mask, discomfort_dist, min_dist_override=None):
    """Rejection predicate (crowd_sim_var_num.py:131-140): candidate must keep
    min_dist from every active agent's position AND goal."""
    min_dist = self_radius + agent_radius + discomfort_dist
    if min_dist_override is not None:
        min_dist = jnp.where(min_dist_override[0], min_dist_override[1], min_dist)
    d_pos = jnp.linalg.norm(pos[None, :] - agent_pos, axis=-1)
    d_goal = jnp.linalg.norm(pos[None, :] - agent_goal, axis=-1)
    hit = agent_mask & ((d_pos < min_dist) | (d_goal < min_dist))
    return jnp.any(hit)


def sample_circle_crossing_position(key, self_radius, circle_radius: float,
                                    agent_pos, agent_goal, agent_radius,
                                    agent_mask, discomfort_dist: float,
                                    robot_min_dist=None):
    """Var-num circle-crossing human spawn (crowd_sim_var_num.py:116-146).

    angle ~ U(0, 2pi); noise ~ U(0, 1)*2 per axis; goal = -position.
    ``agent_*[0]`` is expected to be the robot; ``robot_min_dist`` optionally
    overrides the robot clearance (unicycle: circle_radius/2, line 133-134).
    Bounded to MAX_TRIES rejections.
    """

    def propose(key):
        key, k1, k2 = jax.random.split(key, 3)
        angle = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
        noise = jax.random.uniform(k2, (2,)) * 2.0
        pos = circle_radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)]) + noise
        if robot_min_dist is not None:
            override = (jnp.arange(agent_pos.shape[0]) == 0, robot_min_dist)
        else:
            override = None
        bad = _position_collides(pos, self_radius, agent_pos, agent_goal,
                                 agent_radius, agent_mask, discomfort_dist,
                                 override)
        return key, pos, bad

    def cond(carry):
        key, pos, bad, tries = carry
        return bad & (tries < MAX_TRIES)

    def body(carry):
        key, _, _, tries = carry
        key, pos, bad = propose(key)
        return key, pos, bad, tries + 1

    key, pos, bad = propose(key)
    _, pos, _, _ = jax.lax.while_loop(cond, body, (key, pos, bad, 0))
    return pos, -pos


def sample_goal_on_circle(key, self_radius, v_pref, circle_radius: float,
                          agent_pos, agent_goal, agent_radius, agent_mask,
                          discomfort_dist: float):
    """New mid-episode goal (crowd_sim.py:427-446): circle point + U(-.5,.5)*v_pref
    noise, rejected against other agents' positions and goals."""
    v = jnp.where(v_pref == 0.0, 1.0, v_pref)

    def propose(key):
        key, k1, k2 = jax.random.split(key, 3)
        angle = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
        noise = (jax.random.uniform(k2, (2,)) - 0.5) * v
        g = circle_radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)]) + noise
        bad = _position_collides(g, self_radius, agent_pos, agent_goal,
                                 agent_radius, agent_mask, discomfort_dist)
        return key, g, bad

    def cond(carry):
        key, g, bad, tries = carry
        return bad & (tries < MAX_TRIES)

    def body(carry):
        key, _, _, tries = carry
        key, g, bad = propose(key)
        return key, g, bad, tries + 1

    key, g, bad = propose(key)
    _, g, _, _ = jax.lax.while_loop(cond, body, (key, g, bad, 0))
    return g
