"""Episode-generation primitives: seeded robot/human spawning.

Replaces the reference's NumPy rejection-sampling loops
(crowd_sim_var_num.py:64-146, crowd_sim.py:203-236, 413-485) with
fixed-round batched proposal/rejection passes so the whole reset — and the
respawn/goal-change events inside every step — have constant, shallow serial
depth on TPU (data-dependent ``while`` loops measured ~120x slower).
Exact RNG-stream equality with NumPy is impossible; parity is distributional
(SURVEY.md section 7 design stance).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_robot_position(key, arena_size: float, min_goal_dist: float,
                          n_candidates: int = 24):
    """Holonomic robot spawn: U(-arena, arena)^4 until |p-g| >= min_goal_dist
    (crowd_sim_var_num.py:96-101; min dist 8). Rejection sampling is done with
    ``n_candidates`` parallel draws (first valid wins; deterministic corner
    fallback at ~1e-4 probability) — no data-dependent loop."""
    vals = jax.random.uniform(key, (n_candidates, 4), minval=-arena_size,
                              maxval=arena_size)
    ok = jnp.linalg.norm(vals[:, :2] - vals[:, 2:], axis=-1) >= min_goal_dist
    first = jnp.argmax(ok)
    fallback = jnp.array([-arena_size, -arena_size, arena_size, arena_size])
    chosen = jnp.where(jnp.any(ok), vals[first], fallback)
    return chosen[:2], chosen[2:]


def sample_unicycle_robot(key, arena_size: float, min_goal_dist: float,
                          n_candidates: int = 24):
    """Unicycle robot spawn on the arena circle (crowd_sim_var_num.py:78-87).
    Goal rejection via parallel candidate draws (see sample_robot_position)."""
    k1, k2, k3 = jax.random.split(key, 3)
    angle = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
    pos = arena_size * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
    g = jax.random.uniform(k2, (n_candidates, 2), minval=-arena_size,
                           maxval=arena_size)
    ok = jnp.linalg.norm(pos[None] - g, axis=-1) >= min_goal_dist
    goal = jnp.where(jnp.any(ok), g[jnp.argmax(ok)], -pos)
    theta = jax.random.uniform(k3, (), minval=0.0, maxval=2 * jnp.pi)
    return pos, goal, theta


def batched_circle_spawn(key, need, self_radius, circle_radius: float,
                         robot_pos, robot_goal, robot_radius,
                         humans_pos, humans_goal, humans_radius, placed,
                         discomfort_dist: float, rounds: int = 10,
                         robot_min_dist=None):
    """Spawn circle-crossing humans for every slot in ``need`` simultaneously.

    TPU-first replacement for the reference's per-human sequential rejection
    loops (crowd_sim_var_num.py:116-146): each of ``rounds`` fixed iterations
    proposes positions for all still-unplaced slots at once, rejects against
    the robot (position+goal), already-placed humans, and lower-indexed
    accepted proposals (a priority order standing in for the reference's
    sequential placement). Serial depth is ``rounds`` instead of
    slots x tries. After the final round any remaining slot accepts its last
    proposal (statistically negligible: a proposal collides rarely).

    Returns (pos (A, 2), goal (A, 2)) — valid for slots in ``need``.
    """
    A = need.shape[0]
    idx = jnp.arange(A)

    def round_body(_, carry):
        key, pos, placed_now = carry
        key, k1, k2 = jax.random.split(key, 3)
        angle = jax.random.uniform(k1, (A,), minval=0.0, maxval=2 * jnp.pi)
        noise = jax.random.uniform(k2, (A, 2)) * 2.0
        prop = circle_radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)],
                                         axis=-1) + noise
        pending = need & ~placed_now
        cand = jnp.where(pending[:, None], prop, pos)

        # min separation: r_i + r_other + discomfort
        def pair_ok(other_pos, other_goal, other_radius, other_mask):
            # other_*: (M, ...) -> (A, M) collision flags
            md = self_radius[:, None] + other_radius[None, :] + discomfort_dist
            dp = jnp.linalg.norm(cand[:, None, :] - other_pos[None, :, :],
                                 axis=-1)
            dg = jnp.linalg.norm(cand[:, None, :] - other_goal[None, :, :],
                                 axis=-1)
            return jnp.any(other_mask[None, :] & ((dp < md) | (dg < md)),
                           axis=1)

        md_rob = self_radius + robot_radius + discomfort_dist
        if robot_min_dist is not None:
            md_rob = jnp.full_like(md_rob, robot_min_dist)
        bad = (jnp.linalg.norm(cand - robot_pos, axis=-1) < md_rob) | \
              (jnp.linalg.norm(cand - robot_goal, axis=-1) < md_rob)
        # obstacles: original humans + proposals accepted in earlier rounds
        cur_goal = jnp.where((need & placed_now)[:, None], -pos, humans_goal)
        bad |= pair_ok(pos, cur_goal, humans_radius, placed_now & ~pending)
        # cross-check among this round's proposals: slot i defers to j < i
        md_pp = self_radius[:, None] + self_radius[None, :] + discomfort_dist
        dpp = jnp.linalg.norm(cand[:, None, :] - cand[None, :, :], axis=-1)
        dpg = jnp.linalg.norm(cand[:, None, :] + cand[None, :, :], axis=-1)
        lower = (idx[None, :] < idx[:, None]) & pending[None, :]
        bad |= jnp.any(lower & ((dpp < md_pp) | (dpg < md_pp)), axis=1)

        accept = pending & ~bad
        pos = jnp.where(accept[:, None], cand, pos)
        placed_now = placed_now | accept
        return key, pos, placed_now

    key, k0, k1 = jax.random.split(key, 3)
    angle0 = jax.random.uniform(k0, (A,), minval=0.0, maxval=2 * jnp.pi)
    noise0 = jax.random.uniform(k1, (A, 2)) * 2.0
    fallback = circle_radius * jnp.stack([jnp.cos(angle0), jnp.sin(angle0)],
                                         axis=-1) + noise0
    pos0 = jnp.where(need[:, None], fallback, humans_pos)
    key, pos, _ = jax.lax.fori_loop(0, rounds, round_body,
                                    (key, pos0, placed & ~need))
    goal = jnp.where(need[:, None], -pos, humans_goal)
    pos = jnp.where(need[:, None], pos, humans_pos)
    return pos, goal


def batched_goal_resample(key, need, self_radius, v_pref, circle_radius: float,
                          robot_pos, robot_goal, robot_radius,
                          humans_pos, humans_goal, humans_radius, active,
                          discomfort_dist: float, rounds: int = 8):
    """Resample mid-episode goals for all ``need`` slots at once
    (batched form of crowd_sim.py:415-450's per-human rejection loops).

    Returns goals (A, 2) — resampled where ``need``, original otherwise."""
    A = need.shape[0]
    idx = jnp.arange(A)
    v = jnp.where(v_pref == 0.0, 1.0, v_pref)

    def round_body(_, carry):
        key, goal, done = carry
        key, k1, k2 = jax.random.split(key, 3)
        angle = jax.random.uniform(k1, (A,), minval=0.0, maxval=2 * jnp.pi)
        noise = (jax.random.uniform(k2, (A, 2)) - 0.5) * v[:, None]
        prop = circle_radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)],
                                         axis=-1) + noise
        pending = need & ~done
        md_rob = self_radius + robot_radius + discomfort_dist
        bad = (jnp.linalg.norm(prop - robot_pos, axis=-1) < md_rob) | \
              (jnp.linalg.norm(prop - robot_goal, axis=-1) < md_rob)
        others = active & (idx[None, :] != idx[:, None])
        md = self_radius[:, None] + humans_radius[None, :] + discomfort_dist
        dp = jnp.linalg.norm(prop[:, None, :] - humans_pos[None, :, :], axis=-1)
        dg = jnp.linalg.norm(prop[:, None, :] - humans_goal[None, :, :], axis=-1)
        bad |= jnp.any(others & ((dp < md) | (dg < md)), axis=1)
        accept = pending & ~bad
        goal = jnp.where(accept[:, None], prop, goal)
        done = done | accept
        return key, goal, done

    key, k0, k1 = jax.random.split(key, 3)
    angle0 = jax.random.uniform(k0, (A,), minval=0.0, maxval=2 * jnp.pi)
    noise0 = (jax.random.uniform(k1, (A, 2)) - 0.5) * v[:, None]
    fb = circle_radius * jnp.stack([jnp.cos(angle0), jnp.sin(angle0)],
                                   axis=-1) + noise0
    goal0 = jnp.where(need[:, None], fb, humans_goal)
    _, goal, _ = jax.lax.fori_loop(0, rounds, round_body,
                                   (key, goal0, ~need))
    return goal
