"""Batched ORCA (Optimal Reciprocal Collision Avoidance) in pure JAX.

TPU-native replacement for the reference's only native dependency — the RVO2
C++ solver behind ``import rvo2`` (reference crowd_nav/policy/orca.py:64-117).
The reference creates one RVO2 simulator *per agent per step*, reads back only
the ego agent's velocity, and assumes neighbors have zero preferred velocity;
the ego's new velocity therefore depends only on (ego state, neighbor states),
which makes the computation embarrassingly parallel. Here it is a fixed-shape
masked kernel: ``vmap`` over agents and again over the env batch turns the
whole crowd into a handful of fused VPU element-wise ops — no Python, no C++
round trips, no dynamic shapes.

Algorithm follows the published RVO2 formulation (van den Berg et al.,
"Reciprocal n-Body Collision Avoidance", ISRR 2009): per-neighbor half-plane
(ORCA line) construction, then an incremental 2D linear program (LP1/LP2) with
a projection fallback (LP3) when infeasible. Data-dependent control flow is
replaced by masked arithmetic with a sequential ``lax.fori_loop`` only over
the (static) max line count.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5      # RVO_EPSILON
_SAFE = 1e-9     # guard against 0/0 in degenerate (coincident-agent) states

# A/B toggles for the sequential-LP cost inside the fused train program
# (see RESULTS.md round-4 notes): dynamic inner bound halves LP3's nest in
# isolation but interacts with XLA scheduling of the full program.
_DYN_LIMIT = os.environ.get("ORCA_DYN_LIMIT", "1") != "0"
_UNROLL = int(os.environ.get("ORCA_UNROLL", "3"))


def _det(a, b):
    """2x2 determinant of stacked 2-vectors; broadcasts over leading dims."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


class OrcaParams(NamedTuple):
    time_step: float
    time_horizon: float
    neighbor_dist: jnp.ndarray  # () — may be a traced per-env scalar


def orca_lines(ego_pos, ego_vel, ego_radius, nbr_pos, nbr_vel, nbr_radius,
               nbr_mask, params: OrcaParams):
    """Construct ORCA half-planes for one ego agent vs N (masked) neighbors.

    Returns (direction (N,2), point (N,2), valid (N,)).
    Neighbors outside ``neighbor_dist`` are dropped, matching RVO2's KdTree
    range query (distSq < rangeSq).
    """
    inv_th = 1.0 / params.time_horizon
    inv_dt = 1.0 / params.time_step

    rel_pos = nbr_pos - ego_pos[None, :]                    # (N, 2)
    rel_vel = ego_vel[None, :] - nbr_vel                    # (N, 2)
    dist_sq = jnp.sum(rel_pos * rel_pos, axis=-1)           # (N,)
    comb_r = ego_radius + nbr_radius                        # (N,)
    comb_r_sq = comb_r * comb_r

    valid = nbr_mask & (dist_sq < params.neighbor_dist ** 2)

    no_collision = dist_sq > comb_r_sq

    # --- no-collision branch -------------------------------------------------
    w = rel_vel - inv_th * rel_pos                          # (N, 2)
    w_len_sq = jnp.sum(w * w, axis=-1)
    dot1 = jnp.sum(w * rel_pos, axis=-1)
    # project on cut-off circle?
    on_circle = (dot1 < 0.0) & (dot1 * dot1 > comb_r_sq * w_len_sq)

    w_len = jnp.sqrt(jnp.maximum(w_len_sq, _SAFE))
    unit_w = w / w_len[:, None]
    dir_circle = jnp.stack([unit_w[:, 1], -unit_w[:, 0]], axis=-1)
    u_circle = (comb_r * inv_th - w_len)[:, None] * unit_w

    # project on legs
    leg = jnp.sqrt(jnp.maximum(dist_sq - comb_r_sq, 0.0))
    left_leg = (rel_pos[:, 0] * leg - rel_pos[:, 1] * comb_r,
                rel_pos[:, 0] * comb_r + rel_pos[:, 1] * leg)
    right_leg = (rel_pos[:, 0] * leg + rel_pos[:, 1] * comb_r,
                 -rel_pos[:, 0] * comb_r + rel_pos[:, 1] * leg)
    use_left = _det(rel_pos, w) > 0.0
    safe_dist_sq = jnp.maximum(dist_sq, _SAFE)
    dir_leg = jnp.where(
        use_left[:, None],
        jnp.stack(left_leg, axis=-1),
        -jnp.stack(right_leg, axis=-1),
    ) / safe_dist_sq[:, None]
    dot2 = jnp.sum(rel_vel * dir_leg, axis=-1)
    u_leg = dot2[:, None] * dir_leg - rel_vel

    dir_nc = jnp.where(on_circle[:, None], dir_circle, dir_leg)
    u_nc = jnp.where(on_circle[:, None], u_circle, u_leg)

    # --- collision branch ----------------------------------------------------
    w_c = rel_vel - inv_dt * rel_pos
    w_c_len = jnp.maximum(_norm(w_c), _SAFE)
    unit_w_c = w_c / w_c_len[:, None]
    dir_c = jnp.stack([unit_w_c[:, 1], -unit_w_c[:, 0]], axis=-1)
    u_c = (comb_r * inv_dt - w_c_len)[:, None] * unit_w_c

    direction = jnp.where(no_collision[:, None], dir_nc, dir_c)
    u = jnp.where(no_collision[:, None], u_nc, u_c)
    point = ego_vel[None, :] + 0.5 * u   # reciprocity: share avoidance 50/50
    return direction, point, valid


def _lp1(lines_dir, lines_pt, constraint_mask, line_no, radius, opt_vel,
         direction_opt: bool, current_result):
    """RVO2 linearProgram1: optimize along line ``line_no`` subject to the
    constraints selected by ``constraint_mask`` (vectorized over all slots).

    Returns (result, feasible). On infeasible, result = current_result.
    """
    d = lines_dir[line_no]
    p = lines_pt[line_no]

    dot = jnp.dot(p, d)
    disc = dot * dot + radius * radius - jnp.dot(p, p)
    feasible = disc >= 0.0
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_left = -dot - sqrt_disc
    t_right = -dot + sqrt_disc

    denom = _det(d[None, :], lines_dir)                     # (N,)
    numer = _det(lines_dir, p[None, :] - lines_pt)          # (N,)
    parallel = jnp.abs(denom) <= _EPS

    # parallel & numer < 0 -> line_no entirely violates constraint i
    feasible &= ~jnp.any(constraint_mask & parallel & (numer < 0.0))

    t = numer / jnp.where(parallel, 1.0, denom)
    upper = constraint_mask & ~parallel & (denom >= 0.0)
    lower = constraint_mask & ~parallel & (denom < 0.0)
    t_right = jnp.minimum(t_right, jnp.min(jnp.where(upper, t, jnp.inf)))
    t_left = jnp.maximum(t_left, jnp.max(jnp.where(lower, t, -jnp.inf)))
    feasible &= t_left <= t_right

    if direction_opt:
        t_opt = jnp.where(jnp.dot(opt_vel, d) > 0.0, t_right, t_left)
    else:
        t_opt = jnp.clip(jnp.dot(d, opt_vel - p), t_left, t_right)

    result = p + t_opt * d
    return jnp.where(feasible, result, current_result), feasible


def _lp2(lines_dir, lines_pt, line_valid, radius, opt_vel,
         direction_opt: bool, n_limit=None):
    """RVO2 linearProgram2: sequential incremental 2D LP over masked lines.

    Returns (result, fail_idx); fail_idx == N means fully feasible.
    ``n_limit`` (possibly traced) bounds the loop to the first ``n_limit``
    lines — LP3's inner calls only ever constrain on lines j < i, so passing
    i halves the sequential work of the dominant O(lines^2) nest (the
    skipped iterations were provably no-ops under the ``idx < n_limit``
    validity mask).
    """
    n = lines_dir.shape[0]
    if direction_opt:
        result0 = opt_vel * radius
    else:
        speed = _norm(opt_vel)
        result0 = jnp.where(speed > radius, opt_vel / jnp.maximum(speed, _SAFE) * radius,
                            opt_vel)

    idx = jnp.arange(n)

    def body(i, carry):
        result, fail = carry
        active = line_valid[i] & (fail == n)
        violated = _det(lines_dir[i], lines_pt[i] - result) > 0.0
        need = active & violated
        cmask = line_valid & (idx < i)
        new_result, feas = _lp1(lines_dir, lines_pt, cmask, i, radius,
                                opt_vel, direction_opt, result)
        result = jnp.where(need, new_result, result)
        fail = jnp.where(need & ~feas, i, fail)
        return result, fail

    if n_limit is None or not _DYN_LIMIT:
        return jax.lax.fori_loop(0, n, body, (result0, jnp.int32(n)),
                                 unroll=_UNROLL)
    return jax.lax.fori_loop(0, n_limit, body, (result0, jnp.int32(n)))


def _lp3(lines_dir, lines_pt, line_valid, fail_begin, radius, result):
    """RVO2 linearProgram3: minimize the maximum constraint violation when the
    LP is infeasible (dense collision states)."""
    n = lines_dir.shape[0]
    idx = jnp.arange(n)

    def body(i, carry):
        result, distance = carry
        d_i = lines_dir[i]
        p_i = lines_pt[i]
        active = line_valid[i] & (i >= fail_begin)
        need = active & (_det(d_i, p_i - result) > distance)

        # Projected constraint lines between line i and every line j < i.
        determinant = _det(d_i[None, :], lines_dir)          # (N,)
        parallel = jnp.abs(determinant) <= _EPS
        same_dir = jnp.sum(d_i[None, :] * lines_dir, axis=-1) > 0.0
        mid_point = 0.5 * (p_i[None, :] + lines_pt)
        t_proj = _det(lines_dir, p_i[None, :] - lines_pt) / \
            jnp.where(parallel, 1.0, determinant)
        gen_point = p_i[None, :] + t_proj[:, None] * d_i[None, :]
        proj_pt = jnp.where(parallel[:, None], mid_point, gen_point)
        dir_diff = lines_dir - d_i[None, :]
        dir_len = jnp.maximum(_norm(dir_diff), _SAFE)
        proj_dir = dir_diff / dir_len[:, None]
        # parallel lines pointing the same way impose no projected constraint
        proj_valid = line_valid & (idx < i) & ~(parallel & same_dir)

        perp = jnp.array([-d_i[1], d_i[0]])
        # only lines j < i are valid constraints here (proj_valid masks them),
        # so bound the inner LP at i — cuts the nest from n^2 to n(n-1)/2
        res2, fail2 = _lp2(proj_dir, proj_pt, proj_valid, radius, perp, True,
                           n_limit=i)
        ok = fail2 == n
        new_result = jnp.where(need & ok, res2, result)
        new_distance = jnp.where(need, _det(d_i, p_i - new_result), distance)
        return new_result, new_distance

    result, _ = jax.lax.fori_loop(0, n, body,
                                  (result, jnp.zeros((), result.dtype)),
                                  unroll=_UNROLL)
    return result


def orca_velocity(ego_pos, ego_vel, ego_radius, ego_max_speed, pref_vel,
                  nbr_pos, nbr_vel, nbr_radius, nbr_mask,
                  params: OrcaParams):
    """Compute the ego agent's new ORCA velocity.

    All radii must already include RVO2's +0.01 margin and the configured
    safety space (reference orca.py:85-89). ``pref_vel`` is the (already
    unit-clipped, orca.py:98-100) preferred velocity.
    """
    direction, point, valid = orca_lines(
        ego_pos, ego_vel, ego_radius, nbr_pos, nbr_vel, nbr_radius, nbr_mask,
        params)
    result, fail = _lp2(direction, point, valid, ego_max_speed, pref_vel, False)
    n = direction.shape[0]
    needs_lp3 = fail < n
    result_lp3 = _lp3(direction, point, valid, fail, ego_max_speed, result)
    return jnp.where(needs_lp3, result_lp3, result)


# vmap over a crowd of ego agents sharing one neighbor-set layout.
orca_velocity_crowd = jax.vmap(
    orca_velocity,
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None),
)


def orca_velocity_batch(ego_pos, ego_vel, ego_radius, ego_max_speed, pref_vel,
                        nbr_pos, nbr_vel, nbr_radius, nbr_mask,
                        time_step: float, time_horizon: float, neighbor_dist):
    """Flat-batch ORCA (E egos, each with its own neighbor slice and
    ``neighbor_dist`` (E,)) with a BATCH-LEVEL lazy LP3.

    ``orca_velocity`` under vmap always pays the LP3 projection pass — a
    sequential O(lines^2) fori_loop nest (~440 tiny steps) — because a
    per-ego ``lax.cond`` inside vmap lowers to a select that executes both
    branches. Infeasible LP2s are rare in steady state (dense collision
    states only), so here LP2 runs vectorized for every ego and the LP3 pass
    sits behind ONE top-level ``lax.cond`` over the whole batch: on the
    common all-feasible step the expensive nest is skipped entirely.
    Results are bit-identical to ``orca_velocity`` either way (LP3 output is
    only selected where LP2 failed)."""

    def lines_lp2(ep, ev, er, ems, pv, np_, nv, nr, nm, nd):
        params = OrcaParams(time_step, time_horizon, nd)
        d, p, valid = orca_lines(ep, ev, er, np_, nv, nr, nm, params)
        res, fail = _lp2(d, p, valid, ems, pv, False)
        return d, p, valid, res, fail

    d, p, valid, res, fail = jax.vmap(lines_lp2)(
        ego_pos, ego_vel, ego_radius, ego_max_speed, pref_vel,
        nbr_pos, nbr_vel, nbr_radius, nbr_mask, neighbor_dist)
    n = d.shape[1]
    needs = fail < n

    def run_lp3(res):
        lp3 = jax.vmap(_lp3)(d, p, valid, fail, ego_max_speed, res)
        return jnp.where(needs[:, None], lp3, res)

    return jax.lax.cond(jnp.any(needs), run_lp3, lambda r: r, res)
