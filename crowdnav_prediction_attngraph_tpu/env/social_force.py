"""Batched social-force crowd policy (reference crowd_nav/policy/social_force.py:11-49)."""

from __future__ import annotations

import jax.numpy as jnp


def social_force_velocity(ego_pos, ego_vel, ego_radius, ego_goal, ego_v_pref,
                          nbr_pos, nbr_radius, nbr_mask,
                          A: float, B: float, KI: float, time_step: float):
    """New velocity for one ego agent under the circular social-force model.

    Goal attraction (social_force.py:16-23) + exponential inter-agent repulsion
    (social_force.py:26-35), velocity-norm clipped to v_pref (41-49).
    Masked neighbors contribute zero force.
    """
    delta = ego_goal - ego_pos
    dist_to_goal = jnp.maximum(jnp.linalg.norm(delta), 1e-9)
    desired_v = delta / dist_to_goal * ego_v_pref
    pull = KI * (desired_v - ego_vel)

    d = ego_pos[None, :] - nbr_pos                     # (N, 2)
    dist = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
    mag = A * jnp.exp((ego_radius + nbr_radius - dist) / B) / dist
    push = jnp.sum(jnp.where(nbr_mask[:, None], mag[:, None] * d, 0.0), axis=0)

    new_v = ego_vel + (pull + push) * time_step
    speed = jnp.linalg.norm(new_v)
    return jnp.where(speed > ego_v_pref, new_v / jnp.maximum(speed, 1e-9) * ego_v_pref,
                     new_v)
