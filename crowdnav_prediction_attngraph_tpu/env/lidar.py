"""Batched 2D lidar scan over circular agents.

The reference declares a lidar config group (config.py:145-150: angular_res 5
degrees, range 10 m) that no shipped env consumes; here the sensor is a real
vectorized observation op — ray/circle intersection over all (ray, human)
pairs at once, shaped for the MXU-friendly dense-batch layout the rest of the
simulator uses (mask-padded humans, fixed ray count).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config


def num_rays(cfg: Config) -> int:
    return int(round(360.0 / cfg.lidar.angular_res))


def scan(cfg: Config, robot_pos: jnp.ndarray, robot_theta: jnp.ndarray,
         human_pos: jnp.ndarray, human_radius: jnp.ndarray,
         human_mask: jnp.ndarray) -> jnp.ndarray:
    """Ranges to the nearest human along each ray, clipped to lidar.range.

    robot_pos:    (..., 2)
    robot_theta:  (...)    ray 0 points along the robot heading
    human_pos:    (..., A, 2)
    human_radius: (..., A)
    human_mask:   (..., A)  1 = present
    returns       (..., R)  R = 360 / angular_res
    """
    R = num_rays(cfg)
    max_range = cfg.lidar.range
    if human_pos.shape[-2] == 0:
        return jnp.full(robot_theta.shape + (R,), max_range)
    angles = robot_theta[..., None] + \
        jnp.arange(R) * (2.0 * jnp.pi / R)                       # (..., R)
    d = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)   # (..., R, 2)

    rel = human_pos - robot_pos[..., None, :]                    # (..., A, 2)
    # t: projection of each center onto each ray; closest2: squared distance
    # from center to the ray line.
    t = jnp.einsum("...rk,...ak->...ra", d, rel)                 # (..., R, A)
    c2 = jnp.sum(rel * rel, axis=-1)[..., None, :]               # (..., 1, A)
    closest2 = c2 - t * t
    r2 = (human_radius * human_radius)[..., None, :]
    inside = closest2 <= r2
    hit_t = t - jnp.sqrt(jnp.maximum(r2 - closest2, 0.0))
    valid = inside & (hit_t > 0.0) & (human_mask[..., None, :] > 0)
    ranges = jnp.where(valid, hit_t, max_range)
    return jnp.minimum(jnp.min(ranges, axis=-1), max_range)
