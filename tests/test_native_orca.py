"""Three-way ORCA cross-validation: C++ engine vs NumPy oracle vs JAX kernel."""

import shutil

import numpy as np
import pytest

import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.utils.orca_oracle import orca_velocity_np

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def test_cpp_matches_numpy_oracle():
    from crowdnav_prediction_attngraph_tpu.runtime.native import (
        orca_velocity_native)
    from tests.test_orca import random_scene
    for seed in range(12):
        rng = np.random.RandomState(seed)
        scene = random_scene(rng, 10)
        (ego_pos, ego_vel, ego_radius, ego_max_speed, pref_vel,
         nbr_pos, nbr_vel, nbr_radius) = scene
        expect = orca_velocity_np(ego_pos, ego_vel, ego_radius, ego_max_speed,
                                  pref_vel, nbr_pos, nbr_vel, nbr_radius,
                                  0.25, 5.0, 10.0)
        got = orca_velocity_native(ego_pos, ego_vel, ego_radius, ego_max_speed,
                                   pref_vel, nbr_pos, nbr_vel, nbr_radius,
                                   np.ones(10, np.uint8), 0.25, 5.0, 10.0)
        np.testing.assert_allclose(got, expect, atol=1e-9,
                                   err_msg=f"seed={seed}")


def test_crowd_step_progresses_and_avoids():
    from crowdnav_prediction_attngraph_tpu.runtime.native import (
        orca_crowd_step_native)
    rng = np.random.RandomState(0)
    n = 8
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pos = np.stack([5 * np.cos(ang), 5 * np.sin(ang)], axis=1)
    goal = -pos.copy()
    vel = np.zeros((n, 2))
    radius = np.full(n, 0.3)
    v_pref = np.ones(n)
    d0 = np.linalg.norm(pos - goal, axis=1)
    for _ in range(60):
        pos, vel = orca_crowd_step_native(pos, vel, radius, v_pref, goal,
                                          0.15, 0.25, 5.0, 10.0)
        # no interpenetration
        for i in range(n):
            for j in range(i + 1, n):
                assert np.linalg.norm(pos[i] - pos[j]) > 0.55
    d1 = np.linalg.norm(pos - goal, axis=1)
    assert np.all(d1 < d0)
