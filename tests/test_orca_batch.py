"""Batched lazy-LP3 ORCA == per-env always-LP3 ORCA (the hoist must be a
pure reorganization: env/orca.py::orca_velocity_batch selects LP3 output
exactly where LP2 failed, so results match orca_velocity bit-for-bit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdnav_prediction_attngraph_tpu.config import gst_config, varnum_config
from crowdnav_prediction_attngraph_tpu.env import crowd_sim, vector
from crowdnav_prediction_attngraph_tpu.env.orca import (
    OrcaParams, orca_velocity, orca_velocity_batch)


def test_batch_matches_per_ego_random():
    """Random dense states (including forced overlaps that trigger LP3)."""
    rng = np.random.RandomState(0)
    E, N = 64, 12
    ego_pos = jnp.asarray(rng.randn(E, 2) * 2)
    ego_vel = jnp.asarray(rng.randn(E, 2))
    ego_radius = jnp.asarray(rng.uniform(0.3, 0.6, E))
    ego_max = jnp.asarray(rng.uniform(0.5, 1.5, E))
    pref = jnp.asarray(rng.randn(E, 2))
    # cluster neighbors tightly around some egos to force LP2 infeasibility
    nbr_pos = ego_pos[:, None, :] + jnp.asarray(rng.randn(E, N, 2) * 0.4)
    nbr_vel = jnp.asarray(rng.randn(E, N, 2))
    nbr_radius = jnp.asarray(rng.uniform(0.3, 0.6, (E, N)))
    nbr_mask = jnp.asarray(rng.rand(E, N) > 0.2)
    nd = jnp.full((E,), 10.0)

    params = OrcaParams(0.25, 5.0, 10.0)
    want = jax.vmap(orca_velocity,
                    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))(
        ego_pos, ego_vel, ego_radius, ego_max, pref,
        nbr_pos, nbr_vel, nbr_radius, nbr_mask, params)
    got = orca_velocity_batch(ego_pos, ego_vel, ego_radius, ego_max, pref,
                              nbr_pos, nbr_vel, nbr_radius, nbr_mask,
                              0.25, 5.0, nd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("make_cfg", [varnum_config, gst_config])
def test_vec_step_hoist_matches_per_env(make_cfg):
    """batched_human_actions == vmap(get_human_actions) over live env states,
    stepped several times so crowds actually interact."""
    import dataclasses
    cfg = make_cfg(human_num=6)
    if cfg.sim.predict_method == "inferred":
        # drive the env core only (no predictor weights needed here)
        cfg = cfg.replace(
            env_name="CrowdSimPred",
            sim=cfg.sim.__class__(
                **{**cfg.sim.__dict__, "predict_method": "truth"}))
    cfg = cfg.replace(orca=dataclasses.replace(cfg.orca, lazy_lp3=True))
    B = 8
    states, _ = vector.vec_reset(cfg, jax.random.key(0), B)
    step = jax.jit(lambda s: vector.vec_step(
        cfg, s, jnp.zeros((B, 2)), "train"))
    for _ in range(6):
        want = jax.vmap(lambda s: crowd_sim.get_human_actions(cfg, s))(states)
        got = vector.batched_human_actions(cfg, states)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
        states = step(states)[0]
