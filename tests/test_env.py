"""Environment behavior tests: reset invariants, step dynamics, reward cases.

Mirrors the reference's deterministic seeded-episode testing practice
(SURVEY.md section 4) with explicit unit checks the reference lacks.
"""

from functools import lru_cache

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.config import (Config, varnum_config,
                                                      pred_config)
from crowdnav_prediction_attngraph_tpu.env import crowd_sim
from crowdnav_prediction_attngraph_tpu.env.types import (
    OUTCOME_COLLISION, OUTCOME_REACH_GOAL, OUTCOME_TIMEOUT)


@lru_cache(maxsize=None)
def fns(cfg: Config, phase: str = "train"):
    reset = jax.jit(lambda k: crowd_sim.reset(cfg, k))
    step = jax.jit(lambda s, a: crowd_sim.step(cfg, s, a, phase))
    return reset, step


CFG5 = varnum_config(human_num=5)


def test_reset_invariants():
    reset, _ = fns(CFG5)
    for seed in range(5):
        state, obs = reset(jax.random.key(seed))
        A = CFG5.sim.max_human_num
        hn = int(state.human_num)
        assert hn == 5
        # robot spawn: |p - g| >= 8 within arena (crowd_sim_var_num.py:96-101)
        assert np.linalg.norm(np.asarray(state.robot.pos - state.robot.goal)) >= 8.0
        assert np.all(np.abs(np.asarray(state.robot.pos)) <= CFG5.sim.arena_size)
        # humans on circle ring with goals opposite
        pos = np.asarray(state.humans.pos[:hn])
        goal = np.asarray(state.humans.goal[:hn])
        np.testing.assert_allclose(goal, -pos, atol=1e-6)
        r = np.linalg.norm(pos, axis=-1)
        assert np.all(r >= CFG5.sim.circle_radius - 3.0)
        assert np.all(r <= CFG5.sim.circle_radius + 3.5)
        # humans spaced apart from each other and the robot
        for i in range(hn):
            for j in range(i + 1, hn):
                d = np.linalg.norm(pos[i] - pos[j])
                min_d = float(state.humans.radius[i] + state.humans.radius[j]
                              + CFG5.reward.discomfort_dist)
                assert d >= min_d - 1e-5
        # randomized attributes within reference ranges (agent.py:44-50)
        assert np.all(np.asarray(state.humans.radius[:hn]) >= 0.3 - 1e-6)
        assert np.all(np.asarray(state.humans.radius[:hn]) <= 0.5 + 1e-6)
        # obs layout
        assert obs.robot_node.shape == (7,)
        assert obs.spatial_edges.shape == (A, 2)
        assert int(obs.detected_human_num) >= 1


def test_reset_is_deterministic():
    reset, _ = fns(CFG5)
    s1, o1 = reset(jax.random.key(7))
    s2, o2 = reset(jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(o1.spatial_edges),
                                  np.asarray(o2.spatial_edges))
    np.testing.assert_array_equal(np.asarray(s1.humans.pos),
                                  np.asarray(s2.humans.pos))


def test_spatial_edges_sorted_by_distance():
    reset, step = fns(CFG5)
    state, obs = reset(jax.random.key(1))
    for _ in range(10):
        state, obs, *_ = step(state, jnp.array([0.3, 0.1]))
    edges = np.asarray(obs.spatial_edges)
    n_vis = int(obs.detected_human_num)
    if bool(np.asarray(obs.visible_masks).any()):
        norms = np.linalg.norm(edges[:n_vis], axis=-1)
        assert np.all(np.diff(norms) >= -1e-5)
        # invisible slots pinned at 15 after the visible prefix
        assert np.all(edges[n_vis:] == 15.0)


def test_holonomic_action_clipping_and_integration():
    reset, step = fns(CFG5)
    state, _ = reset(jax.random.key(2))
    p0 = np.asarray(state.robot.pos)
    state2, _, _, _, _ = step(state, jnp.array([10.0, 0.0]))  # clipped to v_pref=1
    p1 = np.asarray(state2.robot.pos)
    np.testing.assert_allclose(p1 - p0, [CFG5.env.time_step * 1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(state2.robot.vel), [1.0, 0.0], atol=1e-6)


def test_reach_goal_reward():
    reset, step = fns(CFG5)
    state, _ = reset(jax.random.key(3))
    # teleport the robot next to its goal
    near = state.robot.goal - jnp.array([0.05, 0.0])
    state = state.replace(robot=state.robot.replace(pos=near))
    _, _, r, d, info = step(state, jnp.array([0.0, 0.0]))
    assert float(r) == CFG5.reward.success_reward
    assert bool(d)
    assert int(info.outcome) == OUTCOME_REACH_GOAL


def test_collision_reward():
    reset, step = fns(CFG5)
    state, _ = reset(jax.random.key(4))
    # teleport robot onto human 0
    state = state.replace(robot=state.robot.replace(pos=state.humans.pos[0]))
    _, _, r, d, info = step(state, jnp.array([0.0, 0.0]))
    assert float(r) == CFG5.reward.collision_penalty
    assert bool(d)
    assert int(info.outcome) == OUTCOME_COLLISION


def test_timeout():
    reset, step = fns(CFG5)
    state, _ = reset(jax.random.key(5))
    # park robot far from goal and fast-forward the clock
    state = state.replace(global_time=jnp.float32(CFG5.env.time_limit - 1.0))
    _, _, r, d, info = step(state, jnp.array([0.0, 0.0]))
    assert float(r) == 0.0
    assert bool(d)
    assert int(info.outcome) == OUTCOME_TIMEOUT


def test_potential_reward_shaping():
    reset, step = fns(CFG5)
    state, _ = reset(jax.random.key(6))
    # the reward is computed BEFORE integrating the action
    # (crowd_sim_var_num.py:391-397), so progress made by step t shows up in
    # step t+1's potential reward: 2 * 0.25 m = 0.5
    to_goal = state.robot.goal - state.robot.pos
    act = to_goal / jnp.linalg.norm(to_goal)
    state, _, r0, _, _ = step(state, act)
    assert float(r0) == 0.0  # no progress registered yet
    to_goal = state.robot.goal - state.robot.pos
    act = to_goal / jnp.linalg.norm(to_goal)
    _, _, r1, _, info = step(state, act)
    if int(info.outcome) == 0:  # no danger interference
        np.testing.assert_allclose(float(r1), 0.5, atol=0.02)


def test_humans_move_toward_goals():
    reset, step = fns(CFG5)
    state, _ = reset(jax.random.key(8))
    d0 = np.linalg.norm(
        np.asarray(state.humans.pos - state.humans.goal), axis=-1)
    for _ in range(20):
        state, *_ = step(state, jnp.array([0.0, 0.0]))
    d1 = np.linalg.norm(
        np.asarray(state.humans.pos - state.humans.goal), axis=-1)
    hn = int(state.human_num)
    # most humans should have made progress (ORCA detours allowed)
    assert np.mean(d1[:hn] < d0[:hn]) >= 0.6


def test_humans_avoid_collisions():
    import dataclasses
    cfg = CFG5.replace(
        env=dataclasses.replace(CFG5.env, randomize_attributes=False),
        humans=dataclasses.replace(CFG5.humans, random_goal_changing=False))
    reset, step = fns(cfg)
    state, _ = reset(jax.random.key(9))
    min_pair = np.inf
    for _ in range(60):
        state, *_ = step(state, jnp.array([0.0, 0.0]))
        hn = int(state.human_num)
        pos = np.asarray(state.humans.pos[:hn])
        rad = np.asarray(state.humans.radius[:hn])
        for i in range(hn):
            for j in range(i + 1, hn):
                min_pair = min(min_pair,
                               np.linalg.norm(pos[i] - pos[j]) - rad[i] - rad[j])
    # ORCA should keep humans from interpenetrating
    assert min_pair > -0.05, f"humans interpenetrated: {min_pair}"


def test_pred_env_obs_shape():
    cfg = pred_config(predict_method="const_vel", human_num=5)
    reset, step = fns(cfg)
    state, obs = reset(jax.random.key(0))
    K = cfg.sim.predict_steps
    assert obs.spatial_edges.shape == (cfg.sim.max_human_num, 2 * (K + 1))
    state, obs, r, d, info = step(state, jnp.array([0.2, 0.1]))
    edges = np.asarray(obs.spatial_edges)
    assert np.all(np.isfinite(edges))
    # const-vel future: consecutive predicted offsets along a straight line
    n_vis = int(obs.detected_human_num)
    row = edges[0].reshape(K + 1, 2)
    steps = np.diff(row, axis=0)
    if bool(np.asarray(obs.visible_masks).any()) and np.abs(steps[0]).sum() > 1e-5:
        for k in range(1, K):
            np.testing.assert_allclose(steps[k], steps[0], atol=1e-4)


def test_truth_pred_env_runs():
    cfg = pred_config(predict_method="truth", human_num=5)
    reset, step = fns(cfg)
    state, obs = reset(jax.random.key(0))
    state, obs, r, d, info = step(state, jnp.array([0.2, 0.1]))
    assert np.all(np.isfinite(np.asarray(obs.spatial_edges)))


def test_varnum_population_changes():
    cfg = varnum_config(human_num=5, human_num_range=2)
    reset, step = fns(cfg)
    state, _ = reset(jax.random.key(0))
    counts = set()
    for seed in range(3):
        state, _ = reset(jax.random.key(seed))
        for t in range(45):
            state, *_ = step(state, jnp.array([0.0, 0.0]))
            counts.add(int(state.human_num))
    assert all(3 <= c <= 7 for c in counts)
    assert len(counts) > 1, "human count never changed"


def test_test_phase_future_danger():
    reset, _ = fns(CFG5)
    _, step_test = fns(CFG5, "test")
    state, _ = reset(jax.random.key(10))
    state, obs, r, d, info = step_test(state, jnp.array([0.1, 0.0]))
    assert np.all(np.isfinite(np.asarray(state.human_future_traj)))
