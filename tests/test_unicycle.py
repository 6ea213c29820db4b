"""Unicycle (differential-drive) kinematics and env path tests
(reference agent.py:148-168, crowd_sim_var_num.py:78-91, 379-381, 548-559)."""

import dataclasses
from functools import lru_cache

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.config import varnum_config
from crowdnav_prediction_attngraph_tpu.env import crowd_sim, kinematics


def unicycle_cfg():
    cfg = varnum_config(human_num=3)
    return cfg.replace(action_space=dataclasses.replace(
        cfg.action_space, kinematics="unicycle"))


def test_differential_drive_integration():
    # straight line: r ~ 0 -> R=0 -> no displacement from the arc formula?
    # reference: |r| < eps => R = 0 => px unchanged (agent.py:158-165)
    pos, theta, vel = kinematics.step_unicycle(
        jnp.zeros(2), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0),
        0.25)
    np.testing.assert_allclose(np.asarray(pos), [0.0, 0.0], atol=1e-6)
    # arc: v=1, dtheta=0.1 over dt=0.25 -> R = v/w = 2.5
    pos, theta, vel = kinematics.step_unicycle(
        jnp.zeros(2), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.1),
        0.25)
    R = 1.0 / (0.1 / 0.25)
    expect = [R * np.sin(0.1), R * (1 - np.cos(0.1))]
    np.testing.assert_allclose(np.asarray(pos), expect, atol=1e-5)
    assert float(theta) == pytest.approx(0.1)


def test_action_clipping():
    a = kinematics.clip_unicycle_action(jnp.array([5.0, -5.0]))
    np.testing.assert_allclose(np.asarray(a), [0.087, -0.06], atol=1e-6)


def test_unicycle_env_runs():
    cfg = unicycle_cfg()
    reset = jax.jit(lambda k: crowd_sim.reset(cfg, k))
    step = jax.jit(lambda s, a: crowd_sim.step(cfg, s, a, "train"))
    state, obs = reset(jax.random.key(0))
    # robot spawns on the arena circle (crowd_sim_var_num.py:80-82)
    assert np.linalg.norm(np.asarray(state.robot.pos)) == pytest.approx(
        cfg.sim.arena_size, abs=1e-4)
    # accumulated desired velocity + spin penalty in reward
    theta0 = float(state.robot.theta)  # random initial orientation
    total_r = 0.0
    for _ in range(10):
        state, obs, r, d, info = step(state, jnp.array([0.05, 0.06]))
        total_r += float(r)
    assert np.isfinite(total_r)
    # desired velocity accumulated: 10 steps * 0.05 = 0.5 (clip at v_pref=1)
    assert float(state.desired_velocity) == pytest.approx(0.5, abs=1e-5)
    # heading advanced by 10 * 0.06 from the random initial theta
    dtheta = (float(state.robot.theta) - theta0) % (2 * np.pi)
    assert dtheta == pytest.approx(0.6, abs=1e-4)


def test_spin_penalty_anneal():
    """spin_coef threads through step -> calc_reward: with coef 0 the spin
    penalty -c*r^2 (crowd_sim_var_num.py:551) vanishes; the rollout's warmup
    schedule reproduces the constant-coef reward at full warmup fraction."""
    cfg = unicycle_cfg()
    state, _ = jax.jit(lambda k: crowd_sim.reset(cfg, k))(jax.random.key(3))
    a = jnp.array([0.02, 0.06])   # within clip: dv 0.02, dtheta 0.06
    _, _, r_full, _, _ = crowd_sim.step(cfg, state, a, "train")
    _, _, r_zero, _, _ = crowd_sim.step(cfg, state, a, "train",
                                        spin_coef=jnp.float32(0.0))
    # identical state/key -> rewards differ exactly by the spin term
    np.testing.assert_allclose(float(r_full - r_zero), -4.5 * 0.06 ** 2,
                               atol=1e-6)
    # half-strength coefficient
    _, _, r_half, _, _ = crowd_sim.step(cfg, state, a, "train",
                                        spin_coef=jnp.float32(2.25))
    np.testing.assert_allclose(float(r_half - r_zero), -2.25 * 0.06 ** 2,
                               atol=1e-6)


def test_spin_warmup_rollout_schedule():
    """ppo.rollout computes the annealed coefficient from total_steps."""
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    cfg = unicycle_cfg()
    cfg = cfg.replace(
        reward=dataclasses.replace(cfg.reward,
                                   spin_penalty_warmup_steps=1000),
        ppo=dataclasses.replace(cfg.ppo, num_processes=2, num_steps=3))
    ts = ppo_mod.init_train_state(cfg, jax.random.key(0))
    # at total_steps=0 the spin coefficient is 0; at >= warmup it is full.
    ts0 = ts.replace(total_steps=jnp.int32(0))
    ts1 = ts.replace(total_steps=jnp.int32(2000))
    _, b0 = jax.jit(lambda t: ppo_mod.rollout(cfg, t))(ts0)
    _, b1 = jax.jit(lambda t: ppo_mod.rollout(cfg, t))(ts1)
    cfg_const = cfg.replace(
        reward=dataclasses.replace(cfg.reward, spin_penalty_warmup_steps=0))
    _, bc = jax.jit(lambda t: ppo_mod.rollout(cfg_const, t))(ts1)
    # full-warmup run matches the constant-coefficient program exactly
    np.testing.assert_allclose(np.asarray(b1.rewards), np.asarray(bc.rewards),
                               atol=1e-6)
    # zero-step run pays no spin penalty -> reward never lower than full-coef
    assert float(jnp.sum(b0.rewards)) >= float(jnp.sum(bc.rewards)) - 1e-6
