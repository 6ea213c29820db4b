"""PPO algorithm tests: GAE vs a literal reference-semantics loop, and a
fused train-iteration smoke test."""

from functools import lru_cache

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.config import varnum_config
from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
from crowdnav_prediction_attngraph_tpu.algo.gae import compute_returns


def reference_gae(rewards, values, masks, bad_masks, gamma, lam,
                  use_proper_time_limits):
    """Literal port of storage.py:104-121 semantics in NumPy."""
    T, N = rewards.shape
    returns = np.zeros((T, N))
    gae = np.zeros(N)
    for step in reversed(range(T)):
        delta = rewards[step] + gamma * values[step + 1] * masks[step + 1] \
            - values[step]
        gae = delta + gamma * lam * masks[step + 1] * gae
        if use_proper_time_limits:
            gae = gae * bad_masks[step + 1]
        returns[step] = gae + values[step]
    return returns


@pytest.mark.parametrize("proper", [False, True])
def test_gae_matches_reference(proper):
    rng = np.random.RandomState(0)
    T, N = 30, 4
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T + 1, N).astype(np.float32)
    masks = (rng.rand(T + 1, N) > 0.1).astype(np.float32)
    bad = (rng.rand(T + 1, N) > 0.05).astype(np.float32)
    expect = reference_gae(rewards, values, masks, bad, 0.99, 0.95, proper)
    got = compute_returns(jnp.asarray(rewards), jnp.asarray(values),
                          jnp.asarray(masks), jnp.asarray(bad), 0.99, 0.95,
                          True, proper)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)


@lru_cache(maxsize=None)
def small_cfg():
    cfg = varnum_config(human_num=3)
    return cfg.replace(ppo=cfg.ppo.__class__(
        num_processes=4, num_steps=8, num_mini_batch=2, ppo_epoch=2))


def test_train_iteration_runs_and_updates_params():
    cfg = small_cfg()
    ts = ppo_mod.init_train_state(cfg, jax.random.key(0))
    it = jax.jit(lambda t: ppo_mod.train_iteration(cfg, t))
    params_before = jax.tree.map(np.asarray, ts.params)
    ts, metrics = it(ts)
    for k in ("value_loss", "action_loss", "dist_entropy", "reward_mean"):
        assert np.isfinite(float(metrics[k])), k
    # params actually changed
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        ts.params, params_before))
    assert max(diffs) > 0.0
    assert int(ts.total_steps) == cfg.ppo.num_steps * cfg.ppo.num_processes


def test_rollout_mask_semantics():
    """masks[t+1] must be 0 exactly when done at step t, and obs after done
    must come from a fresh episode (auto-reset)."""
    cfg = small_cfg()
    ts = ppo_mod.init_train_state(cfg, jax.random.key(1))
    ts2, batch = jax.jit(lambda t: ppo_mod.rollout(cfg, t))(ts)
    masks = np.asarray(batch.masks)
    assert masks.shape == (cfg.ppo.num_steps + 1, cfg.ppo.num_processes)
    assert set(np.unique(masks)).issubset({0.0, 1.0})
    # rewards and values finite
    assert np.all(np.isfinite(np.asarray(batch.rewards)))
    assert np.all(np.isfinite(np.asarray(batch.values)))
