"""Deterministic seeded evaluation suite (reference rl/evaluation.py:7-160).

The reference runs 500 episodes serially through one env process (~26 min,
BASELINE.md); here all episodes run as one vectorized batch — each episode is
an env slot seeded by its case index (test cases occupy seed offsets
[1000, 2000) like crowd_sim.py:386-389), stepped in lockstep with done-latching
until every episode terminates. Metrics match evaluation.py:141-157: success/
collision/timeout rates, nav time (time at the start of the final step),
path length, intrusion ratio (% steps in Danger), mean min intrusion distance
pooled over all intrusion steps.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config
from ..env import crowd_sim
from ..env.pretext import pretext_process
from ..env.types import (OUTCOME_COLLISION, OUTCOME_DANGER, OUTCOME_REACH_GOAL,
                         OUTCOME_TIMEOUT)
from ..models import policy as policy_mod
from ..models.policy_net import init_hidden, obs_to_dict

# crowd_sim.py:382-389: val seeds start at 0, test at 1000, train at 2000
PHASE_OFFSET = {"val": 0, "test": 1000, "train": 2000}
TEST_CASE_OFFSET = PHASE_OFFSET["test"]


def _reset_case(cfg: Config, base_seed: int, case_idx, phase: str = "test"):
    key = jax.random.fold_in(jax.random.key(base_seed),
                             PHASE_OFFSET[phase] + case_idx)
    return crowd_sim.reset(cfg, key)


def evaluate(cfg: Config, params, gst_params=None,
             test_size: Optional[int] = None, base_seed: Optional[int] = None,
             deterministic: bool = True, robot_policy: str = "network",
             batch_size: Optional[int] = None,
             phase: str = "test") -> Dict[str, float]:
    """Run the seeded suite in fixed-size batches (one compile, reused per
    chunk; a single 500-slot program is avoidable compile cost). ``phase``
    selects the seed range: val [0,1000), test [1000,2000)
    (crowd_sim.py:382-389; env.val_size/test_size)."""
    test_size = test_size or (cfg.env.val_size if phase == "val"
                              else cfg.env.test_size)
    base_seed = cfg.ppo.seed if base_seed is None else base_seed
    bs = min(batch_size or 100, test_size)
    dt = cfg.env.time_step

    accs = []
    for start in range(0, test_size, bs):
        idx = np.arange(start, start + bs)  # pad past test_size, drop below
        accs.append(_evaluate_chunk(cfg, params, gst_params, base_seed,
                                    idx, deterministic, robot_policy, phase))
        print(f"[evaluate] cases {start}..{start + bs} done", flush=True)
    (steps, outcome, path_len, danger_steps, min_dist_sum, ep_rew,
     alive) = (np.concatenate([a[i] for a in accs])[:test_size]
               for i in range(7))

    success = outcome == OUTCOME_REACH_GOAL
    collision = outcome == OUTCOME_COLLISION
    timeout = (outcome == OUTCOME_TIMEOUT) | alive
    nav_times = (steps - 1) * dt  # evaluation.py:74-75 semantics
    results = {
        "success_rate": float(np.mean(success)),
        "collision_rate": float(np.mean(collision)),
        "timeout_rate": float(np.mean(timeout)),
        "nav_time": float(np.mean(nav_times[success]))
        if success.any() else cfg.env.time_limit,
        "path_length": float(np.mean(path_len)),
        "intrusion_ratio": float(np.mean(danger_steps / np.maximum(steps, 1)
                                         * 100.0)),
        "min_intrusion_dist": float(min_dist_sum.sum()
                                    / max(danger_steps.sum(), 1)),
        "mean_episode_reward": float(np.mean(ep_rew)),
        "collision_cases": np.nonzero(collision)[0].tolist(),
        "timeout_cases": np.nonzero(timeout)[0].tolist(),
    }
    return results


def _evaluate_chunk(cfg: Config, params, gst_params, base_seed: int,
                    case_indices: np.ndarray, deterministic: bool,
                    robot_policy: str, phase: str = "test"):
    B = len(case_indices)
    max_steps = cfg.max_episode_steps + 1

    states, obs = jax.vmap(lambda i: _reset_case(cfg, base_seed, i, phase))(
        jnp.asarray(case_indices))
    if cfg.sim.predict_method == "inferred":
        states, obs, _, _ = jax.vmap(
            lambda s, o: pretext_process(cfg, gst_params, s, o,
                                         jnp.float32(0.0)))(states, obs)
    obs_d = obs_to_dict(obs)
    hxs = init_hidden(cfg, B)
    masks = jnp.ones((B,))

    def body(carry, _):
        (states, obs_d, hxs, alive, acc) = carry
        (steps, outcome, path_len, last_pos, danger_steps, min_dist_sum,
         ep_rew) = acc
        if robot_policy == "network":
            value, action, _, hxs_new = policy_mod.act(
                cfg, params, obs_d, hxs, masks, jax.random.key(0),
                deterministic=deterministic)
        else:
            action = jnp.zeros((B, 2))
            hxs_new = hxs
        states_new, obs_new, rew, done, info = jax.vmap(
            lambda s, a: crowd_sim.step(cfg, s, a, "test", robot_policy))(
                states, action)
        if cfg.sim.predict_method == "inferred":
            states_new, obs_new, rew, _ = jax.vmap(
                lambda s, o, r: pretext_process(cfg, gst_params, s, o, r))(
                    states_new, obs_new, rew)
        obs_new_d = obs_to_dict(obs_new)

        # freeze finished episodes
        sel = lambda new, old: jnp.where(
            alive.reshape(alive.shape + (1,) * (new.ndim - 1)), new, old)
        states = jax.tree.map(sel, states_new, states)
        obs_d = jax.tree.map(sel, obs_new_d, obs_d)
        hxs = jax.tree.map(sel, hxs_new, hxs)

        new_pos = obs_d["robot_node"][:, :2]
        step_now = alive
        steps = steps + step_now.astype(jnp.int32)
        ep_rew = ep_rew + jnp.where(step_now, rew, 0.0)
        path_len = path_len + jnp.where(step_now,
                                        jnp.linalg.norm(new_pos - last_pos,
                                                        axis=-1), 0.0)
        last_pos = jnp.where(step_now[:, None], new_pos, last_pos)
        is_danger = step_now & (info.outcome == OUTCOME_DANGER)
        danger_steps = danger_steps + is_danger.astype(jnp.int32)
        min_dist_sum = min_dist_sum + jnp.where(is_danger, info.min_dist, 0.0)
        finished_now = step_now & done
        outcome = jnp.where(finished_now, info.outcome, outcome)
        alive = alive & ~done
        acc = (steps, outcome, path_len, last_pos, danger_steps, min_dist_sum,
               ep_rew)
        return (states, obs_d, hxs, alive, acc), None

    acc0 = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,)), obs_d["robot_node"][:, :2],
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,)), jnp.zeros((B,)))
    carry = (states, obs_d, hxs, jnp.ones((B,), bool), acc0)
    scan = jax.jit(lambda c: jax.lax.scan(body, c, None, length=max_steps)[0])
    (states, obs_d, hxs, alive, acc) = scan(carry)
    (steps, outcome, path_len, last_pos, danger_steps, min_dist_sum,
     ep_rew) = map(np.asarray, acc)
    return (steps, outcome, path_len, danger_steps, min_dist_sum, ep_rew,
            np.asarray(alive))


def format_results(r: Dict) -> str:
    """Reference log line (evaluation.py:149-157)."""
    return ("Testing success rate: {:.2f}, collision rate: {:.2f}, "
            "timeout rate: {:.2f}, nav time: {:.2f}, path length: {:.2f}, "
            "average intrusion ratio: {:.2f}%, "
            "average minimal distance during intrusions: {:.2f}".format(
                r["success_rate"], r["collision_rate"], r["timeout_rate"],
                r["nav_time"], r["path_length"], r["intrusion_ratio"],
                r["min_intrusion_dist"]))
