"""Gym-style single-env adapter over the pure-function simulator.

The reference exposes its environments through gym registration
(crowd_sim/__init__.py:1-31: CrowdSim-v0, CrowdSimPred-v0, CrowdSimVarNum-v0,
CrowdSimVarNumCollect-v0, CrowdSimPredRealGST-v0, rosTurtlebot2iEnv-v0) so
external RL code can drive them with the classic ``reset()`` / ``step()``
loop. This framework's native interface is pure functions batched under
``jax.vmap`` (env/vector.py) — the right shape for TPU — but that is not
drop-in for external agents. This adapter closes the gap: a small host-side
class holding the ``EnvState`` pytree and calling the jitted reset/step.

API follows the gymnasium 5-tuple convention (``reset(seed) -> (obs, info)``,
``step(a) -> (obs, reward, terminated, truncated, info)``); the gym package
itself is not a dependency (it is not installed in this image). Observations
come back as a dict of numpy arrays with the reference's key names
(crowd_sim_var_num.py:37-58).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np

from ..config import Config, gst_config, pred_config, varnum_config
from . import crowd_sim
from .pretext import pretext_process
from .types import (OUTCOME_COLLISION, OUTCOME_DANGER, OUTCOME_REACH_GOAL,
                    OUTCOME_TIMEOUT)


class Box:
    """Minimal stand-in for gym.spaces.Box (gym is not a dependency)."""

    def __init__(self, low, high, shape, dtype=np.float32):
        self.low, self.high = low, high
        self.shape = tuple(shape)
        self.dtype = dtype

    def __repr__(self):
        return f"Box(low={self.low}, high={self.high}, shape={self.shape})"


class DictSpace(dict):
    """Minimal stand-in for gym.spaces.Dict."""


class CrowdNavGymEnv:
    """Single-env host wrapper. One instance = one episode stream.

    ``phase='test'`` reproduces the suite semantics (truth-future refresh for
    intrusion accounting); ``robot_policy`` may be 'network' (actions come
    from the caller), 'orca', or 'social_force' (caller actions ignored),
    mirroring the reference's robot.policy configs.
    """

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, cfg: Config, gst_params=None, phase: str = "test",
                 robot_policy: str = "network"):
        if cfg.sim.predict_method == "inferred" and gst_params is None:
            raise ValueError(
                "CrowdSimPredRealGST needs gst_params — load them with "
                "train.load_gst_params(cfg, model_dir)")
        self.cfg = cfg
        self.phase = phase
        self._gst_params = gst_params
        self._state = None
        self._seed_counter = 0
        self._render_fig = None
        self._render_ax = None

        self._reset_fn = jax.jit(partial(self._raw_reset, cfg))
        self._step_fn = jax.jit(partial(self._raw_step, cfg, phase=phase,
                                        robot_policy=robot_policy))

        A, D = cfg.sim.max_human_num, cfg.spatial_edge_dim
        inf = np.inf
        self.observation_space = DictSpace(
            robot_node=Box(-inf, inf, (7,)),
            temporal_edges=Box(-inf, inf, (2,)),
            spatial_edges=Box(-inf, inf, (A, D)),
            visible_masks=Box(0, 1, (A,), dtype=bool),
            detected_human_num=Box(1, A, (1,), dtype=np.int32),
        )
        # reference: high = np.inf * ones(2,) Box (crowd_sim_var_num.py:61-64)
        self.action_space = Box(-inf, inf, (2,))

    @staticmethod
    def _raw_reset(cfg, key, gst_params):
        state, obs = crowd_sim.reset(cfg, key)
        if cfg.sim.predict_method == "inferred":
            state, obs, _, _ = pretext_process(
                cfg, gst_params, state, obs, jax.numpy.float32(0.0))
        return state, obs

    @staticmethod
    def _raw_step(cfg, state, action, gst_params, phase, robot_policy):
        state, obs, reward, done, info = crowd_sim.step(
            cfg, state, action, phase, robot_policy=robot_policy)
        if cfg.sim.predict_method == "inferred":
            state, obs, reward, _ = pretext_process(
                cfg, gst_params, state, obs, reward)
        return state, obs, reward, done, info

    # -- gym surface --------------------------------------------------------

    def reset(self, seed: Optional[int] = None):
        if seed is None:
            seed = self._seed_counter
            self._seed_counter += 1
        key = jax.random.PRNGKey(seed)
        state, obs = self._reset_fn(key, self._gst_params)
        self._state = state
        return self._obs_to_numpy(obs), {}

    def step(self, action):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        action = np.asarray(action, dtype=np.float32)
        self._state, obs, reward, done, info = self._step_fn(
            self._state, action, self._gst_params)
        outcome = int(info.outcome)
        terminated = outcome in (OUTCOME_REACH_GOAL, OUTCOME_COLLISION)
        truncated = outcome == OUTCOME_TIMEOUT
        info_d = {
            "outcome": outcome,
            "in_danger": outcome == OUTCOME_DANGER or bool(info.in_danger),
            "min_dist": float(info.min_dist),
            "global_time": float(self._state.global_time),
        }
        if terminated or truncated:
            self._state = None  # no auto-reset in the gym contract
        return (self._obs_to_numpy(obs), float(reward), terminated,
                truncated, info_d)

    def render(self, mode: str = "rgb_array"):
        """Draw the current timestep (reference CrowdSim.render,
        crowd_sim.py:750-873) and return it as an (H, W, 3) uint8 array."""
        if mode != "rgb_array":
            raise NotImplementedError(f"render mode {mode!r}; use 'rgb_array'")
        if self._state is None:
            raise RuntimeError("call reset() before render()")
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..utils.render import render_frame

        s = self._state
        if self._render_fig is None:
            self._render_fig, self._render_ax = plt.subplots(figsize=(7, 7))
        render_frame(
            self._render_ax,
            np.asarray(s.robot.pos), np.asarray(s.robot.goal),
            float(s.robot.radius),
            np.asarray(s.humans.pos), np.asarray(s.humans.radius),
            np.asarray(s.visible_masks), self.cfg.robot.sensor_range,
            int(s.human_num), arena_size=self.cfg.sim.arena_size)
        fig = self._render_fig
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())
        return buf[..., :3].copy()

    def close(self):
        self._state = None
        if self._render_fig is not None:
            import matplotlib.pyplot as plt
            plt.close(self._render_fig)
            self._render_fig = None

    @staticmethod
    def _obs_to_numpy(obs):
        return {
            "robot_node": np.asarray(obs.robot_node),
            "temporal_edges": np.asarray(obs.temporal_edges),
            "spatial_edges": np.asarray(obs.spatial_edges),
            "visible_masks": np.asarray(obs.visible_masks),
            "detected_human_num": np.asarray(obs.detected_human_num).reshape(1),
        }


def make(env_id: str, gst_params=None, phase: str = "test",
         robot_policy: str = "network", **config_overrides) -> CrowdNavGymEnv:
    """Factory keyed by the reference's gym ids (crowd_sim/__init__.py:1-31).

    'CrowdSim-v0' maps to the var-num env with a fixed population
    (human_num_range=0), matching what the reference's base CrowdSim provides;
    'CrowdSimVarNumCollect-v0' is served by env/collect.py's trajectory
    collector and 'rosTurtlebot2iEnv-v0' by sim2real.py — both have richer
    native entry points, so this factory points there instead of wrapping.
    """
    if env_id in ("CrowdSim-v0", "CrowdSimVarNum-v0"):
        rng = 0 if env_id == "CrowdSim-v0" else None
        kw = dict(config_overrides)
        if rng is not None:
            kw.setdefault("human_num_range", rng)
        cfg = varnum_config(**kw)
    elif env_id == "CrowdSimPred-v0":
        cfg = pred_config(**config_overrides)
    elif env_id == "CrowdSimPredRealGST-v0":
        cfg = gst_config(**config_overrides)
    elif env_id == "CrowdSimVarNumCollect-v0":
        raise ValueError(
            "trajectory collection runs through "
            "crowdnav_prediction_attngraph_tpu.collect_data (env/collect.py)")
    elif env_id == "rosTurtlebot2iEnv-v0":
        raise ValueError(
            "the ROS deployment env runs through "
            "crowdnav_prediction_attngraph_tpu.sim2real")
    else:
        raise ValueError(f"unknown env id {env_id!r}")
    return CrowdNavGymEnv(cfg, gst_params=gst_params, phase=phase,
                          robot_policy=robot_policy)
