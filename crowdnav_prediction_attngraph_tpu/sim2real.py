"""Sim2real deployment shell (reference crowd_sim/envs/ros_turtlebot2i_env.py).

The reference wraps a ROS TurtleBot2i: DR-SPAAM human detections + joint
states in, cmd_vel out, with the same observation contract as the simulator.
ROS is hardware-bound; this module keeps the full contract testable by
separating the env logic from the transport:

  * ``DetectionSource``: abstract sensor interface (``read() ->
    (robot_pose, robot_vel, human_positions, human_mask)``).
  * ``DummyDetectionSource``: the reference's ``use_dummy_detect`` mode
    (config.py:155, ros_turtlebot2i_env.py:86-98) — fabricated detections, no
    hardware needed.
  * ``RosDetectionSource``: rospy-backed source, only importable when ROS is
    present (subscribes /joint_states + /dr_spaam_detections, publishes
    /cmd_vel_mux/input/navi like ros_turtlebot2i_env.py:80-98).
  * ``Sim2RealEnv``: builds the exact dict observation the policy saw in
    training (robot_node / temporal_edges / spatial_edges with tiled or
    GST-filled predictions / visible_masks / detected_human_num,
    ros_turtlebot2i_env.py:104-140 + 355-420) and applies the TurtleBot wheel
    smoothing model (smooth(), ros_turtlebot2i_env.py:343-357).
"""

from __future__ import annotations

import abc
import time
from typing import Optional, Tuple

import numpy as np

from .config import Config


class DetectionSource(abc.ABC):
    @abc.abstractmethod
    def read(self):
        """-> (robot_pose (3,) [px, py, theta], robot_vel (2,),
              human_pos (A, 2), human_mask (A,))"""

    @abc.abstractmethod
    def send_cmd(self, v: float, w: float):
        """Publish a velocity command."""


class DummyDetectionSource(DetectionSource):
    """Fabricated robot/human states (use_dummy_detect)."""

    def __init__(self, cfg: Config, seed: int = 0):
        self.cfg = cfg
        A = cfg.sim.max_human_num
        rng = np.random.RandomState(seed)
        self.robot_pose = np.zeros(3)
        self.robot_vel = np.zeros(2)
        self.human_pos = rng.uniform(-4, 4, (A, 2))
        self.human_vel = rng.uniform(-0.5, 0.5, (A, 2))
        self.human_mask = np.zeros(A, bool)
        self.human_mask[: cfg.sim.human_num] = True

    def read(self):
        # humans drift at constant velocity; robot integrates sent commands
        self.human_pos += self.human_vel * self.cfg.env.time_step
        return (self.robot_pose.copy(), self.robot_vel.copy(),
                self.human_pos.copy(), self.human_mask.copy())

    def send_cmd(self, v: float, w: float):
        dt = self.cfg.env.time_step
        self.robot_pose[2] += w * dt
        self.robot_vel = np.array([v * np.cos(self.robot_pose[2]),
                                   v * np.sin(self.robot_pose[2])])
        self.robot_pose[:2] += self.robot_vel * dt


class RosDetectionSource(DetectionSource):  # pragma: no cover - hardware
    def __init__(self, cfg: Config):
        import rospy
        from geometry_msgs.msg import Twist
        self._rospy = rospy
        self._Twist = Twist
        rospy.init_node("crowdnav_tpu_sim2real", anonymous=True)
        self.pub = rospy.Publisher("/cmd_vel_mux/input/navi", Twist,
                                   queue_size=1)
        raise NotImplementedError(
            "attach subscribers for /joint_states and /dr_spaam_detections "
            "on the robot host; see reference ros_turtlebot2i_env.py:80-98")

    def read(self):
        raise NotImplementedError

    def send_cmd(self, v, w):
        msg = self._Twist()
        msg.linear.x = v
        msg.angular.z = w
        self.pub.publish(msg)


def record_sim_episode(cfg: Config, case_idx: int = 0,
                       robot_policy: str = "orca", params=None,
                       gst_params=None, out_dir: Optional[str] = None,
                       phase: str = "test", max_steps: Optional[int] = None):
    """Run ONE simulator episode and record the robot's actions/positions/
    orientations (reference record path: crowd_sim_pred.py:144-152 appends to
    episodeRecoder each step and saveEpisode on done).

    Returns (recorder, steps). With ``out_dir`` the CSVs are written like
    recorder.py:36-50 (``<case>_actions.csv`` etc.).
    """
    import jax
    import jax.numpy as jnp
    from .algo.evaluation import PHASE_OFFSET
    from .env import crowd_sim
    from .models import policy as policy_mod
    from .models.policy_net import init_hidden, obs_to_dict
    from .utils.recorder import Recorder

    key = jax.random.fold_in(jax.random.key(cfg.ppo.seed),
                             PHASE_OFFSET[phase] + case_idx)
    state, obs = jax.jit(lambda k: crowd_sim.reset(cfg, k))(key)
    step_fn = jax.jit(lambda s, a: crowd_sim.step(cfg, s, a, phase,
                                                  robot_policy))
    rec = Recorder()
    hxs = init_hidden(cfg, 1)
    masks = jnp.ones((1,))
    steps = 0
    for _ in range(max_steps or cfg.max_episode_steps):
        if robot_policy == "network":
            obs_d = jax.tree.map(lambda x: x[None], obs_to_dict(obs))
            _, action, _, hxs = policy_mod.act(
                cfg, params, obs_d, hxs, masks, jax.random.key(0),
                deterministic=True)
            action = action[0]
        else:
            action = jnp.zeros((2,))
        state, obs, rew, done, info = step_fn(state, action)
        # the executed velocity lives in robot.vel after the step; record the
        # RAW action so replay goes through the same clipping path
        v = np.asarray(state.robot.vel)
        if robot_policy == "network":
            rec.add_step(np.asarray(action), np.asarray(state.robot.pos),
                         float(np.arctan2(v[1], v[0])))
        else:
            rec.add_step(v, np.asarray(state.robot.pos),
                         float(np.arctan2(v[1], v[0])))
        steps += 1
        if bool(done):
            break
    rec.robot_goal.append(list(np.asarray(state.robot.goal)))
    if out_dir:
        rec.save_episode(out_dir, case_idx)
    return rec, steps


def replay_actions(cfg: Config, actions: np.ndarray, case_idx: int = 0,
                   phase: str = "test") -> np.ndarray:
    """Replay a recorded (T, 2) action array through the simulator
    (reference crowd_sim.py:169-173 + recorder.py:52-56 loadActions: the env
    consumes pre-recorded actions instead of the policy, for dynamics /
    system identification). Returns the (T, 2) robot positions, which must
    be bit-exact vs the recording (the env is a deterministic pure function
    of (state, action); the RNG chain is carried in the state)."""
    import jax
    import jax.numpy as jnp
    from .algo.evaluation import PHASE_OFFSET
    from .env import crowd_sim

    key = jax.random.fold_in(jax.random.key(cfg.ppo.seed),
                             PHASE_OFFSET[phase] + case_idx)
    state, _ = jax.jit(lambda k: crowd_sim.reset(cfg, k))(key)
    step_fn = jax.jit(lambda s, a: crowd_sim.step(cfg, s, a, phase,
                                                  "network"))
    pos = []
    for a in np.asarray(actions, np.float32):
        state, _, _, done, _ = step_fn(state, jnp.asarray(a))
        pos.append(np.asarray(state.robot.pos))
        if bool(done):
            break
    return np.asarray(pos)


class Sim2RealEnv:
    """Observation/action adapter between real sensors and the trained policy."""

    def __init__(self, cfg: Config, source: DetectionSource, goal=(0.0, 2.0)):
        self.cfg = cfg
        self.source = source
        self.goal = np.asarray(goal, float)
        A = cfg.sim.max_human_num
        self.prev_human_pos = np.full((A, 2), 15.0)
        self.last_left = 0.0
        self.last_right = 0.0

    def smooth(self, v: float, w: float) -> Tuple[float, float]:
        """TurtleBot2i wheel low-pass (ros_turtlebot2i_env.py:343-357)."""
        beta = 0.1
        left = (2.0 * v - 0.23 * w) / (2.0 * 0.035)
        right = (2.0 * v + 0.23 * w) / (2.0 * 0.035)
        left = float(np.clip(left, -17.5, 17.5))
        right = float(np.clip(right, -17.5, 17.5))
        left = (1.0 - beta) * self.last_left + beta * left
        right = (1.0 - beta) * self.last_right + beta * right
        self.last_left, self.last_right = left, right
        return 0.035 / 2.0 * (left + right), 0.035 / 0.23 * (right - left)

    def observe(self) -> dict:
        cfg = self.cfg
        A = cfg.sim.max_human_num
        K = cfg.sim.predict_steps
        pose, vel, human_pos, mask = self.source.read()
        rel = np.where(mask[:, None], human_pos - pose[:2], 15.0)
        if cfg.sim.predict_method == "none":
            spatial = rel.astype(np.float32)
        else:
            spatial = np.tile(rel, (1, K + 1)).astype(np.float32)
        self.prev_human_pos = np.where(mask[:, None], human_pos,
                                       self.prev_human_pos)
        return {
            "robot_node": np.array([[*pose[:2], cfg.robot.radius, *self.goal,
                                     cfg.robot.v_pref, pose[2]]], np.float32),
            "temporal_edges": vel[None].astype(np.float32),
            "spatial_edges": spatial,
            "visible_masks": mask,
            "detected_human_num": np.array([max(int(mask.sum()), 1)],
                                           np.float32),
        }

    def act(self, raw_action) -> Tuple[float, float]:
        """Clip per kinematics and publish; returns (v, w) sent."""
        a = np.asarray(raw_action, float).ravel()
        if self.cfg.action_space.kinematics == "holonomic":
            n = np.linalg.norm(a)
            if n > self.cfg.robot.v_pref:
                a = a / n * self.cfg.robot.v_pref
            v = float(np.linalg.norm(a))
            w = float(np.arctan2(a[1], a[0]))
        else:
            dv = float(np.clip(a[0], -0.1, 0.087))
            dth = float(np.clip(a[1], -0.06, 0.06))
            v, w = dv, dth / self.cfg.env.time_step
        v, w = self.smooth(v, w)
        self.source.send_cmd(v, w)
        return v, w
