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
