"""ROS transport of the sim2real shell, exercised with an injected fake
rospy stack (VERDICT r3 #4): subscriber wiring, message-to-observation
parity (T265 pose math, DR-SPAAM frame rotation), joint-state odometry, and
the full Sim2RealEnv.step loop — all without hardware.

Reference oracle: crowd_sim/envs/ros_turtlebot2i_env.py
  configure:66-101   (node, publisher, synchronized subscribers)
  readMsg:157-243    (time, tf pose, quaternion->theta, detection rotation)
  step:339-428       (smooth, publish, fixed time interval, done rules)
"""

import sys
import types

import numpy as np
import pytest

from crowdnav_prediction_attngraph_tpu.config import gst_config, varnum_config


# ---------------------------------------------------------------------------
# fake ROS message/infra objects
# ---------------------------------------------------------------------------

class _Obj:
    """Attribute bag (stands in for genpy message fields)."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def make_joint_msg(secs=100, nsecs=500_000_000, velocity=(1.0, 2.0)):
    return _Obj(header=_Obj(stamp=_Obj(secs=secs, nsecs=nsecs)),
                velocity=list(velocity))


def make_pose_array(points):
    return _Obj(poses=[_Obj(position=_Obj(x=float(x), y=float(y), z=0.0))
                       for x, y in points])


def make_transform(tx, ty, qz, qw, qx=0.0, qy=0.0):
    return _Obj(transform=_Obj(
        translation=_Obj(x=float(tx), y=float(ty), z=0.0),
        rotation=_Obj(x=qx, y=qy, z=qz, w=qw)))


class FakeTfBuffer:
    def __init__(self):
        self.transform = make_transform(0.0, 0.0, 0.0, 1.0)

    def lookup_transform(self, target, source, t, timeout=None):
        assert target == "t265_odom_frame" and source == "t265_pose_frame"
        return self.transform


class FakePublisher:
    def __init__(self, topic, msg_type, queue_size=1):
        self.topic = topic
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class FakeSubscriber:
    def __init__(self, topic, msg_type):
        self.topic = topic


class FakeATS:
    instances = []

    def __init__(self, subs, queue_size=1, slop=1):
        self.subs = subs
        self.queue_size = queue_size
        self.slop = slop
        self.callback = None
        FakeATS.instances.append(self)

    def registerCallback(self, cb):
        self.callback = cb


class FakeTwist:
    def __init__(self):
        self.linear = _Obj(x=0.0, y=0.0, z=0.0)
        self.angular = _Obj(x=0.0, y=0.0, z=0.0)


@pytest.fixture
def fake_ros(monkeypatch):
    """Install fake rospy / tf2_ros / message_filters / geometry_msgs /
    sensor_msgs into sys.modules and return the module handles."""
    rospy = types.ModuleType("rospy")
    rospy.sleeps = []
    rospy.init_node = lambda name, anonymous=True: None
    rospy.Publisher = FakePublisher
    rospy.Time = types.SimpleNamespace(now=lambda: 0.0)
    rospy.Duration = lambda s: s
    rospy.sleep = lambda s: rospy.sleeps.append(s)
    rospy.on_shutdown = lambda cb: None

    tf2_ros = types.ModuleType("tf2_ros")
    tf2_ros.Buffer = FakeTfBuffer
    tf2_ros.TransformListener = lambda buf: None

    message_filters = types.ModuleType("message_filters")
    message_filters.Subscriber = FakeSubscriber
    message_filters.ApproximateTimeSynchronizer = FakeATS

    geometry = types.ModuleType("geometry_msgs")
    geometry_msg = types.ModuleType("geometry_msgs.msg")
    geometry_msg.Twist = FakeTwist
    geometry_msg.PoseArray = object
    geometry.msg = geometry_msg

    sensor = types.ModuleType("sensor_msgs")
    sensor_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msg.JointState = object
    sensor.msg = sensor_msg

    for name, mod in [("rospy", rospy), ("tf2_ros", tf2_ros),
                      ("message_filters", message_filters),
                      ("geometry_msgs", geometry),
                      ("geometry_msgs.msg", geometry_msg),
                      ("sensor_msgs", sensor),
                      ("sensor_msgs.msg", sensor_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)
    FakeATS.instances = []
    return rospy


def _make_source(cfg, **kw):
    from crowdnav_prediction_attngraph_tpu.sim2real import RosDetectionSource
    return RosDetectionSource(cfg, **kw)


# ---------------------------------------------------------------------------
# pure odometry/detection math vs hand-computed oracles
# ---------------------------------------------------------------------------

def test_pose_from_transform():
    from crowdnav_prediction_attngraph_tpu.sim2real import pose_from_transform
    # readMsg:181-182 — px = -translation.y, py = translation.x
    px, py = pose_from_transform(_Obj(x=1.5, y=-2.0, z=0.0))
    assert (px, py) == (2.0, 1.5)


def test_theta_from_quaternion_wraps():
    from crowdnav_prediction_attngraph_tpu.sim2real import (
        theta_from_quaternion)
    # identity quaternion: yaw 0 -> theta = pi/2 (the +90 camera offset)
    assert np.isclose(theta_from_quaternion(0, 0, 0, 1), np.pi / 2)
    # yaw = -3*pi/4 (qz=sin(-3pi/8), qw=cos(-3pi/8)) -> negative after +pi/2,
    # wraps to +2pi  (readMsg:215-218)
    qz, qw = np.sin(-3 * np.pi / 8), np.cos(-3 * np.pi / 8)
    th = theta_from_quaternion(0, 0, qz, qw)
    assert np.isclose(th, -3 * np.pi / 4 + np.pi / 2 + 2 * np.pi)
    assert 0.0 <= th < 2 * np.pi


def test_detection_rotation_matches_hmatrix():
    from crowdnav_prediction_attngraph_tpu.sim2real import (
        detections_to_robot_frame)
    # oracle: the reference's 4x4 hMatrix product (readMsg:220-235)
    rng = np.random.RandomState(0)
    raw = rng.randn(5, 2)
    theta = 0.7
    a = theta + np.pi
    h = np.array([[np.cos(a), -np.sin(a), 0, 0],
                  [np.sin(a), np.cos(a), 0, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    want = np.stack([(h @ np.array([x, y, 0.0, 1.0]))[:2] for x, y in raw])
    got = detections_to_robot_frame(raw, theta)
    np.testing.assert_allclose(got, want, atol=1e-12)


# ---------------------------------------------------------------------------
# RosDetectionSource against the fake stack
# ---------------------------------------------------------------------------

def test_subscriber_wiring(fake_ros):
    cfg = gst_config(human_num=4)
    src = _make_source(cfg)
    ats = FakeATS.instances[-1]
    assert [s.topic for s in ats.subs] == ["/joint_states",
                                           "/dr_spaam_detections"]
    assert ats.queue_size == 1 and ats.slop == 1
    assert src.pub.topic == "/cmd_vel_mux/input/navi"
    # dummy mode subscribes joint states only (configure:86-89)
    src2 = _make_source(cfg, use_dummy_detect=True)
    assert [s.topic for s in FakeATS.instances[-1].subs] == ["/joint_states"]
    assert src2.use_dummy_detect


def test_read_requires_message(fake_ros):
    cfg = gst_config(human_num=4)
    src = _make_source(cfg)
    with pytest.raises(RuntimeError):
        src.read()


def test_message_to_observation_parity(fake_ros):
    cfg = gst_config(human_num=4)
    src = _make_source(cfg)
    ats = FakeATS.instances[-1]

    # robot at world (2, 1) heading theta = yaw + pi/2 with yaw = pi/3
    qz, qw = np.sin(np.pi / 6), np.cos(np.pi / 6)
    src._tf_buffer.transform = make_transform(tx=1.0, ty=-2.0, qz=qz, qw=qw)
    detections = [(1.0, 0.5), (-0.5, 2.0)]
    ats.callback(make_joint_msg(secs=10, nsecs=250_000_000,
                                velocity=(0.3, 0.4)),
                 make_pose_array(detections))

    src.last_v = 0.5  # as if a 0.5 m/s command was just sent
    pose, vel, human_pos, mask = src.read()

    theta = np.pi / 3 + np.pi / 2
    np.testing.assert_allclose(pose, [2.0, 1.0, theta], atol=1e-12)
    # vx, vy from the last commanded speed along heading (readMsg:242-243)
    np.testing.assert_allclose(
        vel, 0.5 * np.array([np.cos(theta), np.sin(theta)]), atol=1e-12)
    assert src.current_time == 10.25
    assert list(src.joint_vel) == [0.3, 0.4]
    # detections: rotate by theta+pi, then absolute = robot + rel
    a = theta + np.pi
    rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    want_rel = (rot @ np.asarray(detections).T).T
    np.testing.assert_allclose(human_pos[:2], want_rel + pose[:2], atol=1e-12)
    assert mask.tolist() == [True, True, False, False]
    # undetected slots pinned to the dummy position + robot offset
    np.testing.assert_allclose(human_pos[2:],
                               np.tile(15.0 + pose[:2], (2, 1)), atol=1e-12)


def test_dummy_detect_mode(fake_ros):
    cfg = gst_config(human_num=4)
    src = _make_source(cfg, use_dummy_detect=True)
    FakeATS.instances[-1].callback(make_joint_msg())
    src._tf_buffer.transform = make_transform(0.5, -0.5, 0.0, 1.0)
    pose, _, human_pos, mask = src.read()
    # fabricated human at world (0, 1)  (readMsg:237-238)
    np.testing.assert_allclose(human_pos[0], [0.0, 1.0], atol=1e-12)
    assert mask.tolist() == [True, False, False, False]


def test_send_cmd_publishes_twist(fake_ros):
    cfg = gst_config(human_num=4)
    src = _make_source(cfg)
    src.send_cmd(0.4, -0.2)
    msg = src.pub.published[-1]
    assert msg.linear.x == 0.4 and msg.angular.z == -0.2
    assert src.last_v == 0.4
    src.stop()
    assert src.pub.published[-1].linear.x == 0.0


# ---------------------------------------------------------------------------
# full env loop over the fake transport
# ---------------------------------------------------------------------------

def test_env_step_loop(fake_ros):
    from crowdnav_prediction_attngraph_tpu.sim2real import Sim2RealEnv
    cfg = varnum_config(human_num=4)
    src = _make_source(cfg)
    ats = FakeATS.instances[-1]
    src._tf_buffer.transform = make_transform(0.0, 0.0, 0.0, 1.0)
    ats.callback(make_joint_msg(), make_pose_array([(1.0, 1.0)]))

    env = Sim2RealEnv(cfg, src, goal=(0.0, 5.0))
    ob = env.reset()
    assert ob["robot_node"].shape == (1, 7)
    assert src.pub.published  # reset stops the robot

    ob, rew, done, info = env.step(np.array([0.5, 0.0]), frame_skip=0.1)
    assert rew == 0.0 and not done
    assert fake_ros.sleeps == [0.1]          # the ROSStepInterval frame skip
    assert ob["spatial_edges"].shape[0] == cfg.sim.max_human_num

    # goal reached when the tf pose lands within 0.6 m of the goal
    src._tf_buffer.transform = make_transform(tx=4.8, ty=0.0, qz=0.0, qw=1.0)
    ob, _, done, info = env.step(np.array([0.5, 0.0]))
    assert done and info["event"] == "goal"


def test_unicycle_velocity_accumulates(fake_ros):
    from crowdnav_prediction_attngraph_tpu.sim2real import Sim2RealEnv
    cfg = varnum_config(human_num=4)
    cfg = cfg.replace(action_space=cfg.action_space.__class__(
        kinematics="unicycle"))
    src = _make_source(cfg)
    env = Sim2RealEnv(cfg, src)
    # repeated +dv commands accumulate up to v_pref (step:354)
    for _ in range(40):
        env.act(np.array([0.087, 0.0]))
    assert np.isclose(env.v_desired, cfg.robot.v_pref)
    # the published speed approaches the WHEEL-CLIPPED maximum through the
    # low-pass: left=right=17.5 rad/s -> v = 0.035/2 * 35 = 0.6125 m/s
    # (smooth:294-308) — the TurtleBot cannot physically do v_pref=1.0
    v_cap = 0.035 / 2.0 * 2 * 17.5
    assert src.pub.published[-1].linear.x == pytest.approx(v_cap, rel=0.05)
