"""Sim2real shell: dummy detection source produces the training observation
contract and the wheel-smoothing model behaves like the reference's
(ros_turtlebot2i_env.py:343-357)."""

import numpy as np

from crowdnav_prediction_attngraph_tpu.config import gst_config, varnum_config
from crowdnav_prediction_attngraph_tpu.sim2real import (DummyDetectionSource,
                                                        Sim2RealEnv)


def test_observation_contract_gst():
    cfg = gst_config(human_num=6)
    env = Sim2RealEnv(cfg, DummyDetectionSource(cfg), goal=(1.0, 2.0))
    ob = env.observe()
    A, K = cfg.sim.max_human_num, cfg.sim.predict_steps
    assert ob["robot_node"].shape == (1, 7)
    assert ob["temporal_edges"].shape == (1, 2)
    assert ob["spatial_edges"].shape == (A, 2 * (K + 1))
    assert ob["visible_masks"].shape == (A,)
    assert int(ob["detected_human_num"][0]) >= 1
    # spatial edges are robot-frame relative positions for detected humans
    assert np.all(np.isfinite(ob["spatial_edges"]))


def test_observation_contract_varnum():
    cfg = varnum_config(human_num=4)
    env = Sim2RealEnv(cfg, DummyDetectionSource(cfg))
    ob = env.observe()
    assert ob["spatial_edges"].shape == (4, 2)


def test_action_clipping_and_motion():
    cfg = varnum_config(human_num=4)
    src = DummyDetectionSource(cfg)
    env = Sim2RealEnv(cfg, src)
    p0 = src.robot_pose.copy()
    for _ in range(20):
        env.act(np.array([2.0, 0.0]))  # over-speed: clipped to v_pref
        env.observe()
    assert np.linalg.norm(src.robot_pose[:2] - p0[:2]) > 0.1
    # wheel smoothing keeps commanded v bounded
    v, w = env.smooth(10.0, 0.0)
    assert v <= 0.035 * 17.5 + 1e-6
