"""Recorder + action replay (reference recorder.py:52-56 + crowd_sim.py:169-173):
record an episode, replay the saved action CSV through the env, positions must
be bit-exact (the sim2real system-ID workflow, end-to-end with no hardware)."""

import numpy as np

from crowdnav_prediction_attngraph_tpu.config import varnum_config
from crowdnav_prediction_attngraph_tpu import sim2real
from crowdnav_prediction_attngraph_tpu.utils.recorder import Recorder


def small_cfg():
    return varnum_config(human_num=3)


def test_record_save_load_roundtrip(tmp_path):
    cfg = small_cfg()
    rec, steps = sim2real.record_sim_episode(
        cfg, case_idx=3, robot_policy="orca", out_dir=str(tmp_path),
        max_steps=12)
    assert steps == 12 or steps < 12  # may finish early
    loaded = Recorder.load_actions(str(tmp_path / "3_actions.csv"))
    assert loaded.shape == (steps, 2)


def test_replay_is_bit_exact(tmp_path):
    cfg = small_cfg()
    rec, steps = sim2real.record_sim_episode(
        cfg, case_idx=5, robot_policy="orca", out_dir=str(tmp_path),
        max_steps=15)
    actions = Recorder.load_actions(str(tmp_path / "5_actions.csv"))
    replayed = sim2real.replay_actions(cfg, actions, case_idx=5)
    recorded = np.asarray(rec_positions(tmp_path, 5))
    assert replayed.shape[0] == recorded.shape[0]
    np.testing.assert_array_equal(replayed.astype(np.float32),
                                  recorded.astype(np.float32))


def rec_positions(tmp_path, case):
    import csv
    with open(str(tmp_path / f"{case}_positions.csv")) as f:
        return [[float(x) for x in row] for row in csv.reader(f)]
