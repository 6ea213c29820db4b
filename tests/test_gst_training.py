"""GST pipeline integration: collect data from the sim -> build dataset ->
train a few steps -> loss decreases. Mirrors the reference pipeline
collect_data.py -> mgnn datasets -> gst train.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.config import PredConfig, varnum_config
from crowdnav_prediction_attngraph_tpu.collect_data import collect_dataset
from crowdnav_prediction_attngraph_tpu.models.gst import dataset as ds
from crowdnav_prediction_attngraph_tpu.models.gst import trainer


@pytest.fixture(scope="module")
def records():
    cfg = varnum_config(human_num=4)
    data = collect_dataset(cfg, num_envs=2, tot_steps=64, seed=0, chunk=32)
    return data


def test_collect_produces_valid_records(records):
    total = sum(len(d) for d in records)
    assert total > 50
    arr = np.asarray(records[0])
    assert arr.shape[1] == 4
    # frames increase, ids are non-negative, positions in-arena-ish
    assert np.all(np.diff(np.unique(arr[:, 0])) > 0)
    assert np.all(arr[:, 1] >= 0)
    assert np.all(np.abs(arr[:, 2:]) < 30)


def test_windows_and_training_step(records):
    arr = np.asarray(records[0])
    windows = ds.build_windows(arr, obs_len=5, pred_len=5, max_peds=8)
    assert len(windows) > 3
    w = windows[0]
    assert w["v"].shape == (10, 8, 2)
    assert w["A"].shape == (10, 8, 8, 2)
    # displacements consistent with masks
    assert np.all(np.abs(w["v"][w["loss_mask_rel"].T.astype(bool)]) < 2.0)

    cfg = PredConfig()
    params = trainer.init_params(cfg, jax.random.key(0), max_peds=8)
    tx = trainer.make_optimizer(1e-3, 100, 1)
    opt_state = tx.init(params)
    step = trainer.make_train_step(cfg, tx, deterministic_loss=False)
    rng = np.random.RandomState(0)
    losses = []
    for it in range(8):
        for batch in ds.batches(windows, min(4, len(windows)), rng):
            batch = jax.tree.map(jnp.asarray, batch)
            params, opt_state, loss, aoe, foe = step(
                params, opt_state, batch, 0.5, jax.random.key(it))
            losses.append(float(loss))
            break
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"GST loss did not decrease: {losses}"


def test_temperature_schedule():
    # temperature_scheduler.py:12-20 endpoints
    assert trainer.temperature(0, 100, 0.5) == pytest.approx(0.5)
    assert trainer.temperature(100, 100, 0.5) == pytest.approx(0.03)
    assert trainer.temperature(200, 100, 0.5) == pytest.approx(0.03)
