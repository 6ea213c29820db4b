"""End-to-end GST env: fused predictor rewrites observations and rewards
inside the rollout (the reference's VecPretextNormalize + talk2Env loop,
vec_pretext_normalize.py:112-191)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.config import gst_config

CKPT = ("/root/reference/gst_updated/results/100-gumbel_social_transformer-"
        "faster_lstm-lr_0.001-init_temp_0.5-edge_head_0-ebd_64-snl_1-snh_8-"
        "seed_1000_rand/sj")


@pytest.fixture(scope="module")
def gst_params():
    if os.path.isdir(CKPT):
        from crowdnav_prediction_attngraph_tpu.utils.torch_import import (
            load_gst_checkpoint)
        return jax.tree.map(
            jnp.asarray,
            load_gst_checkpoint(os.path.join(CKPT, "checkpoint/epoch_100.pt")))
    # fall back to random weights: same compute path
    from crowdnav_prediction_attngraph_tpu.models.gst.st_model import STModel
    from crowdnav_prediction_attngraph_tpu.config import PredConfig
    cfg = PredConfig()
    L, A = cfg.obs_seq_len, 6
    return STModel(cfg).init(
        jax.random.key(0), jnp.zeros((1, L, A, 2)), jnp.zeros((1, L, A, A, 2)),
        jnp.ones((1, L, A, A)), jnp.ones((1, A, L + cfg.pred_seq_len)),
        0.03, True, False)


def test_gst_rollout_runs_and_predicts(gst_params):
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod

    cfg = gst_config(human_num=6)
    cfg = cfg.replace(ppo=cfg.ppo.__class__(
        num_processes=4, num_steps=6, num_mini_batch=2, ppo_epoch=1))
    ts = ppo_mod.init_train_state(cfg, jax.random.key(0), gst_params)
    ts, batch = jax.jit(lambda t: ppo_mod.rollout(cfg, t, gst_params))(ts)

    edges = np.asarray(batch.obs["spatial_edges"])   # (T+1, N, A, 12)
    assert np.all(np.isfinite(edges))
    assert np.all(np.isfinite(np.asarray(batch.rewards)))

    # after enough steps for the history buffer to fill, predicted future
    # offsets must differ from the tiled-current placeholder for visible
    # humans (vec_pretext_normalize.py:162-170)
    last = edges[-1]                                  # (N, A, 12)
    cur = last[:, :, :2]
    future1 = last[:, :, 2:4]
    visible = np.linalg.norm(cur, axis=-1) < 14.0     # not at the 15-dummy
    if visible.any():
        diff = np.abs(future1 - cur)[visible]
        assert diff.max() > 1e-4, "GST predictions never overwrote placeholders"

    # rows sorted by current distance (vec_pretext_normalize.py:173-178)
    for n in range(last.shape[0]):
        d = np.linalg.norm(last[n, :, :2], axis=-1)
        assert np.all(np.diff(d) >= -1e-4)


def test_gst_training_iteration(gst_params):
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod

    cfg = gst_config(human_num=6)
    cfg = cfg.replace(ppo=cfg.ppo.__class__(
        num_processes=4, num_steps=6, num_mini_batch=2, ppo_epoch=1))
    ts = ppo_mod.init_train_state(cfg, jax.random.key(1), gst_params)
    ts, metrics = jax.jit(
        lambda t: ppo_mod.train_iteration(cfg, t, gst_params))(ts)
    for k in ("value_loss", "action_loss", "dist_entropy"):
        assert np.isfinite(float(metrics[k]))
