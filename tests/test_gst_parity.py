"""GST predictor parity vs the reference PyTorch stack with the SHIPPED
pretrained checkpoint (epoch_100.pt) — real-weight allclose, the strongest
form of the BASELINE.json per-layer gate."""

import os
import pickle
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
CKPT_DIR = os.path.join(
    REF, "gst_updated/results/100-gumbel_social_transformer-faster_lstm-"
    "lr_0.001-init_temp_0.5-edge_head_0-ebd_64-snl_1-snh_8-seed_1000_rand/sj")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CKPT_DIR), reason="reference GST checkpoint missing")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_model():
    sys.path.insert(0, REF)
    from gst_updated.src.gumbel_social_transformer.st_model import st_model
    with open(os.path.join(CKPT_DIR, "checkpoint/args.pickle"), "rb") as f:
        args = pickle.load(f)
    model = st_model(args, device="cpu")
    ck = torch.load(os.path.join(CKPT_DIR, "checkpoint/epoch_100.pt"),
                    map_location="cpu", weights_only=False)
    model.load_state_dict(ck["model_state_dict"])
    model.eval()
    yield model, args
    sys.path.remove(REF)


def make_inputs(rng, B, L, A, K):
    pos = rng.randn(B, A, L, 2).astype(np.float32).cumsum(axis=2) * 0.3
    # some pedestrians partially observed
    mask = np.ones((B, A, L), np.float32)
    mask[:, -1, : L // 2] = 0.0          # appears midway
    mask[:, -2, :] = 0.0                 # never observed
    return pos, mask


def build_graph_inputs(pos, mask, K):
    """Reproduce the wrapper's input pipeline for both frameworks
    (crowd_nav_interface_parallel.py:74-90)."""
    B, A, L, _ = pos.shape
    m = mask
    lm_rel_obs = np.concatenate([m[:, :, :1], m[:, :, :-1] * m[:, :, -1:]],
                                axis=2)
    lm_rel_pred = np.ones((B, A, K), np.float32) * lm_rel_obs[:, :, -1:]
    loss_mask_rel = np.concatenate([lm_rel_obs, lm_rel_pred], axis=2)
    lm_t = np.transpose(lm_rel_obs, (0, 2, 1))
    attn = lm_t[:, :, :, None] * lm_t[:, :, None, :]
    disp = pos[:, :, 1:] - pos[:, :, :-1]
    disp = np.concatenate([np.zeros((B, A, 1, 2), np.float32), disp], axis=2)
    disp = np.where(lm_rel_obs[..., None] > 0, disp, -999.0).astype(np.float32)
    v_obs = np.transpose(disp, (0, 2, 1, 3))
    pos_t = np.transpose(pos, (0, 2, 1, 3))
    A_obs = pos_t[:, :, :, None, :] - pos_t[:, :, None, :, :]
    return v_obs, A_obs, attn.astype(np.float32), loss_mask_rel.astype(np.float32)


def test_st_model_forward_parity(ref_model):
    from crowdnav_prediction_attngraph_tpu.config import PredConfig
    from crowdnav_prediction_attngraph_tpu.models.gst.st_model import STModel
    from crowdnav_prediction_attngraph_tpu.utils.torch_import import (
        gst_params_from_torch)

    model_t, args = ref_model
    B, L, A, K = 3, args.obs_seq_len, 7, args.pred_seq_len
    rng = np.random.RandomState(0)
    pos, mask = make_inputs(rng, B, L, A, K)
    v_obs, A_obs, attn, lm = build_graph_inputs(pos, mask, K)

    with torch.no_grad():
        (gp, x_sample, _info) = model_t(
            torch.from_numpy(v_obs), torch.from_numpy(A_obs),
            torch.from_numpy(attn), torch.from_numpy(lm),
            tau=0.03, hard=True, sampling=False, device="cpu")
    mu_t, sx_t, sy_t, corr_t = [t.numpy() for t in gp]

    cfg = PredConfig()
    params = jax.tree.map(jnp.asarray,
                          gst_params_from_torch(model_t.state_dict()))
    model_j = STModel(cfg)
    fwd = jax.jit(lambda *a: model_j.apply(*a, 0.03, True, False))
    (mu_j, sx_j, sy_j, corr_j), xs_j = fwd(
        params, jnp.asarray(v_obs), jnp.asarray(A_obs), jnp.asarray(attn),
        jnp.asarray(lm))

    np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=1e-4,
                               err_msg="decoder mu mismatch")
    np.testing.assert_allclose(np.asarray(sx_j), sx_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sy_j), sy_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(corr_j), corr_t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xs_j), x_sample.numpy(), atol=1e-4)


def test_wrapper_interface_parity(ref_model):
    """End-to-end wrapper: history buffers -> absolute-frame predictions
    (crowd_nav_interface_parallel.py:45-114 vs models/gst/predictor.py)."""
    from crowdnav_prediction_attngraph_tpu.config import PredConfig
    from crowdnav_prediction_attngraph_tpu.models.gst.predictor import gst_predict
    from crowdnav_prediction_attngraph_tpu.utils.torch_import import (
        gst_params_from_torch)

    model_t, args = ref_model
    B, L, A, K = 2, args.obs_seq_len, 6, args.pred_seq_len
    rng = np.random.RandomState(4)
    pos, mask = make_inputs(rng, B, L, A, K)

    # reference wrapper math, inlined (no GPU/model-dir dependency)
    v_obs, A_obs, attn, lm = build_graph_inputs(pos, mask, K)
    with torch.no_grad():
        (gp, _xs, _info) = model_t(
            torch.from_numpy(v_obs), torch.from_numpy(A_obs),
            torch.from_numpy(attn), torch.from_numpy(lm),
            tau=0.03, hard=True, sampling=False, device="cpu")
        mu, sx, sy, corr = gp
        mu = mu.cumsum(1)
        sx_c = (sx ** 2).cumsum(1) ** 0.5
        sy_c = (sy ** 2).cumsum(1) ** 0.5
        corr_c = (corr * sx * sy).cumsum(1) / (sx_c * sy_c)
        obs_traj = torch.from_numpy(pos).permute(0, 1, 3, 2)
        mu_c = mu + obs_traj.permute(0, 3, 1, 2)[:, -1:]
        lm_pred = torch.from_numpy(lm[:, :, L:])
        mu_c = mu_c * lm_pred.permute(0, 2, 1).unsqueeze(-1) + \
            (-999.0) * (1 - lm_pred.permute(0, 2, 1).unsqueeze(-1))
        out_ref = torch.cat([mu_c, sx_c, sy_c, corr_c], dim=3) \
            .permute(0, 2, 1, 3).numpy()

    cfg = PredConfig()
    params = jax.tree.map(jnp.asarray,
                          gst_params_from_torch(model_t.state_dict()))
    pred = jax.jit(jax.vmap(lambda t, m: gst_predict(cfg, params, t, m)))
    out_j, out_mask = pred(jnp.asarray(pos), jnp.asarray(mask) > 0)

    np.testing.assert_allclose(np.asarray(out_j), out_ref, atol=5e-4)
    # never-observed pedestrian must be masked out of predictions
    assert not bool(np.asarray(out_mask)[0, -2, 0])
