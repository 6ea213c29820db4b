"""Per-layer allclose parity of the Flax policy vs the PyTorch reference.

Instantiates the reference selfAttn_merge_SRNN (read-only at /root/reference)
with its own random initialization, ports the weights via
utils/torch_import.py, and checks the full forward pass matches at fixed
inputs — the BASELINE.json per-layer allclose gate. Skipped when the reference
checkout is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "rl")), reason="reference not mounted")

torch = pytest.importorskip("torch")


def make_ref_args(human_num, env_name="CrowdSimPredRealGST-v0", nenv=4):
    a = types.SimpleNamespace()
    a.no_cuda = True
    a.env_name = env_name
    a.sort_humans = True
    a.use_self_attn = True
    a.use_hr_attn = True
    a.seq_length = 6
    a.num_processes = nenv
    a.num_mini_batch = 1  # so the reference training path uses nenv = num_processes
    a.human_node_rnn_size = 128
    a.human_human_edge_rnn_size = 256
    a.human_node_input_size = 3
    a.human_human_edge_input_size = 2
    a.human_node_output_size = 256
    a.human_node_embedding_size = 64
    a.human_human_edge_embedding_size = 64
    a.attention_size = 64
    return a


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    # rl.networks.network_utils pulls in rl.networks.envs -> gym/baselines,
    # which aren't installed here; stub that single module (only VecNormalize
    # is referenced and unused by the model path).
    import importlib
    importlib.import_module("rl.networks")
    stub = types.ModuleType("rl.networks.envs")
    stub.VecNormalize = object
    sys.modules.setdefault("rl.networks.envs", stub)
    from rl.networks.selfAttn_srnn_temp_node import selfAttn_merge_SRNN
    from rl.networks.model import Policy
    yield selfAttn_merge_SRNN, Policy
    sys.path.remove(REF)


def build_obs(rng, T, N, A, edge_dim):
    obs_np = {
        "robot_node": rng.randn(T * N, 1, 7).astype(np.float32),
        "temporal_edges": rng.randn(T * N, 1, 2).astype(np.float32),
        "spatial_edges": (rng.randn(T * N, A, edge_dim) * 3).astype(np.float32),
        "visible_masks": np.ones((T * N, A), bool),
        "detected_human_num": rng.randint(1, A + 1,
                                          (T * N, 1)).astype(np.float32),
    }
    return obs_np


class Box:
    """Minimal stand-in for gym.spaces.Box (reference model.py:34 only checks
    __class__.__name__)."""

    def __init__(self, shape):
        self.shape = shape


def test_forward_parity(ref_modules):
    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.models import policy as jpolicy
    from crowdnav_prediction_attngraph_tpu.models.policy_net import init_hidden
    from crowdnav_prediction_attngraph_tpu.utils.torch_import import (
        policy_params_from_torch)

    selfAttn_merge_SRNN, Policy = ref_modules
    A, T, N = 6, 6, 4
    edge_dim = 12
    args = make_ref_args(A, nenv=N)
    cfg = gst_config(human_num=A)

    obs_space = {"spatial_edges": np.zeros((A, edge_dim))}
    action_space = Box((2,))

    torch.manual_seed(0)
    ref = Policy(obs_space, action_space, base="selfAttn_merge_srnn",
                 base_kwargs=args)
    ref.eval()

    rng = np.random.RandomState(1)
    obs_np = build_obs(rng, T, N, A, edge_dim)
    masks_np = (rng.rand(T * N, 1) > 0.2).astype(np.float32)
    h_node = rng.randn(N, 1, 128).astype(np.float32) * 0.1
    h_edge = np.zeros((N, A + 1, 256), np.float32)

    # ---- reference forward (training path, infer=False) ----
    tobs = {k: torch.from_numpy(v.astype(np.float32)) for k, v in obs_np.items()}
    rnn_hxs = {"human_node_rnn": torch.from_numpy(h_node.copy()),
               "human_human_edge_rnn": torch.from_numpy(h_edge.copy())}
    with torch.no_grad():
        value_ref, actions_feat_ref, _ = ref.base(
            tobs, rnn_hxs, torch.from_numpy(masks_np), infer=False)
        dist = ref.dist(actions_feat_ref)
        mean_ref = dist.mean.numpy()
    value_ref = value_ref.numpy()

    # ---- flax forward on ported weights ----
    params = policy_params_from_torch(ref.state_dict())
    params = jax.tree.map(jnp.asarray, params)
    obs_j = {k: jnp.asarray(v).reshape(T, N, *v.shape[1:])
             for k, v in obs_np.items()}
    hxs = {"human_node_rnn": jnp.asarray(h_node),
           "human_human_edge_rnn": jnp.asarray(h_edge)}
    masks_j = jnp.asarray(masks_np).reshape(T, N)

    model = jpolicy.make_policy(cfg)
    value_j, mean_j, logstd_j, _ = model.apply(params, obs_j, hxs, masks_j)

    np.testing.assert_allclose(np.asarray(value_j).reshape(-1, 1), value_ref,
                               atol=2e-5,
                               err_msg="value head mismatch")
    np.testing.assert_allclose(np.asarray(mean_j).reshape(-1, 2), mean_ref,
                               atol=2e-5, err_msg="action mean mismatch")


def test_infer_path_parity(ref_modules):
    """Rollout path (seq_len=1) incl. hidden-state propagation over 3 steps."""
    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.models import policy as jpolicy
    from crowdnav_prediction_attngraph_tpu.utils.torch_import import (
        policy_params_from_torch)

    _, Policy = ref_modules
    A, N = 6, 4
    edge_dim = 12
    args = make_ref_args(A, nenv=N)
    cfg = gst_config(human_num=A)

    torch.manual_seed(3)
    ref = Policy({"spatial_edges": np.zeros((A, edge_dim))}, Box((2,)),
                 base="selfAttn_merge_srnn", base_kwargs=args)
    ref.eval()
    params = jax.tree.map(jnp.asarray, policy_params_from_torch(ref.state_dict()))
    model = jpolicy.make_policy(cfg)

    rng = np.random.RandomState(5)
    h_node = np.zeros((N, 1, 128), np.float32)
    h_edge = np.zeros((N, A + 1, 256), np.float32)
    h_t = {"human_node_rnn": torch.from_numpy(h_node.copy()),
           "human_human_edge_rnn": torch.from_numpy(h_edge.copy())}
    h_j = {"human_node_rnn": jnp.asarray(h_node),
           "human_human_edge_rnn": jnp.asarray(h_edge)}

    for step in range(3):
        obs_np = build_obs(rng, 1, N, A, edge_dim)
        masks_np = (rng.rand(N, 1) > 0.2).astype(np.float32)
        tobs = {k: torch.from_numpy(v) for k, v in obs_np.items()}
        with torch.no_grad():
            v_ref, feat_ref, h_t = ref.base(tobs, h_t,
                                            torch.from_numpy(masks_np),
                                            infer=True)
        obs_j = {k: jnp.asarray(v)[None] for k, v in obs_np.items()}
        v_j, feat_j, _, h_j = model.apply(params, obs_j, h_j,
                                          jnp.asarray(masks_np).reshape(1, N))
        np.testing.assert_allclose(np.asarray(v_j[0]), v_ref.numpy(),
                                   atol=2e-5, err_msg=f"step {step} value")
        np.testing.assert_allclose(
            np.asarray(h_j["human_node_rnn"]),
            h_t["human_node_rnn"].numpy().reshape(N, 1, 128), atol=2e-5,
            err_msg=f"step {step} hidden")
        # reference squeezes hidden to (N, 1, 128) each call; re-expand
        h_t = {k: v if v.dim() == 3 else v for k, v in h_t.items()}
