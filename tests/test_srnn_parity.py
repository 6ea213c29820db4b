"""DS-RNN baseline parity vs the PyTorch reference (srnn_model.py:326-468)."""

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


@pytest.fixture(scope="module")
def ref_srnn():
    sys.path.insert(0, REF)
    import importlib
    importlib.import_module("rl.networks")
    stub = types.ModuleType("rl.networks.envs")
    stub.VecNormalize = object
    sys.modules.setdefault("rl.networks.envs", stub)
    from rl.networks.srnn_model import SRNN
    yield SRNN
    sys.path.remove(REF)


def srnn_args(A, N):
    a = types.SimpleNamespace()
    a.no_cuda = True
    a.env_type = "crowd_sim"
    a.seq_length = 5
    a.num_processes = N
    a.num_mini_batch = 1
    a.human_node_rnn_size = 128
    a.human_human_edge_rnn_size = 256
    a.human_node_input_size = 3
    a.human_human_edge_input_size = 2
    a.human_node_output_size = 256
    a.human_node_embedding_size = 64
    a.human_human_edge_embedding_size = 64
    a.attention_size = 64
    return a


def port_srnn_params(sd):
    """torch SRNN state_dict -> flax models/srnn.SRNN params."""
    import numpy as np

    def t(w):
        return np.asarray(w).T

    def dense(p):
        return {"kernel": t(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}

    def gru(p):
        return {"w_ih": t(sd[p + ".weight_ih_l0"]),
                "w_hh": t(sd[p + ".weight_hh_l0"]),
                "b_ih": np.asarray(sd[p + ".bias_ih_l0"]),
                "b_hh": np.asarray(sd[p + ".bias_hh_l0"])}

    base = {
        "edgeRNN_temporal": {
            "encoder_linear": dense("humanhumanEdgeRNN_temporal.encoder_linear"),
            "gru": gru("humanhumanEdgeRNN_temporal.gru")},
        "edgeRNN_spatial": {
            "encoder_linear": dense("humanhumanEdgeRNN_spatial.encoder_linear"),
            "gru": gru("humanhumanEdgeRNN_spatial.gru")},
        "attn": {"temporal_edge_layer": dense("attn.temporal_edge_layer.0"),
                 "spatial_edge_layer": dense("attn.spatial_edge_layer.0")},
        "robot_linear": dense("robot_linear"),
        "humanNodeRNN": {
            "encoder_linear": dense("humanNodeRNN.encoder_linear"),
            "edge_attention_embed": dense("humanNodeRNN.edge_attention_embed"),
            "output_linear": dense("humanNodeRNN.output_linear"),
            "gru": gru("humanNodeRNN.gru")},
        "actor_0": dense("actor.0"), "actor_1": dense("actor.2"),
        "critic_0": dense("critic.0"), "critic_1": dense("critic.2"),
        "critic_linear": dense("critic_linear"),
    }
    return {"params": base}


def test_srnn_forward_parity(ref_srnn):
    import dataclasses
    from crowdnav_prediction_attngraph_tpu.config import varnum_config
    from crowdnav_prediction_attngraph_tpu.models.srnn import SRNN as JSRNN

    SRNN = ref_srnn
    A, T, N = 5, 5, 3
    args = srnn_args(A, N)
    torch.manual_seed(0)
    ref = SRNN({"spatial_edges": np.zeros((A, 2))}, args)
    ref.eval()

    cfg = varnum_config(human_num=A)
    rng = np.random.RandomState(2)
    obs_np = {
        "robot_node": rng.randn(T * N, 1, 7).astype(np.float32),
        "temporal_edges": rng.randn(T * N, 1, 2).astype(np.float32),
        "spatial_edges": rng.randn(T * N, A, 2).astype(np.float32),
    }
    masks_np = (rng.rand(T * N, 1) > 0.2).astype(np.float32)
    h_node = rng.randn(N, 1, 128).astype(np.float32) * 0.1
    h_edge = rng.randn(N, A + 1, 256).astype(np.float32) * 0.1

    tobs = {k: torch.from_numpy(v) for k, v in obs_np.items()}
    rnn_hxs = {"human_node_rnn": torch.from_numpy(h_node.copy()),
               "human_human_edge_rnn": torch.from_numpy(h_edge.copy())}
    with torch.no_grad():
        v_ref, feat_ref, hxs_ref = ref(tobs, rnn_hxs,
                                       torch.from_numpy(masks_np), infer=False)

    params = jax.tree.map(jnp.asarray,
                          port_srnn_params({k: v.numpy() for k, v
                                            in ref.state_dict().items()}))
    model = JSRNN(cfg)
    obs_j = {k: jnp.asarray(v).reshape(T, N, *v.shape[1:])
             for k, v in obs_np.items()}
    hxs_j = {"human_node_rnn": jnp.asarray(h_node),
             "human_human_edge_rnn": jnp.asarray(h_edge)}
    v_j, feat_j, hxs_out = model.apply(params, obs_j, hxs_j,
                                       jnp.asarray(masks_np).reshape(T, N))

    np.testing.assert_allclose(np.asarray(v_j).reshape(-1, 1), v_ref.numpy(),
                               atol=3e-5, err_msg="SRNN value mismatch")
    np.testing.assert_allclose(
        np.asarray(hxs_out["human_node_rnn"]),
        hxs_ref["human_node_rnn"].numpy().reshape(N, 1, 128), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(hxs_out["human_human_edge_rnn"]),
        hxs_ref["human_human_edge_rnn"].numpy().reshape(N, A + 1, 256),
        atol=3e-5)
