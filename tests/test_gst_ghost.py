"""Ghost-mode GST parity vs the reference (edge_selector_ghost.py,
node_encoder_layer_ghost.py): a zero 'ghost' neighbor lets targets attend to
nothing."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "gst_updated")),
    reason="reference not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_path():
    # the ghost modules import via 'src.gumbel_social_transformer.*'
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "gst_updated"))
    yield
    sys.path.remove(os.path.join(REF, "gst_updated"))
    sys.path.remove(REF)


def test_ghost_edge_multinomial_parity(ref_path):
    from src.gumbel_social_transformer.edge_selector_ghost import (
        EdgeSelector as TorchES)
    from crowdnav_prediction_attngraph_tpu.models.gst.st_model import EdgeSelector

    B, A, dm, D, nh = 2, 5, 2, 64, 4
    torch.manual_seed(0)
    ref = TorchES(dm, D, nhead=nh, dropout=0.0)
    ref.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(B, A, dm).astype(np.float32)
    Amat = rng.randn(B, A, A, dm).astype(np.float32)
    mask = (rng.rand(B, A, A) > 0.3).astype(np.float32)
    mask[:, :, 0] = 1.0

    with torch.no_grad():
        mult_ref, _ = ref(torch.from_numpy(x), torch.from_numpy(Amat),
                          torch.from_numpy(mask), tau=0.5, hard=False,
                          device="cpu")

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    t = lambda w: np.ascontiguousarray(w.T)
    params = {"params": {
        "augmented_edge_embedding": {
            "kernel": t(sd["augmented_edge_embedding.weight"]),
            "bias": sd["augmented_edge_embedding.bias"]},
        "norm_augmented_edge": {
            "scale": sd["norm_augmented_edge.weight"],
            "bias": sd["norm_augmented_edge.bias"]},
        "in_proj_weight": t(sd["self_attn.in_proj_weight"]),
        "in_proj_bias": sd["self_attn.in_proj_bias"],
        "out_proj": {"kernel": t(sd["self_attn.out_proj.weight"]),
                     "bias": sd["self_attn.out_proj.bias"]},
        "linear1": {"kernel": t(sd["linear1.weight"]),
                    "bias": sd["linear1.bias"]},
        "linear2": {"kernel": t(sd["linear2.weight"]),
                    "bias": sd["linear2.bias"]},
    }}
    model = EdgeSelector(d_motion=dm, d_model=D, nhead=nh, ghost=True)
    mult_j, sampled_j = model.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(Amat),
        jnp.asarray(mask), 0.5, False, jax.random.key(0))
    assert mult_j.shape == (B, A, nh, A + 1)
    np.testing.assert_allclose(np.asarray(mult_j), mult_ref.numpy(), atol=2e-5)


def test_ghost_node_encoder_runs():
    from crowdnav_prediction_attngraph_tpu.models.gst.st_model import (
        NodeEncoderLayer)
    B, A, D = 2, 5, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, A, D), jnp.float32)
    adj = jnp.asarray(rng.rand(B, A, A + 1), jnp.float32)  # incl. ghost col
    attn = jnp.ones((B, A, A))
    layer = NodeEncoderLayer(D, 8, 128, ghost=True)
    params = layer.init(jax.random.key(0), x, adj, attn)
    out, w = layer.apply(params, x, adj, attn)
    assert out.shape == (B, A, D)
    assert w.shape == (B, 8, A, A + 1)
    assert np.all(np.isfinite(np.asarray(out)))
