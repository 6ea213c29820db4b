"""EdgeSelector (sparse-edge GST variant) parity vs the torch reference.

The shipped checkpoints use full connectivity (edge_head 0); the sparse
selector is exercised here with random weights. The Gumbel sample itself is
RNG-dependent, so parity is checked on the deterministic edge multinomial
(edge_selector_no_ghost.py:85-87)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "gst_updated")),
    reason="reference not mounted")

torch = pytest.importorskip("torch")


def test_edge_multinomial_parity():
    sys.path.insert(0, REF)
    try:
        from gst_updated.src.gumbel_social_transformer.edge_selector_no_ghost \
            import EdgeSelector as TorchES
    finally:
        sys.path.remove(REF)
    from crowdnav_prediction_attngraph_tpu.models.gst.st_model import EdgeSelector

    B, A, dm, D, nh = 3, 6, 2, 64, 4
    torch.manual_seed(0)
    ref = TorchES(dm, D, nhead=nh, dropout=0.0)
    ref.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(B, A, dm).astype(np.float32)
    Amat = rng.randn(B, A, A, dm).astype(np.float32)
    mask = (rng.rand(B, A, A) > 0.3).astype(np.float32)
    # ensure every row has some connectivity
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
    model = EdgeSelector(d_motion=dm, d_model=D, nhead=nh)
    mult_j, _ = model.apply(jax.tree.map(jnp.asarray, params),
                            jnp.asarray(x), jnp.asarray(Amat),
                            jnp.asarray(mask), 0.5, False, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(mult_j), mult_ref.numpy(), atol=2e-5)
