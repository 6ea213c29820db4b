"""Edge-partitioned ring attention: numerics vs dense, weak-scaling sanity
on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from crowdnav_prediction_attngraph_tpu.ops.masked_attention import (
    reference_masked_attention)
from crowdnav_prediction_attngraph_tpu.parallel.edge_partition import (
    edge_partitioned_attention)


def make_mesh(n):
    from jax.experimental import mesh_utils
    dev = mesh_utils.create_device_mesh((n,), devices=jax.devices()[:n])
    return Mesh(dev, ("tp",))


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_matches_dense(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    rows, A, D, H = 6, 16, 256, 8
    rng = np.random.RandomState(n_dev)
    q = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    k = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    v = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    det = rng.randint(1, A + 1, rows)
    mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])

    mesh = make_mesh(n_dev)
    with mesh:
        out = edge_partitioned_attention(q, k, v, mask, H, mesh)
    ref = reference_masked_attention(q, k, v, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               err_msg=f"n_dev={n_dev}")


def test_rows_with_partial_masks():
    """Agents masked out on remote shards must not contribute."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rows, A, D, H = 4, 8, 128, 4
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    k = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    v = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    mask = jnp.asarray(rng.rand(rows, A) > 0.4)
    mask = mask.at[:, 0].set(True)
    mesh = make_mesh(4)
    with mesh:
        out = edge_partitioned_attention(q, k, v, mask, H, mesh)
    ref = reference_masked_attention(q, k, v, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
