"""Pallas packed masked-attention kernel vs the einsum reference
(interpret mode on CPU; compiled path exercised on TPU by ops/bench_edges)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.ops.masked_attention import (
    packed_masked_attention, reference_masked_attention)


@pytest.mark.parametrize("rows,A", [(13, 20), (32, 6), (7, 32)])
def test_kernel_matches_reference(rows, A):
    D, H = 512, 8
    rng = np.random.RandomState(rows + A)
    q = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    k = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    v = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    det = rng.randint(1, A + 1, rows)
    mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
    ref = reference_masked_attention(q, k, v, mask, H)
    got = packed_masked_attention(q, k, v, mask, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_mask_isolation():
    """A fully-padded trailing human must never receive attention weight."""
    rows, A, D, H = 8, 8, 512, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    k = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    v0 = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    mask = jnp.asarray(np.arange(A)[None, :] < 4).repeat(rows, 0)
    out0 = packed_masked_attention(q, k, v0, mask, H, interpret=True)
    # perturb masked-out values: output must not change
    v1 = v0.at[:, 4:].set(1e6)
    out1 = packed_masked_attention(q, k, v1, mask, H, interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)
