"""Pallas packed masked-attention kernel vs the einsum reference
(interpret mode on CPU; compiled path exercised on TPU by ops/bench_edges)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdnav_prediction_attngraph_tpu.ops.masked_attention import (
    fused_graph_attention, packed_masked_attention,
    reference_fused_graph_attention, reference_masked_attention)


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


def _fused_inputs(rows, A, D=512, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(rows, A, D) * 0.3, jnp.float32)
    w_qkv = jnp.asarray(rng.randn(D, 3 * D) / np.sqrt(D), jnp.float32)
    b_qkv = jnp.asarray(rng.randn(3 * D) * 0.01, jnp.float32)
    w_out = jnp.asarray(rng.randn(D, D) / np.sqrt(D), jnp.float32)
    b_out = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)
    det = rng.randint(1, A + 1, rows)
    mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
    return x, mask, w_qkv, b_qkv, w_out, b_out


@pytest.mark.parametrize("rows,A,r_blk", [(13, 20, 8), (33, 20, 16)])
def test_fused_kernel_matches_reference_f32(rows, A, r_blk):
    x, mask, w_qkv, b_qkv, w_out, b_out = _fused_inputs(rows, A)
    ref = reference_fused_graph_attention(x, mask, w_qkv, b_qkv, w_out,
                                          b_out, 8)
    got = fused_graph_attention(x, mask, w_qkv, b_qkv, w_out, b_out, 8,
                                r_blk=r_blk, compute_dtype=jnp.float32,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)


@pytest.mark.parametrize("strip_rows", [1, 2, 4, 8, 16, 32])
def test_fused_kernel_strip_sweep(strip_rows):
    """Every logits sub-tiling (strips of whole packed rows) is exact —
    block-diagonal attention never crosses a strip boundary."""
    x, mask, w_qkv, b_qkv, w_out, b_out = _fused_inputs(45, 20, seed=7)
    ref = reference_fused_graph_attention(x, mask, w_qkv, b_qkv, w_out,
                                          b_out, 8)
    got = fused_graph_attention(x, mask, w_qkv, b_qkv, w_out, b_out, 8,
                                r_blk=32, compute_dtype=jnp.float32,
                                strip_rows=strip_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)


def test_packed_kernel_strip_sweep():
    rows, A, D, H = 21, 20, 512, 8
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    k = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    v = jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    det = rng.randint(1, A + 1, rows)
    mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
    ref = reference_masked_attention(q, k, v, mask, H)
    for strip_rows in (1, 2, 4, 8):
        got = packed_masked_attention(q, k, v, mask, H,
                                      strip_rows=strip_rows, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def test_fused_kernel_bf16_close():
    x, mask, w_qkv, b_qkv, w_out, b_out = _fused_inputs(16, 20, seed=3)
    ref = reference_fused_graph_attention(x, mask, w_qkv, b_qkv, w_out,
                                          b_out, 8)
    got = fused_graph_attention(x, mask, w_qkv, b_qkv, w_out, b_out, 8,
                                compute_dtype=jnp.bfloat16, interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 2e-2, err.max() / scale


def test_fused_kernel_gradients_match_reference():
    """The PPO update differentiates through the attention: the kernel's
    custom VJP (rematerialized reference-math backward) must produce the
    einsum path's gradients for every input."""
    x, mask, w_qkv, b_qkv, w_out, b_out = _fused_inputs(13, 20, seed=11)

    def loss_ref(x, wq, bq, wo, bo):
        out = reference_fused_graph_attention(x, mask, wq, bq, wo, bo, 8)
        return jnp.sum(out ** 2)

    def loss_pal(x, wq, bq, wo, bo):
        out = fused_graph_attention(x, mask, wq, bq, wo, bo, 8,
                                    compute_dtype=jnp.float32,
                                    interpret=True)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, w_qkv, b_qkv, w_out, b_out)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(
        x, w_qkv, b_qkv, w_out, b_out)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-3)


def test_policy_pallas_path_gradients():
    """End-to-end: grads of a scalar loss over the policy forward agree
    between the pallas (f32 interpret) and einsum paths on shared params."""
    import dataclasses
    from crowdnav_prediction_attngraph_tpu.config import varnum_config
    from crowdnav_prediction_attngraph_tpu.models.policy_net import (
        SelfAttnMergeSRNN, init_hidden)

    base = varnum_config(human_num=6)
    cfg0 = base.replace(network=dataclasses.replace(
        base.network, use_pallas_attention=False))
    cfg1 = base.replace(network=dataclasses.replace(
        base.network, use_pallas_attention=True, pallas_dtype="float32"))

    N, A, D = 4, cfg0.sim.max_human_num, cfg0.spatial_edge_dim
    rng = np.random.RandomState(1)
    obs = {
        "robot_node": jnp.asarray(rng.randn(1, N, 7), jnp.float32),
        "temporal_edges": jnp.asarray(rng.randn(1, N, 2), jnp.float32),
        "spatial_edges": jnp.asarray(rng.randn(1, N, A, D), jnp.float32),
        "visible_masks": jnp.ones((1, N, A), bool),
        "detected_human_num": jnp.full((1, N), A, jnp.int32),
    }
    hxs = init_hidden(cfg0, N)
    masks = jnp.ones((1, N))
    m0, m1 = SelfAttnMergeSRNN(cfg0), SelfAttnMergeSRNN(cfg1)
    params = m0.init(jax.random.key(0), obs, hxs, masks)

    def loss(m):
        def f(p):
            value, _, _ = m.apply(p, obs, hxs, masks)
            return jnp.sum(value ** 2)
        return f

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fused_mask_isolation():
    x, mask0, w_qkv, b_qkv, w_out, b_out = _fused_inputs(8, 8, seed=1)
    mask = jnp.asarray(np.arange(8)[None, :] < 4).repeat(8, 0)
    out0 = fused_graph_attention(x, mask, w_qkv, b_qkv, w_out, b_out, 8,
                                 compute_dtype=jnp.float32, interpret=True)
    x1 = x.at[:, 4:].set(1e4)  # perturb masked-out rows' inputs
    out1 = fused_graph_attention(x1, mask, w_qkv, b_qkv, w_out, b_out, 8,
                                 compute_dtype=jnp.float32, interpret=True)
    # valid-query outputs must be unchanged
    np.testing.assert_allclose(np.asarray(out0[:, :4]),
                               np.asarray(out1[:, :4]), atol=1e-4)


def test_policy_pallas_path_matches_einsum():
    """Full policy forward: fused-Pallas attention (f32, interpret on CPU)
    must match the XLA einsum path on the SAME params (identical tree)."""
    import dataclasses
    from crowdnav_prediction_attngraph_tpu.config import varnum_config
    from crowdnav_prediction_attngraph_tpu.models.policy_net import (
        SelfAttnMergeSRNN, init_hidden)

    base = varnum_config(human_num=6)
    cfg0 = base.replace(network=dataclasses.replace(
        base.network, use_pallas_attention=False))
    cfg1 = base.replace(network=dataclasses.replace(
        base.network, use_pallas_attention=True, pallas_dtype="float32"))

    N, A, D = 5, cfg0.sim.max_human_num, cfg0.spatial_edge_dim
    rng = np.random.RandomState(0)
    obs = {
        "robot_node": jnp.asarray(rng.randn(1, N, 7), jnp.float32),
        "temporal_edges": jnp.asarray(rng.randn(1, N, 2), jnp.float32),
        "spatial_edges": jnp.asarray(rng.randn(1, N, A, D), jnp.float32),
        "visible_masks": jnp.ones((1, N, A), bool),
        "detected_human_num": jnp.full((1, N), A, jnp.int32),
    }
    hxs = init_hidden(cfg0, N)
    masks = jnp.ones((1, N))

    m0 = SelfAttnMergeSRNN(cfg0)
    m1 = SelfAttnMergeSRNN(cfg1)
    params = m0.init(jax.random.key(0), obs, hxs, masks)
    out0 = m0.apply(params, obs, hxs, masks)
    out1 = m1.apply(params, obs, hxs, masks)   # same params, pallas path
    for a, b in zip(jax.tree.leaves(out0), jax.tree.leaves(out1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


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


@pytest.mark.parametrize("rows,A,r_blk", [(13, 20, None), (33, 20, 16)])
def test_fused_backward_matches_reference_grads(rows, A, r_blk):
    """The Pallas backward kernel (_fused_backward) produces the gradients
    of the executed forward: all five grads (dx, dW_qkv, db_qkv, dW_out,
    db_out) allclose vs jax.grad through the XLA reference."""
    x, mask, w_qkv, b_qkv, w_out, b_out = _fused_inputs(rows, A, seed=3)

    def loss_fused(x, wq, bq, wo, bo):
        out = fused_graph_attention(x, mask, wq, bq, wo, bo, 8,
                                    r_blk=r_blk, compute_dtype=jnp.float32,
                                    interpret=True)
        return jnp.sum(out * jnp.cos(out * 0.1))

    def loss_ref(x, wq, bq, wo, bo):
        out = reference_fused_graph_attention(x, mask, wq, bq, wo, bo, 8)
        return jnp.sum(out * jnp.cos(out * 0.1))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, w_qkv, b_qkv, w_out, b_out)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, w_qkv, b_qkv, w_out, b_out)
    for got, ref, name in zip(g_fused, g_ref,
                              ("dx", "dWqkv", "dbqkv", "dWo", "dbo")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-3,
            rtol=1e-3, err_msg=name)


def test_fused_backward_value_and_grad_jit():
    """value_and_grad through the fused op under jit (the PPO-update path)."""
    x, mask, w_qkv, b_qkv, w_out, b_out = _fused_inputs(16, 20, seed=11)

    @jax.jit
    def f(x):
        out = fused_graph_attention(x, mask, w_qkv, b_qkv, w_out, b_out, 8,
                                    compute_dtype=jnp.float32,
                                    interpret=True)
        return jnp.mean(out ** 2)

    val, grad = jax.value_and_grad(f)(x)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    ref_val = jnp.mean(reference_fused_graph_attention(
        x, mask, w_qkv, b_qkv, w_out, b_out, 8) ** 2)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-4)


def test_pallas_scope_rollout_param_tree_consistent():
    """pallas_scope='rollout' swaps evaluate_actions to the einsum path;
    the param tree must be identical so one set of weights serves both."""
    import dataclasses
    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.models import policy as policy_mod

    cfg = gst_config(human_num=4)
    net = cfg.network
    cfg = cfg.replace(network=net.__class__(
        **{**net.__dict__, "use_pallas_attention": True,
           "pallas_dtype": "float32", "pallas_scope": "rollout"}))
    up = policy_mod._update_cfg(cfg)
    assert not up.network.use_pallas_attention
    assert cfg.network.use_pallas_attention
    # scope 'all' leaves the config untouched
    cfg_all = cfg.replace(network=net.__class__(
        **{**net.__dict__, "use_pallas_attention": True,
           "pallas_scope": "all"}))
    assert policy_mod._update_cfg(cfg_all) is cfg_all

    from crowdnav_prediction_attngraph_tpu.models.policy_net import (
        init_hidden)
    import jax, jax.numpy as jnp
    N, A, D = 3, cfg.sim.max_human_num, cfg.spatial_edge_dim
    key = jax.random.key(0)
    obs = {
        "robot_node": jax.random.normal(key, (N, 7)),
        "temporal_edges": jax.random.normal(key, (N, 2)),
        "spatial_edges": jax.random.normal(key, (N, A, D)),
        "visible_masks": jnp.ones((N, A), bool),
        "detected_human_num": jnp.full((N,), A, jnp.int32),
    }
    p_roll = policy_mod.init_params(cfg, key, obs)
    p_upd = policy_mod.init_params(policy_mod._update_cfg(cfg), key, obs)
    assert jax.tree.structure(p_roll) == jax.tree.structure(p_upd)
    for a, b in zip(jax.tree.leaves(p_roll), jax.tree.leaves(p_upd)):
        assert a.shape == b.shape
