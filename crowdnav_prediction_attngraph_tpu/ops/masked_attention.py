"""Pallas TPU kernel: fused masked multi-head attention over interaction
graphs.

The hot op of the attn-graph encoder (SpatialEdgeSelfAttn,
selfAttn_srnn_temp_node.py:63-91): every env-timestep row attends over its
padded set of A humans. A is small (<= ~32), so a naive batched attention
runs tiny (A x hd) matmuls that underfill the 128x128 MXU. This kernel PACKS
a block of R rows into one (R*A_pad, hd) tile per head, computes a single
(R*A_pad, R*A_pad) logits tile on the MXU, and applies a block-diagonal mask
(row r attends only within row r) fused with the key-padding mask, softmax,
and the value matmul — one VMEM-resident pass, no HBM round-trips between
sub-ops.

This is the kernel behind the BASELINE.json "edges/s" metric: one call
processes rows * A * A edges per layer.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, a_pad: int,
                 r_blk: int, hd: int, scale: float):
    # refs: q/k/v (r_blk, a_pad, C) — C = lane-aligned group of heads
    # (C // hd heads per kernel call); mask (1, 8, n)
    n = r_blk * a_pad
    C = q_ref.shape[-1]
    q = q_ref[:].reshape(n, C).astype(jnp.float32) * scale
    k = k_ref[:].reshape(n, C).astype(jnp.float32)
    v = v_ref[:].reshape(n, C).astype(jnp.float32)

    # block-diagonal mask: token i may attend token j iff same packed row
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // a_pad
    row_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // a_pad
    same_row = row_i == row_j
    key_valid = mask_ref[0, 0:1, :]                            # (1, n)
    ok = same_row & (key_valid > 0)

    outs = []
    for h in range(C // hd):
        qh = q[:, h * hd:(h + 1) * hd]
        kh = k[:, h * hd:(h + 1) * hd]
        vh = v[:, h * hd:(h + 1) * hd]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)  # (n, n)
        s = jnp.where(ok, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
    o_ref[:] = jnp.concatenate(outs, axis=-1).reshape(r_blk, a_pad, C)


def packed_masked_attention(q, k, v, mask, num_heads: int,
                            r_blk: int = 8, interpret: bool = False):
    """q, k, v: (rows, A, D); mask: (rows, A) bool (True = valid key).
    Returns (rows, A, D) == softmax(q k^T / sqrt(hd) + mask) v per head.

    Rows with zero valid keys produce uniform-over-row attention (the caller
    guarantees detected_human_num >= 1, crowd_sim_var_num.py:271-272)."""
    rows, A, D = q.shape
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)

    # pad A so each packed block is lane-aligned (r_blk * a_pad % 256 == 0)
    a_pad = max(32, ((A + 31) // 32) * 32)
    rows_pad = ((rows + r_blk - 1) // r_blk) * r_blk

    def pad_qkv(x):
        # keep the natural (rows, A, heads*hd) layout — the grid's head axis
        # slices the feature dim via the index map; no host transpose
        return jnp.pad(x, ((0, rows_pad - rows), (0, a_pad - A), (0, 0)))

    qh, kh, vh = pad_qkv(q), pad_qkv(k), pad_qkv(v)
    n = r_blk * a_pad
    num_blocks = rows_pad // r_blk
    mask_p = jnp.pad(mask.astype(jnp.int32),
                     ((0, rows_pad - rows), (0, a_pad - A)))
    mask_p = jnp.broadcast_to(mask_p.reshape(num_blocks, 1, n),
                              (num_blocks, 8, n))

    # group heads so the feature block is lane-aligned (>= 128)
    heads_per_call = max(1, 128 // hd) if hd < 128 else 1
    C = heads_per_call * hd
    grid = (num_heads // heads_per_call, num_blocks)
    qkv_spec = pl.BlockSpec((r_blk, a_pad, C), lambda h, r: (r, 0, h),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, a_pad=a_pad, r_blk=r_blk, hd=hd,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((rows_pad, a_pad, D), jnp.float32),
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, 8, n), lambda h, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk, a_pad, C), lambda h, r: (r, 0, h),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qh, kh, vh, mask_p)

    return out[:rows, :A]


def reference_masked_attention(q, k, v, mask, num_heads: int):
    """einsum reference path (identical math, XLA-fused)."""
    rows, A, D = q.shape
    hd = D // num_heads
    qh = q.reshape(rows, A, num_heads, hd)
    kh = k.reshape(rows, A, num_heads, hd)
    vh = v.reshape(rows, A, num_heads, hd)
    logits = jnp.einsum("rqhd,rkhd->rhqk", qh, kh) / math.sqrt(hd)
    logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("rhqk,rkhd->rqhd", w, vh).reshape(rows, A, D)
