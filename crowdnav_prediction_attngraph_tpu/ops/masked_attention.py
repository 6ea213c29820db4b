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

import os


def _bwd_compiler_params():
    """Raised scoped-VMEM cap for the BACKWARD kernel only.

    Round-5 measurements (results/logs/r5_tune_*.log): granting the kernel
    more VMEM (vmem_limit_bytes) lets backward strips of 320-640 tokens
    compile (the r4 'HTTP 500' wall), but none of them beat the 160-token
    default — and applying the same raised cap to the FORWARD costs ~8%
    (602 -> 557 Me/s at rows=1920), so the forward keeps the compiler
    default. r_blk=64 dies in the remote compile helper with 'exit signal'
    regardless of any VMEM flag — a toolchain robustness wall, not a
    budget. Override via PALLAS_BWD_VMEM_LIMIT_MB (0 = compiler default)."""
    mb = int(os.environ.get("PALLAS_BWD_VMEM_LIMIT_MB", "100"))
    if mb <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, a_pad: int,
                 r_blk: int, hd: int, scale: float, strip_rows: int):
    # refs: q/k/v (r_blk, a_pad, C) — C = lane-aligned group of heads
    # (C // hd heads per kernel call); mask (1, 8, n)
    n = r_blk * a_pad
    C = q_ref.shape[-1]
    q = q_ref[:].reshape(n, C).astype(jnp.float32) * scale
    k = k_ref[:].reshape(n, C).astype(jnp.float32)
    v = v_ref[:].reshape(n, C).astype(jnp.float32)

    # block-diagonal attention sub-tiled into whole-row strips (see
    # _fused_kernel): only the (m, m) diagonal strips of the (n, n) logits
    # are materialized — token i attends token j iff same packed row
    g = strip_rows
    num_strips = r_blk // g
    m = g * a_pad
    row_i = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // a_pad
    row_j = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // a_pad
    same_row = row_i == row_j
    key_valid = mask_ref[0, 0:1, :]                            # (1, n)

    strips = []
    for s_i in range(num_strips):
        lo = s_i * m
        ok = same_row & (key_valid[:, lo:lo + m] > 0)
        bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
        outs = []
        for h in range(C // hd):
            qh = q[lo:lo + m, h * hd:(h + 1) * hd]
            kh = k[lo:lo + m, h * hd:(h + 1) * hd]
            vh = v[lo:lo + m, h * hd:(h + 1) * hd]
            s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
            s = s + bias
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
        strips.append(jnp.concatenate(outs, axis=-1))
    o_ref[:] = jnp.concatenate(strips, axis=0).reshape(r_blk, a_pad, C)


def packed_masked_attention(q, k, v, mask, num_heads: int,
                            r_blk: int = 8, strip_rows: int | None = None,
                            interpret: bool = False):
    """q, k, v: (rows, A, D); mask: (rows, A) bool (True = valid key).
    Returns (rows, A, D) == softmax(q k^T / sqrt(hd) + mask) v per head.

    Rows with zero valid keys produce uniform-over-row attention (the caller
    guarantees detected_human_num >= 1, crowd_sim_var_num.py:271-272)."""
    rows, A, D = q.shape
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)

    # pad A so each packed block is lane-aligned (r_blk * a_pad % 256 == 0)
    a_pad = max(32, ((A + 31) // 32) * 32)
    if strip_rows is None:
        strip_rows = _pick_strip(r_blk, a_pad)
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
                          scale=scale, strip_rows=strip_rows),
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


def _pick_packing(A: int, r_blk_hint: int | None = None,
                  max_tokens: int = 1024) -> tuple[int, int]:
    """Choose (r_blk, a_pad) so the packed token count n = r_blk * a_pad is
    lane-aligned (multiple of 128) with minimal padding waste.

    For the flagship A=20 this returns (32, 20): n=640, ZERO padded tokens —
    every projection FLOP is useful (the previous scheme padded 20 -> 32,
    wasting 37% of the dominant QKV/out-proj matmul work).

    With an explicit ``r_blk_hint`` (caller pinned the row-block size) only
    the agent padding is searched, preserving the n % 128 lane-alignment
    invariant of the mask BlockSpec — previously the hint was ignored and a
    pinned r_blk could yield a misaligned n on the compiled TPU path."""
    r_blks = (64, 32, 16, 8) if r_blk_hint is None else (r_blk_hint,)
    best = None
    for a_pad in range(A, A + 128):
        for r_blk in r_blks:
            n = r_blk * a_pad
            if n % 128 == 0 and n <= max_tokens:
                waste = (a_pad - A) * r_blk
                if best is None or waste < best[0] or \
                        (waste == best[0] and r_blk > best[1]):
                    best = (waste, r_blk, a_pad)
    if best is None:  # tiny fallback: lane-pad the agent axis
        a_pad = ((A + 127) // 128) * 128
        return (r_blk_hint or 8), a_pad
    return best[1], best[2]


def _fused_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref,
                  *, a_pad: int, r_blk: int, hd: int, num_heads: int,
                  scale: float, compute_dtype, strip_rows: int):
    """x (n, D) packed tokens -> QKV projection -> block-diagonal masked MHA
    -> out projection, one VMEM-resident pass. Weights stay resident across
    grid steps (constant index maps).

    The logits tile is SUB-TILED: attention is block-diagonal (a token only
    attends within its own packed row of a_pad agents), so a full (n, n)
    logits tile computes r_blk-1 garbage blocks per useful one and its
    softmax is pure wasted VPU work. Instead the r_blk packed rows are cut
    into strips of `strip_rows` whole rows (m = strip_rows * a_pad tokens)
    and only the (m, m) diagonal strips are materialized: VPU softmax work
    drops by r_blk/strip_rows while every useful logit is still computed."""
    n = r_blk * a_pad
    D = x_ref.shape[-1]
    x = x_ref[:].astype(compute_dtype)
    wqkv = wqkv_ref[:].astype(compute_dtype)
    qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.float32) \
        + bqkv_ref[0]                                           # (n, 3D) f32
    q = qkv[:, :D] * scale
    k = qkv[:, D:2 * D]
    v = qkv[:, 2 * D:]

    g = strip_rows
    num_strips = r_blk // g
    m = g * a_pad
    # block-diagonal mask within one strip — identical for every strip since
    # strips contain whole packed rows
    row_i = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // a_pad
    row_j = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // a_pad
    same_row = row_i == row_j
    key_valid = mask_ref[0, 0:1, :]                             # (1, n)

    strips = []
    for s_i in range(num_strips):
        lo = s_i * m
        ok = same_row & (key_valid[:, lo:lo + m] > 0)
        bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)  # (m, m)
        outs = []
        for h in range(num_heads):
            qh = q[lo:lo + m, h * hd:(h + 1) * hd].astype(compute_dtype)
            kh = k[lo:lo + m, h * hd:(h + 1) * hd].astype(compute_dtype)
            vh = v[lo:lo + m, h * hd:(h + 1) * hd].astype(compute_dtype)
            s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
            s = s + bias
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jnp.dot(p.astype(compute_dtype), vh,
                                preferred_element_type=jnp.float32))
        strips.append(jnp.concatenate(outs, axis=-1))
    attn = jnp.concatenate(strips, axis=0).astype(compute_dtype)  # (n, D)
    out = jnp.dot(attn, wo_ref[:].astype(compute_dtype),
                  preferred_element_type=jnp.float32) + bo_ref[0]
    o_ref[:] = out


def _pick_strip(r_blk: int, a_pad: int) -> int:
    """Largest whole-row strip (divisor of r_blk) whose token count stays at
    or under one VPU lane group of 128 — bigger strips re-grow the garbage
    off-diagonal logits, smaller ones shrink the per-strip matmuls below
    MXU-useful sizes. A=20 -> strips of 4 rows / 80 tokens: 8x less softmax
    VPU work than the full 640-token tile."""
    best = 1
    for g in range(1, r_blk + 1):
        if r_blk % g == 0 and g * a_pad <= 128:
            best = g
    return best


def _pick_bwd_strip(r_blk: int, a_pad: int) -> int:
    """Backward strip default: the bwd's per-strip projection-sized matmuls
    (dattn, dx, dW) dominate, so larger strips win there — r4 measured
    m=160 > m=80 (10.7 vs 11.4 ms fwd+bwd at rows=3840); r5, with the
    backward's raised scoped-VMEM cap (_bwd_compiler_params), m=320
    compiles and edges out m=160 (156.1 vs 151.5 Me/s fwd+bwd at
    rows=1920, results/logs/r5_tune_c.log). m=640 regresses (137 Me/s),
    hence the 320-token cap."""
    best = 1
    for g in range(1, r_blk + 1):
        if r_blk % g == 0 and g * a_pad <= 320:
            best = g
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_diffable(x, mask, w_qkv, b_qkv, w_out, b_out, static):
    """custom_vjp wrapper: pallas_call has no automatic autodiff rule, but
    the PPO update differentiates through the policy's attention. Forward
    runs the fused kernel; backward runs the fused Pallas BACKWARD kernel
    (_fused_backward): flash-style recompute of the block-diagonal softmax
    plus all five gradients (dx, dW_qkv, db_qkv, dW_out, db_out) in one
    VMEM-resident pass, with the weight gradients accumulated across grid
    steps. Gradients are gradients OF THE EXECUTED forward (same compute
    dtype), unlike the round-2 scheme that rematerialized the f32 XLA
    reference and cost a full extra forward per gradient step."""
    nh, r_blk, cd, strip, _bwd_strip, interp = static
    return _fused_forward(x, mask, w_qkv, b_qkv, w_out, b_out,
                          nh, r_blk, cd, strip, interp)


def _fused_diffable_fwd(x, mask, w_qkv, b_qkv, w_out, b_out, static):
    nh, r_blk, cd, strip, _bwd_strip, interp = static
    out = _fused_forward(x, mask, w_qkv, b_qkv, w_out, b_out,
                         nh, r_blk, cd, strip, interp)
    return out, (x, mask, w_qkv, b_qkv, w_out, b_out)


def _fused_diffable_bwd(static, res, g):
    x, mask, w_qkv, b_qkv, w_out, b_out = res
    nh, r_blk, cd, strip, bwd_strip, interp = static
    grads = _fused_backward(x, mask, w_qkv, b_qkv, w_out, b_out, g,
                            nh, r_blk, cd, bwd_strip, interp)
    dx, dwq, dbq, dwo, dbo = grads
    import numpy as _np
    dmask = _np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dx, dmask, dwq, dbq, dwo, dbo


_fused_diffable.defvjp(_fused_diffable_fwd, _fused_diffable_bwd)


def _bwd_kernel(x_ref, mask_ref, g_ref, wqkv_ref, wo_ref, bqkv_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                *, a_pad: int, r_blk: int, hd: int, num_heads: int,
                scale: float, compute_dtype, strip_rows: int):
    """Backward of _fused_kernel for one block of n = r_blk * a_pad packed
    tokens: recompute QKV + the block-diagonal softmax (flash-style remat —
    cheaper than saving the (m, m) probabilities to HBM), then produce
    dx for this block and accumulate the weight/bias gradients across grid
    steps into constant-index-map output blocks (sequential TPU grid).

    VMEM discipline: attention math is computed PER STRIP of m =
    strip_rows * a_pad tokens — attention is block-diagonal, so strip s
    only ever needs tokens [s*m, (s+1)*m) of qkv/g/dqkv. The QKV recompute
    itself is hoisted to ONE block-level matmul stored in the compute dtype
    (n, 3D bf16 = 2 MB at n=640): splitting it 8 ways per strip cost ~8
    small-matmul issues per block, while an f32 full-block qkv + dqkv pair
    blew the 16 MB scoped-vmem limit by 3.7 MB (r3). dqkv stays per-strip.
    x and the weights arrive pre-cast to the compute dtype from the
    wrapper. Numerics note: q/k/v used in the recompute round through the
    compute dtype once more than the forward did (stored vs cast-at-use);
    at bf16 this is below the kernel's existing grad tolerance
    (tests/test_pallas_attention.py)."""
    D = x_ref.shape[-1]
    cd = compute_dtype
    wqkv = wqkv_ref[:]                                  # (D, 3D) cd
    wo = wo_ref[:]                                      # (D, D) cd
    bqkv = bqkv_ref[0]                                  # (3D,) f32

    # one block-level QKV recompute, resident in the compute dtype — but
    # ONLY at bf16: a full-block f32 qkv is ~3.9 MB at n=640/D=512, the very
    # buffer that blew the 16 MB scoped-VMEM budget in r3 (ADVICE r4
    # medium). The f32 strict-parity path recomputes qkv per strip instead.
    if cd != jnp.float32:
        qkv_all = (jnp.dot(x_ref[:], wqkv,
                           preferred_element_type=jnp.float32)
                   + bqkv).astype(cd)                   # (n, 3D) cd
    else:
        qkv_all = None

    gmask = strip_rows
    num_strips = r_blk // gmask
    m = gmask * a_pad
    row_i = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // a_pad
    row_j = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // a_pad
    same_row = row_i == row_j
    key_valid = mask_ref[0, 0:1, :]                              # (1, n)

    # accumulate straight into the constant-index-map output refs — a
    # kernel-local (D, 3D) accumulator would double the largest buffer and
    # blow the 16 MB scoped-vmem budget again
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    for s_i in range(num_strips):
        lo = s_i * m
        xs = x_ref[lo:lo + m, :]                        # (m, D) cd
        gs = g_ref[lo:lo + m, :]                        # (m, D) f32
        if qkv_all is not None:
            qkv = qkv_all[lo:lo + m, :]                 # (m, 3D) cd
        else:  # f32: per-strip recompute keeps VMEM bounded
            qkv = (jnp.dot(xs, wqkv, preferred_element_type=jnp.float32)
                   + bqkv).astype(cd)
        q = qkv[:, :D]
        k = qkv[:, D:2 * D]
        v = qkv[:, 2 * D:]
        dattn = jnp.dot(gs.astype(cd), wo.T,
                        preferred_element_type=jnp.float32)      # (m, D)

        ok = same_row & (key_valid[:, lo:lo + m] > 0)
        bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
        a_heads, dq_heads, dk_heads, dv_heads = [], [], [], []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            qh = (q[:, sl] * cd(scale)).astype(cd)
            kh = k[:, sl]
            vh = v[:, sl]
            s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
            s = s + bias
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)           # (m, m) f32
            pc = p.astype(cd)
            a_heads.append(jnp.dot(pc, vh,
                                   preferred_element_type=jnp.float32))
            da = dattn[:, sl].astype(cd)                         # (m, hd)
            dv_heads.append(jnp.dot(pc.T, da,
                                    preferred_element_type=jnp.float32))
            dp = jnp.dot(da, vh.T, preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsc = ds.astype(cd)
            # q was pre-scaled: s = (q*scale) k^T, so d(qkv_q) gets *scale
            dq_heads.append(jnp.dot(dsc, kh,
                                    preferred_element_type=jnp.float32)
                            * scale)
            dk_heads.append(jnp.dot(dsc.T, qh,
                                    preferred_element_type=jnp.float32))
        attn_s = jnp.concatenate(a_heads, axis=-1).astype(cd)    # (m, D)
        dqkv_s = jnp.concatenate(
            [jnp.concatenate(dq_heads, axis=-1),
             jnp.concatenate(dk_heads, axis=-1),
             jnp.concatenate(dv_heads, axis=-1)], axis=1)        # (m, 3D)

        dx_ref[lo:lo + m, :] = jnp.dot(dqkv_s.astype(cd), wqkv.T,
                                       preferred_element_type=jnp.float32)
        dwqkv_ref[:] += jnp.dot(xs.T, dqkv_s.astype(cd),
                                preferred_element_type=jnp.float32)
        dbqkv_ref[:] += jnp.sum(dqkv_s, axis=0, keepdims=True)
        dwo_ref[:] += jnp.dot(attn_s.T, gs.astype(cd),
                              preferred_element_type=jnp.float32)
        dbo_ref[:] += jnp.sum(gs, axis=0, keepdims=True)


def _fused_backward(x, mask, w_qkv, b_qkv, w_out, b_out, g,
                    num_heads: int, r_blk: int | None = None,
                    compute_dtype="bf16",
                    strip_rows: int | None = None,
                    interpret: bool = False):
    """Packed backward pass matching _fused_forward's blocking. Returns
    (dx, dW_qkv, db_qkv, dW_out, db_out)."""
    if isinstance(compute_dtype, str):
        compute_dtype = jnp.bfloat16 if compute_dtype == "bf16" \
            else jnp.float32
    rows, A, D = x.shape
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)

    if r_blk is None:
        r_blk, a_pad = _pick_packing(A)
    else:
        _, a_pad = _pick_packing(A, r_blk)
    if strip_rows is None:
        # f32 doubles every per-strip temporary, so cap it at the forward's
        # 128-token strip rather than the 160-token bf16 optimum
        strip_rows = _pick_strip(r_blk, a_pad) \
            if compute_dtype == jnp.float32 else _pick_bwd_strip(r_blk, a_pad)
    rows_pad = ((rows + r_blk - 1) // r_blk) * r_blk
    n = r_blk * a_pad
    num_blocks = rows_pad // r_blk

    # x and weights pre-cast to the compute dtype so their VMEM blocks are
    # half-width and the kernel does no in-VMEM conversion copies
    xp = jnp.pad(x, ((0, rows_pad - rows), (0, a_pad - A), (0, 0)))
    xp = xp.reshape(rows_pad * a_pad, D).astype(compute_dtype)
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, rows_pad - rows), (0, a_pad - A), (0, 0)))
    gp = gp.reshape(rows_pad * a_pad, D)
    mask_p = jnp.pad(mask.astype(jnp.int32),
                     ((0, rows_pad - rows), (0, a_pad - A)))
    mask_p = jnp.broadcast_to(mask_p.reshape(num_blocks, 1, n),
                              (num_blocks, 8, n))
    wqkv_c = w_qkv.astype(compute_dtype)
    wo_c = w_out.astype(compute_dtype)

    full = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((rows_pad * a_pad, D), jnp.float32),   # dx
        jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),              # dWqkv
        jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),              # dbqkv
        jax.ShapeDtypeStruct((D, D), jnp.float32),                  # dWo
        jax.ShapeDtypeStruct((1, D), jnp.float32),                  # dbo
    )
    dx, dwq, dbq, dwo, dbo = pl.pallas_call(
        functools.partial(_bwd_kernel, a_pad=a_pad, r_blk=r_blk, hd=hd,
                          num_heads=num_heads, scale=scale,
                          compute_dtype=compute_dtype,
                          strip_rows=strip_rows),
        out_shape=out_shapes,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((n, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            full((D, 3 * D)),
            full((D, D)),
            full((1, 3 * D)),
        ],
        out_specs=(
            pl.BlockSpec((n, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            full((D, 3 * D)),
            full((1, 3 * D)),
            full((D, D)),
            full((1, D)),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _bwd_compiler_params(),
    )(xp, mask_p, gp, wqkv_c, wo_c, b_qkv.reshape(1, -1))

    dx = dx.reshape(rows_pad, a_pad, D)[:rows, :A]
    return dx, dwq, dbq.reshape(-1), dwo, dbo.reshape(-1)


def fused_graph_attention(x, mask, w_qkv, b_qkv, w_out, b_out,
                          num_heads: int, r_blk: int | None = None,
                          compute_dtype=jnp.bfloat16,
                          strip_rows: int | None = None,
                          bwd_strip_rows: int | None = None,
                          interpret: bool = False):
    """Differentiable entry point — see _fused_forward for the kernel and
    _fused_diffable for the VJP story. ``bwd_strip_rows`` lets the backward
    kernel use a larger strip than the forward: the bwd's per-strip
    projection-sized matmuls (qkv recompute, dx, dW) dominate its time, so
    fewer/larger strips win there while the forward's optimum stays small.
    When ``bwd_strip_rows`` is None an explicit ``strip_rows`` applies to
    BOTH passes (the pre-r4 semantics, so strip sweeps tune the backward
    too); with both None each pass picks its own default (_pick_strip /
    _pick_bwd_strip)."""
    static = (num_heads, r_blk,
              "bf16" if compute_dtype == jnp.bfloat16 else "f32",
              strip_rows,
              bwd_strip_rows if bwd_strip_rows is not None else strip_rows,
              interpret)
    return _fused_diffable(x, mask, w_qkv, b_qkv, w_out, b_out, static)


def _fused_forward(x, mask, w_qkv, b_qkv, w_out, b_out,
                   num_heads: int, r_blk: int | None = None,
                   compute_dtype="bf16",
                   strip_rows: int | None = None,
                   interpret: bool = False):
    """End-to-end fused attention block: x @ W_qkv -> per-row masked MHA ->
    out-projection, in ONE Pallas kernel (no HBM round-trips between sub-ops).

    x: (rows, A, D) embedded inputs; mask: (rows, A) bool (True = valid key);
    w_qkv: (D, 3D); b_qkv: (3D,); w_out: (D, D); b_out: (D,).
    The q/k/v double projection of the reference module
    (selfAttn_srnn_temp_node.py:63-91: Dense then torch-MHA in_proj) folds
    into the single (D, 3D) matrix: W_eff = Wq @ Win_q etc. (two chained
    linears), done host-side by the caller.

    Tokens are packed DENSELY: rows of A agents are flattened to (rows*A, D)
    and blocked so n = r_blk * a_pad is a multiple of 128 with a_pad == A
    whenever possible (A=20 -> 32 rows x 20 agents = 640 tokens, zero
    padding). The projections — which dominate the FLOPs at small A — then
    run at full MXU utilization; only the (n, n) block-diagonal logits tile
    carries slack.

    compute_dtype=bfloat16 runs the matmuls on the MXU at 2x f32 rate with
    f32 accumulation; pass float32 for strict-parity runs.
    """
    if isinstance(compute_dtype, str):
        compute_dtype = jnp.bfloat16 if compute_dtype == "bf16" \
            else jnp.float32
    rows, A, D = x.shape
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)

    if r_blk is None:
        r_blk, a_pad = _pick_packing(A)
    else:
        _, a_pad = _pick_packing(A, r_blk)
    if strip_rows is None:
        strip_rows = _pick_strip(r_blk, a_pad)
    rows_pad = ((rows + r_blk - 1) // r_blk) * r_blk
    n = r_blk * a_pad
    assert n % 128 == 0, \
        f"packed token count {n} = {r_blk} x {a_pad} breaks lane alignment"
    num_blocks = rows_pad // r_blk

    xp = jnp.pad(x, ((0, rows_pad - rows), (0, a_pad - A), (0, 0)))
    xp = xp.reshape(rows_pad * a_pad, D)          # token-major, lane-aligned
    mask_p = jnp.pad(mask.astype(jnp.int32),
                     ((0, rows_pad - rows), (0, a_pad - A)))
    mask_p = jnp.broadcast_to(mask_p.reshape(num_blocks, 1, n),
                              (num_blocks, 8, n))

    full = lambda shape: pl.BlockSpec(shape, lambda r: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, a_pad=a_pad, r_blk=r_blk, hd=hd,
                          num_heads=num_heads, scale=scale,
                          compute_dtype=compute_dtype,
                          strip_rows=strip_rows),
        out_shape=jax.ShapeDtypeStruct((rows_pad * a_pad, D), jnp.float32),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((n, D), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            full((D, 3 * D)),
            full((1, 3 * D)),
            full((D, D)),
            full((1, D)),
        ],
        out_specs=pl.BlockSpec((n, D), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, mask_p, w_qkv, b_qkv.reshape(1, -1), w_out, b_out.reshape(1, -1))

    return out.reshape(rows_pad, a_pad, D)[:rows, :A]


def reference_fused_graph_attention(x, mask, w_qkv, b_qkv, w_out, b_out,
                                    num_heads: int):
    """XLA reference for fused_graph_attention (identical math, f32)."""
    rows, A, D = x.shape
    qkv = x @ w_qkv + b_qkv
    q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
    out = reference_masked_attention(q, k, v, mask, num_heads)
    return out @ w_out + b_out


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
