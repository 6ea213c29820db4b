"""Fused-kernel tuning grid (VERDICT r3 #2: make the kernel win at small
rows). Sweeps (r_blk, strip_rows) for fused_graph_attention forward and
forward+backward at rollout-scale and update-scale row counts, against the
XLA einsum path. Prints ms and MFU per cell.

Usage: python scripts/kernel_tune_r4.py [--rows 256 480 1920 7680]
"""

import argparse
import os
import sys
import time

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16


def _time(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+",
                    default=[256, 480, 1920, 7680])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    from crowdnav_prediction_attngraph_tpu.ops.masked_attention import (
        fused_graph_attention, reference_fused_graph_attention)

    A, D, H = 20, 512, 8
    rng = np.random.RandomState(0)
    w_qkv = jnp.asarray(rng.randn(D, 3 * D) / np.sqrt(D), jnp.float32)
    b_qkv = jnp.asarray(rng.randn(3 * D) * 0.01, jnp.float32)
    w_out = jnp.asarray(rng.randn(D, D) / np.sqrt(D), jnp.float32)
    b_out = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)

    for rows in args.rows:
        x = jnp.asarray(rng.randn(rows, A, D) * 0.3, jnp.float32)
        det = rng.randint(1, A + 1, rows)
        mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
        flops = 8 * rows * A * D * D + 4 * rows * A * A * D

        f_ref = jax.jit(lambda x, m: reference_fused_graph_attention(
            x, m, w_qkv, b_qkv, w_out, b_out, H))
        dt = _time(f_ref, x, mask, iters=args.iters)
        g_ref = jax.jit(jax.grad(lambda x, wq, bq, wo, bo: jnp.sum(
            reference_fused_graph_attention(x, mask, wq, bq, wo, bo, H) ** 2),
            argnums=(0, 1, 2, 3, 4)))
        dtb = _time(g_ref, x, w_qkv, b_qkv, w_out, b_out, iters=args.iters)
        print(f"rows={rows:5d} einsum: fwd {dt*1e3:7.3f} ms "
              f"(MFU {flops/dt/PEAK*100:5.1f}%) | fwd+bwd {dtb*1e3:7.3f} ms "
              f"(MFU {3*flops/dtb/PEAK*100:5.1f}%)")

        for r_blk in (32, 64, 128):
            for strip in (2, 4, 8, 16, 32):
                if strip > r_blk or r_blk % strip:
                    continue
                try:
                    f = jax.jit(lambda x, m, r=r_blk, s=strip:
                                fused_graph_attention(
                                    x, m, w_qkv, b_qkv, w_out, b_out, H,
                                    r_blk=r, strip_rows=s))
                    dt = _time(f, x, mask, iters=args.iters)
                    gf = jax.jit(jax.grad(
                        lambda x, wq, bq, wo, bo, r=r_blk, s=strip: jnp.sum(
                            fused_graph_attention(x, mask, wq, bq, wo, bo, H,
                                                  r_blk=r, strip_rows=s) ** 2),
                        argnums=(0, 1, 2, 3, 4)))
                    dtb = _time(gf, x, w_qkv, b_qkv, w_out, b_out,
                                iters=args.iters)
                    print(f"  r_blk={r_blk:3d} strip={strip:2d}: "
                          f"fwd {dt*1e3:7.3f} ms "
                          f"(MFU {flops/dt/PEAK*100:5.1f}%) | "
                          f"fwd+bwd {dtb*1e3:7.3f} ms "
                          f"(MFU {3*flops/dtb/PEAK*100:5.1f}%)")
                except Exception as e:
                    print(f"  r_blk={r_blk:3d} strip={strip:2d}: "
                          f"error {str(e)[:90]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
