"""Round-5 kernel sweep: raised scoped-VMEM cap + block-level backward.

Sweeps (r_blk, fwd strip_rows, bwd_strip_rows) for fused_graph_attention
with chained in-program measurement (8 applications under one jit — a
standalone call sits on the ~1.3 ms dispatch floor of the tunneled chip).
Also numerically checks each backward cell against the XLA einsum oracle.

Usage: python scripts/kernel_tune_r5.py [--rows 1920 3840] [--chain 8]
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
    ap.add_argument("--rows", type=int, nargs="+", default=[1920, 3840])
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--r-blks", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--fwd-strips", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--bwd-strips", type=int, nargs="+",
                    default=[8, 16, 32, 64])
    args = ap.parse_args()
    from crowdnav_prediction_attngraph_tpu.ops.masked_attention import (
        fused_graph_attention, reference_fused_graph_attention)

    A, D, H = 20, 512, 8
    rng = np.random.RandomState(0)
    wq = jnp.asarray(rng.randn(D, 3 * D) / np.sqrt(D), jnp.float32)
    bq = jnp.asarray(rng.randn(3 * D) * 0.01, jnp.float32)
    wo = jnp.asarray(rng.randn(D, D) / np.sqrt(D), jnp.float32)
    bo = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)

    for rows in args.rows:
        x = jnp.asarray(rng.randn(rows, A, D) * 0.3, jnp.float32)
        det = rng.randint(1, A + 1, rows)
        mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
        edges = rows * A * A * args.chain
        flops = (8 * rows * A * D * D + 4 * rows * A * A * D) * args.chain

        def chained(attn_fn, **kw):
            def run(x, wq, bq, wo, bo):
                def body(c, _):
                    return attn_fn(c * 0.5, mask, wq, bq, wo, bo, H,
                                   **kw), None
                o, _ = jax.lax.scan(body, x, None, length=args.chain)
                return o
            return run

        # einsum oracle timings + reference gradient for numeric checks
        f_ref = jax.jit(lambda x: chained(reference_fused_graph_attention)(
            x, wq, bq, wo, bo))
        dt = _time(f_ref, x, iters=args.iters)
        g_ref = jax.jit(jax.grad(lambda x, wq, bq, wo, bo: jnp.sum(
            chained(reference_fused_graph_attention)(x, wq, bq, wo, bo) ** 2),
            argnums=(0, 1)))
        try:
            dtb = _time(g_ref, x, wq, bq, wo, bo, iters=args.iters)
            gx_ref, gw_ref = jax.tree.map(
                np.asarray, g_ref(x, wq, bq, wo, bo))
            bwd_txt = (f"fwd+bwd {edges/dtb/1e6:7.1f} Me/s "
                       f"(MFU {3*flops/dtb/PEAK*100:5.1f}%)")
        except Exception as e:
            gx_ref = gw_ref = None
            bwd_txt = f"fwd+bwd ERROR {str(e)[:60]}"
        print(f"rows={rows:5d} einsum: fwd {edges/dt/1e6:7.1f} Me/s "
              f"(MFU {flops/dt/PEAK*100:5.1f}%) | {bwd_txt}")
        sys.stdout.flush()

        for r_blk in args.r_blks:
            for strip in args.fwd_strips:
                if strip > r_blk or r_blk % strip:
                    continue
                try:
                    f = jax.jit(lambda x, r=r_blk, s=strip: chained(
                        fused_graph_attention, r_blk=r, strip_rows=s)(
                            x, wq, bq, wo, bo))
                    dt = _time(f, x, iters=args.iters)
                    fwd_txt = (f"fwd {edges/dt/1e6:7.1f} Me/s "
                               f"(MFU {flops/dt/PEAK*100:5.1f}%)")
                except Exception as e:
                    print(f"  r{r_blk:3d}/f{strip:2d}: fwd ERROR "
                          f"{str(e)[:80]}")
                    sys.stdout.flush()
                    continue
                for bwd_strip in args.bwd_strips:
                    if bwd_strip > r_blk or r_blk % bwd_strip:
                        continue
                    try:
                        g = jax.jit(jax.grad(
                            lambda x, wq, bq, wo, bo, r=r_blk, s=strip,
                            b=bwd_strip: jnp.sum(chained(
                                fused_graph_attention, r_blk=r, strip_rows=s,
                                bwd_strip_rows=b)(x, wq, bq, wo, bo) ** 2),
                            argnums=(0, 1)))
                        dtb = _time(g, x, wq, bq, wo, bo, iters=args.iters)
                        err = ""
                        if gx_ref is not None:
                            gx, gw = jax.tree.map(
                                np.asarray, g(x, wq, bq, wo, bo))
                            rel = max(
                                np.abs(gx - gx_ref).max()
                                / (np.abs(gx_ref).max() + 1e-9),
                                np.abs(gw - gw_ref).max()
                                / (np.abs(gw_ref).max() + 1e-9))
                            err = f" relerr {rel:.1e}"
                        print(f"  r{r_blk:3d}/f{strip:2d}/b{bwd_strip:2d}: "
                              f"{fwd_txt} | fwd+bwd {edges/dtb/1e6:7.1f} "
                              f"Me/s (MFU {3*flops/dtb/PEAK*100:5.1f}%)"
                              f"{err}")
                    except Exception as e:
                        print(f"  r{r_blk:3d}/f{strip:2d}/b{bwd_strip:2d}: "
                              f"bwd ERROR {str(e)[:80]}")
                    sys.stdout.flush()


if __name__ == "__main__":
    main()
