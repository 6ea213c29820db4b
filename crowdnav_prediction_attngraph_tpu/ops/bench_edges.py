"""edges/s benchmark for the interaction-graph attention encoder.

Measures the BASELINE.json north-star kernel metric in three forms:
  1. dense einsum path (XLA-fused) — single device
  2. Pallas packed kernel — single device (TPU)
  3. edge-partitioned ring attention — weak scaling over an n-device mesh
     (each device adds A_base agents; efficiency = edges/s(n) / (n * edges/s(1)))

Usage:
  python -m crowdnav_prediction_attngraph_tpu.ops.bench_edges            # device bench
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m crowdnav_prediction_attngraph_tpu.ops.bench_edges --weak-scaling
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax

# honor JAX_PLATFORMS despite the container's pre-registered axon TPU plugin
# (whose registration otherwise wins over the env var) — without this the
# --weak-scaling virtual-mesh run silently sees 1 TPU device and stops at n=1
_want = os.environ.get("JAX_PLATFORMS")
if _want and "axon" not in _want:
    jax.config.update("jax_platforms", _want)

import jax.numpy as jnp


def _inputs(rows, A, D, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(rows, A, D), jnp.float32)
    det = rng.randint(1, A + 1, rows)
    mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
    return mk(), mk(), mk(), mask


def _time(f, args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def single_device(rows=4096, A=20, D=512, H=8):
    from .masked_attention import (packed_masked_attention,
                                   reference_masked_attention)
    q, k, v, mask = _inputs(rows, A, D)
    edges = rows * A * A
    res = {}
    f_ref = jax.jit(lambda *a: reference_masked_attention(*a, H))
    dt = _time(f_ref, (q, k, v, mask))
    res["einsum"] = edges / dt
    try:
        f_pal = jax.jit(lambda *a: packed_masked_attention(*a, H))
        dt = _time(f_pal, (q, k, v, mask))
        res["pallas"] = edges / dt
    except Exception as e:  # pallas unsupported on this backend
        res["pallas_error"] = str(e)[:120]
    return res


def fused_sweep(rows_list=(480, 1920, 7680), A=20, D=512, H=8,
                strips=(1, 2, 4, 8, 16, 32), iters=20):
    """Tuning sweep for the fused QKV+MHA+out-proj kernel: logits strip size
    vs the XLA einsum path at flagship shapes. Run on the real chip to pick
    the production default (_pick_strip)."""
    from .masked_attention import (fused_graph_attention,
                                   reference_fused_graph_attention)
    rng = np.random.RandomState(0)
    w_qkv = jnp.asarray(rng.randn(D, 3 * D) / np.sqrt(D), jnp.float32)
    b_qkv = jnp.asarray(rng.randn(3 * D) * 0.01, jnp.float32)
    w_out = jnp.asarray(rng.randn(D, D) / np.sqrt(D), jnp.float32)
    b_out = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)
    out = {}
    for rows in rows_list:
        x = jnp.asarray(rng.randn(rows, A, D) * 0.3, jnp.float32)
        det = rng.randint(1, A + 1, rows)
        mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
        row = {}
        f_ref = jax.jit(lambda x, m: reference_fused_graph_attention(
            x, m, w_qkv, b_qkv, w_out, b_out, H))
        row["einsum_ms"] = _time(f_ref, (x, mask), iters=iters) * 1e3
        for g in strips:
            try:
                f = jax.jit(lambda x, m, g=g: fused_graph_attention(
                    x, m, w_qkv, b_qkv, w_out, b_out, H, strip_rows=g))
                row[f"strip{g}_ms"] = _time(f, (x, mask), iters=iters) * 1e3
            except Exception as e:
                row[f"strip{g}_ms"] = f"error: {str(e)[:80]}"
        out[rows] = row
    return out


def weak_scaling(rows=256, A_base=16, D=256, H=8, max_dev=None):
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh
    from ..parallel.edge_partition import edge_partitioned_attention

    n_avail = len(jax.devices())
    results = {}
    base_rate = None
    n = 1
    while n <= (max_dev or n_avail):
        A = A_base * n
        q, k, v, mask = _inputs(rows, A, D)
        dev = mesh_utils.create_device_mesh((n,), devices=jax.devices()[:n])
        mesh = Mesh(dev, ("tp",))
        with mesh:
            f = jax.jit(lambda *a: edge_partitioned_attention(*a, H, mesh))
            dt = _time(f, (q, k, v, mask), iters=10)
        rate = rows * A * A / dt
        if base_rate is None:
            base_rate = rate
        results[n] = {"edges_per_s": rate,
                      "efficiency": rate / (n * base_rate) * n
                      if n == 1 else rate / (base_rate * n)}
        n *= 2
    return results


def weak_scaling_train(envs_per_dev=8, num_steps=8, max_dev=None):
    """dp weak scaling of the FULL sharded train_iteration (rollout with the
    fused GST predictor + GAE + PPO update) at fixed per-device env count —
    the curve a real multi-chip slice will be asked for (VERDICT r3 #7).
    Metric: env-steps/s; efficiency = rate(n) / (n * rate(1))."""
    from jax.sharding import Mesh
    from jax.experimental import mesh_utils
    from ..config import gst_config
    from ..parallel import train_step
    from ..models.gst.st_model import STModel

    n_avail = len(jax.devices())
    results = {}
    base_rate = None
    n = 1
    while n <= (max_dev or n_avail):
        num_envs = envs_per_dev * n
        cfg = gst_config(human_num=20)
        cfg = cfg.replace(ppo=cfg.ppo.__class__(
            num_processes=num_envs, num_steps=num_steps, num_mini_batch=2,
            ppo_epoch=1))
        L, A = cfg.pred.obs_seq_len, cfg.sim.max_human_num
        gst_params = STModel(cfg.pred).init(
            jax.random.key(0), jnp.zeros((1, L, A, 2)),
            jnp.zeros((1, L, A, A, 2)), jnp.ones((1, L, A, A)),
            jnp.ones((1, A, L + cfg.pred.pred_seq_len)), 0.03, True, False)
        dev = mesh_utils.create_device_mesh((n, 1),
                                            devices=jax.devices()[:n])
        mesh = Mesh(dev, ("dp", "tp"))
        with mesh:
            ts = train_step.init_sharded(cfg, jax.random.key(0), mesh,
                                         gst_params)
            it = train_step.make_sharded_iteration(cfg, mesh, gst_params)
            ts, m = it(ts)
            jax.block_until_ready(m["value_loss"])
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                ts, m = it(ts)
            jax.block_until_ready(m["value_loss"])
            dt = (time.perf_counter() - t0) / iters
        rate = num_envs * num_steps / dt
        if base_rate is None:
            base_rate = rate
        results[n] = {"env_steps_per_s": rate,
                      "efficiency": rate / (base_rate * n)}
        n *= 2
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weak-scaling", action="store_true")
    p.add_argument("--weak-scaling-train", action="store_true",
                   help="dp weak scaling of the full sharded train step")
    p.add_argument("--sweep", action="store_true",
                   help="fused-kernel logits-strip tuning sweep")
    args = p.parse_args()
    if args.weak_scaling_train:
        res = weak_scaling_train()
        for n, r in res.items():
            print(f"n={n}: {r['env_steps_per_s']:.1f} env-steps/s, "
                  f"efficiency {r['efficiency']*100:.1f}%")
        return
    if args.sweep:
        for rows, row in fused_sweep().items():
            parts = []
            for k, v in row.items():
                parts.append(f"{k} {v:.3f}" if isinstance(v, float) else
                             f"{k} {v}")
            print(f"rows={rows}: " + " | ".join(parts))
        return
    if args.weak_scaling:
        res = weak_scaling()
        for n, r in res.items():
            print(f"n={n}: {r['edges_per_s']/1e9:.3f} G edges/s, "
                  f"efficiency {r['efficiency']*100:.1f}%")
    else:
        res = single_device()
        for k, v in res.items():
            if isinstance(v, float):
                print(f"{k}: {v/1e9:.3f} G edges/s")
            else:
                print(f"{k}: {v}")


if __name__ == "__main__":
    main()
