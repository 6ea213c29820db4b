"""Cold-compile breakdown (VERDICT r3 #5): time XLA compilation of each
major program against a THROWAWAY compilation cache, so a fresh container
knows exactly where the minutes go and scripts/warm_cache.sh can amortize
them deliberately.

Programs measured (flagship shapes, 256 envs x 30 steps unless noted):
  - fused train_iteration (rollout + GST + GAE + 10-step PPO update)
  - rollout alone
  - ppo_update alone
  - fused attention kernel fwd / fwd+bwd (rows=3840)
  - eval suite chunk (100 cases)

Usage: python scripts/compile_report.py [--envs 256]
"""

import argparse
import os
import sys
import tempfile
import time

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
# throwaway cache: we want COLD numbers
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    args = ap.parse_args()
    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    from crowdnav_prediction_attngraph_tpu.train import load_gst_params
    import dataclasses

    N, T = args.envs, 30
    cfg = gst_config(human_num=20)
    cfg = cfg.replace(ppo=cfg.ppo.__class__(
        num_processes=N, num_steps=T, num_mini_batch=2, ppo_epoch=5))
    cfg = cfg.replace(pred=dataclasses.replace(cfg.pred, matmul_dtype="bf16"))
    gst_params = load_gst_params(cfg, None)

    total = 0.0

    def clock(name, fn):
        nonlocal total
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name:<48} {dt:8.1f} s")
        sys.stdout.flush()

    t0 = time.perf_counter()
    ts = ppo_mod.init_train_state(cfg, jax.random.key(0), gst_params)
    jax.block_until_ready(ts.masks)
    print(f"{'init_train_state (env reset compile)':<48} "
          f"{time.perf_counter() - t0:8.1f} s")

    it = jax.jit(lambda t: ppo_mod.train_iteration(cfg, t, gst_params))
    clock("train_iteration compile", lambda: it.lower(ts).compile())

    ro = jax.jit(lambda t: ppo_mod.rollout(cfg, t, gst_params))
    clock("rollout compile", lambda: ro.lower(ts).compile())

    _, batch = ro(ts)
    up = jax.jit(lambda p, o, b, k: ppo_mod.ppo_update(cfg, p, o, b, k))
    clock("ppo_update compile",
          lambda: up.lower(ts.params, ts.opt_state, batch,
                           jax.random.key(1)).compile())

    from crowdnav_prediction_attngraph_tpu.ops.masked_attention import (
        fused_graph_attention)
    rows, A, D, H = T * (N // 2), 20, 512, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, A, D) * 0.3, jnp.float32)
    det = rng.randint(1, A + 1, rows)
    mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
    wq = jnp.asarray(rng.randn(D, 3 * D) / np.sqrt(D), jnp.float32)
    bq = jnp.zeros(3 * D)
    wo = jnp.asarray(rng.randn(D, D) / np.sqrt(D), jnp.float32)
    bo = jnp.zeros(D)
    f = jax.jit(lambda x: fused_graph_attention(x, mask, wq, bq, wo, bo, H))
    clock("fused kernel fwd compile", lambda: f.lower(x).compile())
    g = jax.jit(jax.grad(lambda x: jnp.sum(
        fused_graph_attention(x, mask, wq, bq, wo, bo, H) ** 2)))
    clock("fused kernel fwd+bwd compile", lambda: g.lower(x).compile())

    print(f"{'TOTAL (jit programs)':<48} {total:8.1f} s")


if __name__ == "__main__":
    main()
