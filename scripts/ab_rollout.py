"""In-context rollout A/B: time a 30-step lax.scan of the fused env step
(policy act + env core + GST pretext) as ONE program, toggling
  - the GST predictor's matmul dtype (f32 vs bf16)
so the comparison is free of the ~1.3 ms per-dispatch floor that pollutes
single-call timings on this tunneled TPU.

Usage: python scripts/ab_rollout.py [--envs 256] [--iters 30]
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


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    from crowdnav_prediction_attngraph_tpu.train import load_gst_params

    N, T = args.envs, args.steps
    base = gst_config(human_num=20)
    base = base.replace(ppo=base.ppo.__class__(
        num_processes=N, num_steps=T, num_mini_batch=2, ppo_epoch=5))
    gst_params = load_gst_params(base, None)

    import dataclasses
    for label, dtype in (("f32 ", "f32"), ("bf16", "bf16")):
        cfg = base.replace(pred=dataclasses.replace(base.pred,
                                                    matmul_dtype=dtype))
        ts = ppo_mod.init_train_state(cfg, jax.random.key(0), gst_params)
        ro = jax.jit(lambda t, c=cfg: ppo_mod.rollout(c, t, gst_params))
        ts2, batch = ro(ts)
        jax.block_until_ready(batch.rewards)
        ms = timeit(ro, ts, iters=args.iters)
        print(f"rollout {T} steps x {N} envs, GST {label}: {ms:8.2f} ms "
              f"({N * T / ms * 1e3:,.0f} env-steps/s rollout-only)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
