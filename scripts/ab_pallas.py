"""A/B the fused Pallas attention kernel INSIDE the full train iteration
(VERDICT r2 item 1): measures `train_iteration` wall time at flagship shapes
with use_pallas_attention on vs off, to settle whether the custom_vjp
backward remat (ops/masked_attention.py) costs more than the fused forward
saves inside ppo_update's gradient steps.

Usage: python scripts/ab_pallas.py [--envs 256] [--iters 20]
Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time

import jax

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(cfg, gst_params, iters):
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    ts = ppo_mod.init_train_state(cfg, jax.random.key(0), gst_params)
    it = jax.jit(lambda t: ppo_mod.train_iteration(cfg, t, gst_params))
    t0 = time.perf_counter()
    ts, m = it(ts)
    jax.block_until_ready(m["value_loss"])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        ts, m = it(ts)
        jax.block_until_ready(m["value_loss"])
        times.append(time.perf_counter() - t0)
    return float(np.mean(times)), float(np.std(times)), compile_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--modes", default="on,off",
                   help="comma list from {on,off,rollout_only}")
    args = p.parse_args()

    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.train import load_gst_params
    from crowdnav_prediction_attngraph_tpu.models.gst.st_model import STModel

    cfg0 = gst_config(human_num=20)
    cfg0 = cfg0.replace(ppo=cfg0.ppo.__class__(
        num_processes=args.envs, num_steps=30, num_mini_batch=2, ppo_epoch=5))
    try:
        gst_params = load_gst_params(cfg0, None)
    except Exception:
        L, A = cfg0.pred.obs_seq_len, cfg0.sim.max_human_num
        gst_params = STModel(cfg0.pred).init(
            jax.random.key(0), jnp.zeros((1, L, A, 2)),
            jnp.zeros((1, L, A, A, 2)), jnp.ones((1, L, A, A)),
            jnp.ones((1, A, L + cfg0.pred.pred_seq_len)), 0.03, True, False)

    results = {}
    for mode in args.modes.split(","):
        net = cfg0.network
        if mode == "on":
            cfg = cfg0.replace(network=net.__class__(
                **{**net.__dict__, "use_pallas_attention": True}))
        elif mode == "off":
            cfg = cfg0.replace(network=net.__class__(
                **{**net.__dict__, "use_pallas_attention": False}))
        elif mode == "rollout_only":
            cfg = cfg0.replace(network=net.__class__(
                **{**net.__dict__, "use_pallas_attention": True,
                   "pallas_scope": "rollout"}))
        else:
            raise SystemExit(f"unknown mode {mode}")
        dt, std, comp = measure(cfg, gst_params, args.iters)
        fps = args.envs * 30 / dt
        results[mode] = fps
        print(json.dumps({
            "mode": mode, "envs": args.envs,
            "iter_ms": round(dt * 1e3, 2), "iter_ms_std": round(std * 1e3, 2),
            "env_steps_per_s": round(fps, 1),
            "compile_s": round(comp, 1),
        }), flush=True)
    print(json.dumps({"summary": {k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
