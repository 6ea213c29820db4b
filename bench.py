"""Headline benchmark: PPO env-steps/s on the flagship CrowdNav recipe.

Runs the fully fused training iteration (simulator + GST predictor + policy
rollout + GAE + 5x2-minibatch PPO update in ONE XLA program) on the available
accelerator and reports throughput against the reference's 204-206 env-steps/s
(16 processes x 30 steps on the authors' GPU workstation,
trained_models/GST_predictor_rand/progress.csv — see BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 205.0  # BASELINE.md: reference RL training throughput


def main():
    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    from crowdnav_prediction_attngraph_tpu.train import load_gst_params

    num_envs = int(os.environ.get("BENCH_ENVS", "256"))
    num_steps = 30
    cfg = gst_config(human_num=20)
    cfg = cfg.replace(ppo=cfg.ppo.__class__(
        num_processes=num_envs, num_steps=num_steps, num_mini_batch=2,
        ppo_epoch=5))

    try:
        gst_params = load_gst_params(cfg, None)
    except Exception:
        # reference checkpoint unavailable: random weights, same compute
        from crowdnav_prediction_attngraph_tpu.models.gst.st_model import STModel
        L, A = cfg.pred.obs_seq_len, cfg.sim.max_human_num
        gst_params = STModel(cfg.pred).init(
            jax.random.key(0), jnp.zeros((1, L, A, 2)),
            jnp.zeros((1, L, A, A, 2)), jnp.ones((1, L, A, A)),
            jnp.ones((1, A, L + cfg.pred.pred_seq_len)), 0.03, True, False)

    ts = ppo_mod.init_train_state(cfg, jax.random.key(0), gst_params)
    # note: buffer donation is rejected by the axon TPU runtime
    it = jax.jit(lambda t: ppo_mod.train_iteration(cfg, t, gst_params))

    # warmup / compile
    ts, m = it(ts)
    jax.block_until_ready(m["value_loss"])

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, m = it(ts)
    jax.block_until_ready(m["value_loss"])
    dt = time.perf_counter() - t0

    steps_per_s = iters * num_envs * num_steps / dt
    print(json.dumps({
        "metric": "ppo_env_steps_per_s",
        "value": round(steps_per_s, 2),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
