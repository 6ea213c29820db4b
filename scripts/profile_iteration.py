"""Phase-level decomposition of the fused PPO train iteration (VERDICT r3 #1).

Times each stage of the 275 ms flagship iteration independently (jitted alone,
device-synced) so the committed profile says where the time goes:

  - full train_iteration            (rollout + GAE + 5x2 PPO update)
  - rollout only                    (30 fused env steps)
  - ppo_update only                 (GAE + 10 minibatch Adam steps)
  - one policy act                  (rollout-phase policy forward, rows=N)
  - one vec_step (with pretext)     (env core + GST predictor + reward rewrite)
  - one env core step (no pretext)  (crowd_sim.step + auto-reset, vmapped)
  - one pretext_process             (GST predict + penalty + edge rewrite)
  - one gst_predict                 (the 5-obs + 4-decode recursive st_model)
  - one get_human_actions           (the batched ORCA LP over A humans)

Per-step numbers are multiplied by num_steps (30) to give the per-iteration
attribution. Writes docs/PROFILE_r04.md and prints the table.

Usage: python scripts/profile_iteration.py [--envs 256] [--iters 50]
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


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", default=os.path.join(ROOT, "docs", "PROFILE_r04.md"))
    args = ap.parse_args()

    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    from crowdnav_prediction_attngraph_tpu.env import vector, crowd_sim
    from crowdnav_prediction_attngraph_tpu.env.crowd_sim import get_human_actions
    from crowdnav_prediction_attngraph_tpu.env.pretext import pretext_process
    from crowdnav_prediction_attngraph_tpu.models.gst.predictor import gst_predict
    from crowdnav_prediction_attngraph_tpu.models import policy as policy_mod
    from crowdnav_prediction_attngraph_tpu.train import load_gst_params

    N = args.envs
    T = 30
    cfg = gst_config(human_num=20)
    cfg = cfg.replace(ppo=cfg.ppo.__class__(
        num_processes=N, num_steps=T, num_mini_batch=2, ppo_epoch=5))

    try:
        gst_params = load_gst_params(cfg, None)
    except Exception:
        from crowdnav_prediction_attngraph_tpu.models.gst.st_model import STModel
        L, A = cfg.pred.obs_seq_len, cfg.sim.max_human_num
        gst_params = STModel(cfg.pred).init(
            jax.random.key(0), jnp.zeros((1, L, A, 2)),
            jnp.zeros((1, L, A, A, 2)), jnp.ones((1, L, A, A)),
            jnp.ones((1, A, L + cfg.pred.pred_seq_len)), 0.03, True, False)

    ts = ppo_mod.init_train_state(cfg, jax.random.key(0), gst_params)
    rows = {}

    # ---- full iteration --------------------------------------------------
    it = jax.jit(lambda t: ppo_mod.train_iteration(cfg, t, gst_params))
    ts2, m = it(ts)
    jax.block_until_ready(m["value_loss"])
    rows["train_iteration"] = timeit(it, ts, iters=args.iters)

    # ---- rollout only ----------------------------------------------------
    ro = jax.jit(lambda t: ppo_mod.rollout(cfg, t, gst_params))
    _, batch = ro(ts)
    jax.block_until_ready(batch.rewards)
    rows["rollout (30 steps)"] = timeit(ro, ts, iters=args.iters)

    # ---- ppo_update only -------------------------------------------------
    up = jax.jit(lambda p, o, b, k: ppo_mod.ppo_update(cfg, p, o, b, k))
    k_up = jax.random.key(1)
    rows["ppo_update (GAE + 10 Adam steps)"] = timeit(
        up, ts.params, ts.opt_state, batch, k_up, iters=args.iters)

    # ---- one policy act --------------------------------------------------
    act = jax.jit(lambda p, o, h, mk, k: policy_mod.act(cfg, p, o, h, mk, k))
    rows["policy act (x1 step)"] = timeit(
        act, ts.params, ts.obs, ts.hxs, ts.masks, jax.random.key(2),
        iters=args.iters)

    # ---- one fused env step (with pretext) -------------------------------
    actions = jnp.zeros((N, 2))
    vs = jax.jit(lambda s, a: vector.vec_step(cfg, s, a, "train", gst_params))
    rows["vec_step w/ pretext (x1 step)"] = timeit(
        vs, ts.env_states, actions, iters=args.iters)

    # ---- env core step (no pretext) --------------------------------------
    def core_step(states, actions):
        states, obs, rew, done, info = jax.vmap(
            lambda s, a: crowd_sim.step(cfg, s, a, "train"))(states, actions)
        reset_keys = jax.vmap(lambda s: jax.random.fold_in(s.key, 1))(states)
        fresh_states, fresh_obs = jax.vmap(
            lambda k: crowd_sim.reset(cfg, k))(reset_keys)

        def select(a, b):
            d = done.reshape(done.shape + (1,) * (a.ndim - 1))
            return jnp.where(d, a, b)

        states = jax.tree.map(select, fresh_states, states)
        obs = jax.tree.map(select, fresh_obs, obs)
        return states, obs, rew, done

    cs = jax.jit(core_step)
    rows["env core step, no pretext (x1)"] = timeit(
        cs, ts.env_states, actions, iters=args.iters)

    # ---- pretext alone ---------------------------------------------------
    states0, obs0 = jax.jit(
        lambda k: vector.vec_reset(cfg, k, N))(jax.random.key(3))
    rewz = jnp.zeros((N,))
    px = jax.jit(lambda s, o, r: jax.vmap(
        lambda ss, oo, rr: pretext_process(cfg, gst_params, ss, oo, rr))(
            s, o, r))
    rows["pretext_process (x1 step)"] = timeit(
        px, states0, obs0, rewz, iters=args.iters)

    # ---- gst_predict alone ----------------------------------------------
    in_traj = jnp.asarray(
        np.random.RandomState(0).randn(N, cfg.sim.max_human_num,
                                       cfg.pred.obs_seq_len, 2), jnp.float32)
    in_mask = jnp.ones((N, cfg.sim.max_human_num, cfg.pred.obs_seq_len), bool)
    gp = jax.jit(lambda t, mk: jax.vmap(
        lambda tt, mm: gst_predict(cfg.pred, gst_params, tt, mm))(t, mk))
    rows["gst_predict (x1 step)"] = timeit(gp, in_traj, in_mask,
                                           iters=args.iters)

    # ---- ORCA humans alone ----------------------------------------------
    ha = jax.jit(lambda s: jax.vmap(
        lambda ss: get_human_actions(cfg, ss))(s))
    rows["get_human_actions / ORCA (x1)"] = timeit(
        ha, ts.env_states, iters=args.iters)

    # ---- report ----------------------------------------------------------
    total = rows["train_iteration"]
    lines = [
        "# Train-iteration phase profile (round 4)", "",
        f"Flagship GST recipe, {N} envs x {T} steps, "
        f"device = {jax.devices()[0].device_kind}, {args.iters} iters each, "
        "each stage jitted alone and block_until_ready-synced.", "",
        "| stage | ms/call | x per iter | ms/iter | % of iter |",
        "|---|---|---|---|---|",
    ]
    per_iter = {
        "train_iteration": 1, "rollout (30 steps)": 1,
        "ppo_update (GAE + 10 Adam steps)": 1,
        "policy act (x1 step)": T, "vec_step w/ pretext (x1 step)": T,
        "env core step, no pretext (x1)": T, "pretext_process (x1 step)": T,
        "gst_predict (x1 step)": T, "get_human_actions / ORCA (x1)": T,
    }
    for name, ms in rows.items():
        n = per_iter[name]
        lines.append(f"| {name} | {ms:.2f} | {n} | {ms * n:.1f} "
                     f"| {ms * n / total * 100:.0f}% |")
    lines += [
        "",
        "Stages overlap (rollout contains act+vec_step; vec_step contains the",
        "env core and pretext; pretext contains gst_predict; the env core",
        "contains ORCA) — the table attributes, it does not sum to 100%.",
    ]
    report = "\n".join(lines)
    print(report)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(report + "\n")
    print(f"\nwritten: {args.out}")


if __name__ == "__main__":
    main()
