"""Training driver (reference train.py:23-244).

Runs the fused PPO iteration in a loop, maintains a rolling episode-reward
window (the reference's baselines Monitor deque, train.py:126+180-182),
writes progress.csv in the reference's exact column format
(train.py:235-242), and checkpoints params+optimizer state with orbax
(improving on the reference, which drops optimizer state — train.py:213-219).

Usage:
  python -m crowdnav_prediction_attngraph_tpu.train \
      --env-name CrowdSimVarNum --human-num 5 --num-env-steps 200000 \
      --output-dir trained_models/my_model
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from .config import Config, gst_config, pred_config, varnum_config
from .algo import ppo as ppo_mod
from .utils import checkpoint as ckpt_util



def _apply_platform_env():
    """Honor JAX_PLATFORMS even though the container sitecustomize pre-registers
    the axon TPU plugin (which otherwise wins)."""
    import os
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)

def build_config(args) -> Config:
    if args.env_name == "CrowdSimVarNum":
        cfg = varnum_config(human_num=args.human_num,
                            human_num_range=args.human_num_range)
    elif args.env_name == "CrowdSimPred":
        cfg = pred_config(predict_method=args.predict_method,
                          human_num=args.human_num,
                          human_num_range=args.human_num_range)
    elif args.env_name == "CrowdSimPredRealGST":
        cfg = gst_config(human_num=args.human_num,
                         human_num_range=args.human_num_range)
    else:
        raise ValueError(args.env_name)
    ppo = dataclasses.replace(
        cfg.ppo, num_processes=args.num_processes, num_steps=args.num_steps,
        num_env_steps=args.num_env_steps, lr=args.lr, seed=args.seed,
        num_mini_batch=getattr(args, "num_mini_batch", 2),
        ppo_epoch=getattr(args, "ppo_epoch", 5),
        entropy_coef=getattr(args, "entropy_coef", 0.0),
        use_linear_lr_decay=getattr(args, "use_linear_lr_decay", False))
    cfg = cfg.replace(ppo=ppo)
    if not getattr(args, "randomize_attributes", True):
        # reference ORCA_no_rand/SF_no_rand configs set
        # env.randomize_attributes = False (their configs/config.py:22)
        cfg = cfg.replace(env=dataclasses.replace(
            cfg.env, randomize_attributes=False))
    if getattr(args, "kinematics", None):
        cfg = cfg.replace(action_space=dataclasses.replace(
            cfg.action_space, kinematics=args.kinematics))
    if getattr(args, "robot_v_pref", None):
        cfg = cfg.replace(robot=dataclasses.replace(
            cfg.robot, v_pref=args.robot_v_pref))
    if getattr(args, "spin_warmup_steps", 0):
        cfg = cfg.replace(reward=dataclasses.replace(
            cfg.reward,
            spin_penalty_warmup_steps=args.spin_warmup_steps))
    if getattr(args, "gst_matmul_dtype", None):
        # the production training recipe runs the predictor's inference
        # matmuls in bf16 (f32 softmax/renorm/accumulation) — recorded in the
        # config snapshot so test.py reproduces the exact compute path
        cfg = cfg.replace(pred=dataclasses.replace(
            cfg.pred, matmul_dtype=args.gst_matmul_dtype))
    return cfg


def load_gst_params(cfg: Config, model_dir: str | None):
    """GST predictor weights for the inferred-prediction envs. Accepts
    either the reference's torch layout (<dir>/checkpoint/epoch_100.pt) or
    an orbax checkpoint saved by our own offline trainer
    (models/gst/trainer.py, e.g. results/gst_sj_tpu/epoch_100) — so a
    SELF-TRAINED predictor can drive the nav stack end to end."""
    if cfg.sim.predict_method != "inferred":
        return None
    if model_dir is not None and not os.path.exists(
            os.path.join(model_dir, "checkpoint", "epoch_100.pt")):
        # orbax dir from our trainer: restore into a template param tree
        from .models.gst.trainer import init_params as gst_init
        from .utils.checkpoint import load_params
        template = gst_init(cfg.pred, jax.random.key(0),
                            cfg.sim.max_human_num)
        return load_params(model_dir, template)
    from .utils.torch_import import load_gst_checkpoint
    if model_dir is None:
        model_dir = os.path.join(
            "/root/reference/gst_updated/results/"
            "100-gumbel_social_transformer-faster_lstm-lr_0.001-"
            "init_temp_0.5-edge_head_0-ebd_64-snl_1-snh_8-seed_1000_rand/sj")
    path = os.path.join(model_dir, "checkpoint", "epoch_100.pt")
    params = load_gst_checkpoint(path, num_layers=cfg.pred.spatial_num_layers)
    return jax.tree.map(jnp.asarray, params)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", default="trained_models/my_model")
    p.add_argument("--env-name", default="CrowdSimPredRealGST")
    p.add_argument("--predict-method", default="const_vel")
    p.add_argument("--human-num", type=int, default=20)
    p.add_argument("--human-num-range", type=int, default=0)
    p.add_argument("--num-processes", type=int, default=16)
    p.add_argument("--num-steps", type=int, default=30)
    p.add_argument("--num-env-steps", type=int, default=20_000_000)
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--num-mini-batch", type=int, default=2)
    p.add_argument("--ppo-epoch", type=int, default=5)
    p.add_argument("--entropy-coef", type=float, default=0.0)
    p.add_argument("--use-linear-lr-decay", action="store_true",
                   help="linear lr schedule (reference arguments.py:121-124)")
    p.add_argument("--seed", type=int, default=425)
    p.add_argument("--log-interval", type=int, default=20)
    p.add_argument("--save-interval", type=int, default=200)
    p.add_argument("--gst-model-dir", default=None)
    p.add_argument("--gst-matmul-dtype", default="bf16",
                   choices=["f32", "bf16"],
                   help="GST predictor inference matmul dtype inside the "
                        "fused rollout (bf16 = production default, ~16%% "
                        "faster rollout; f32 for strict-parity runs)")
    p.add_argument("--no-randomize-attributes", dest="randomize_attributes",
                   action="store_false",
                   help="fixed human v_pref/radius (the reference's "
                        "*_non_rand configs: env.randomize_attributes="
                        "False, their configs/config.py:23)")
    p.add_argument("--kinematics", default=None,
                   choices=["holonomic", "unicycle"],
                   help="robot action space (reference config.py:113)")
    p.add_argument("--robot-v-pref", type=float, default=None,
                   help="robot max speed (reference config.py:103 default "
                        "1.0). The sim2real TurtleBot2i physically caps at "
                        "0.035/2*35 = 0.6125 m/s (wheel clip, "
                        "ros_turtlebot2i_env.py:294-308), so unicycle "
                        "training for deployment should use <= 0.6")
    p.add_argument("--spin-warmup-steps", type=int, default=0,
                   help="anneal the unicycle spin penalty -4.5*r^2 "
                        "(crowd_sim_var_num.py:551) linearly from 0 over "
                        "this many env steps — full strength from step 0 "
                        "suppresses the turning exploration that collision "
                        "avoidance needs (r4 unicycle NOTES.md)")
    p.add_argument("--resume", default=None,
                   help="checkpoint directory to resume from")
    p.add_argument("--init-params-from", default=None,
                   help="warm-start ONLY the network params from a "
                        "checkpoint dir (fresh optimizer/envs/update "
                        "counter) — the reference's sim2real curriculum: "
                        "pretrain holonomic, fine-tune unicycle (README "
                        "sim2real section; arguments.py:121-124)")
    p.add_argument("--init-params-step", type=int, default=None,
                   help="specific checkpoint step for --init-params-from "
                        "(default: latest)")
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run a deterministic eval every N updates (0 = off)")
    p.add_argument("--eval-size", type=int, default=500,
                   help="episodes per in-loop val eval; the full 500-case "
                        "suite by default — a 100-episode val success "
                        "oscillates +-3-4 pts between evals, making "
                        "best-val checkpoint selection luck-sensitive "
                        "(VERDICT r2 item 6); the vectorized suite costs "
                        "seconds, so use the whole thing")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed multi-host training: same command "
                        "on every host; env batch shards over the global "
                        "dp mesh axis")
    p.add_argument("--coordinator-address", default=None)
    p.add_argument("--num-hosts", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree for the wide attention "
                        "projections (multihost/mesh mode)")
    args = p.parse_args(argv)
    _apply_platform_env()
    if args.multihost:
        # must precede ANY backend-initializing jax call (jax.devices,
        # device_put, jnp.asarray, ...)
        from .parallel import launch
        launch.initialize(args.coordinator_address, args.num_hosts,
                          args.process_id)

    cfg = build_config(args)
    os.makedirs(args.output_dir, exist_ok=True)
    # config snapshot (train.py:37-42 copies config.py/arguments.py; here the
    # config is a dataclass -> JSON)
    with open(os.path.join(args.output_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    gst_params = load_gst_params(cfg, args.gst_model_dir)
    is_main = True
    if args.multihost:
        from .parallel import launch
        is_main = jax.process_index() == 0
        mesh = launch.global_mesh(tp=args.tp)
        if is_main:
            print(f"multihost: {jax.process_count()} hosts, "
                  f"{len(jax.devices())} devices, mesh {mesh.shape}")
        ts = launch.init_sharded_global(cfg, jax.random.key(cfg.ppo.seed),
                                        mesh, gst_params)
        iteration = launch.make_global_iteration(cfg, mesh, gst_params)
    else:
        ts = ppo_mod.init_train_state(cfg, jax.random.key(cfg.ppo.seed),
                                      gst_params)
        iteration = jax.jit(
            lambda ts: ppo_mod.train_iteration(cfg, ts, gst_params))
    start_update = 0
    if args.resume:
        ts, start_update = ckpt_util.restore_train_state(args.resume, ts)
    elif args.init_params_from:
        warm, _ = ckpt_util.restore_train_state(
            args.init_params_from, ts, step=args.init_params_step)
        ts = ts.replace(params=warm.params)   # params only: fresh optimizer,
        print(f"warm-started params from {args.init_params_from}"  # envs, lr
              f" (step {args.init_params_step or 'latest'})")

    num_updates = int(cfg.ppo.num_env_steps) // cfg.ppo.num_steps \
        // cfg.ppo.num_processes
    best_success = -1.0
    episode_rewards = collections.deque(maxlen=100)
    episode_rewards_env = collections.deque(maxlen=100)  # reference Monitor metric
    start = time.time()
    csv_path = os.path.join(args.output_dir, "progress.csv")

    # Deferred metric materialization: np.asarray(metrics[...]) right after
    # iteration() forces a host<->device sync every update, which serializes
    # dispatch and costs ~20 ms/iteration of pipelining on the tunneled TPU
    # (PROFILE_r04). Metrics are tiny; buffer the device trees and pull them
    # only at log/eval boundaries.
    pending = []

    def flush_pending():
        for m in pending:
            if args.multihost:
                c = float(m["done_count"])
                if c > 0:
                    episode_rewards.append(float(m["done_sum"]) / c)
                    episode_rewards_env.append(float(m["done_sum_env"]) / c)
            else:
                done_rets = np.asarray(m["done_returns"])
                episode_rewards.extend(
                    done_rets[~np.isnan(done_rets)].tolist())
                done_rets_env = np.asarray(m["done_returns_env"])
                episode_rewards_env.extend(
                    done_rets_env[~np.isnan(done_rets_env)].tolist())
        pending.clear()

    for j in range(start_update, num_updates):
        ts, metrics = iteration(ts)
        pending.append(metrics)

        if args.eval_interval and j % args.eval_interval == 0 and j > 0 \
                and not args.multihost:
            flush_pending()
            from .algo import evaluation
            r = evaluation.evaluate(cfg, ts.params, gst_params,
                                    test_size=args.eval_size, phase="val")
            print(f"[eval @ update {j}] " + evaluation.format_results(r))
            with open(os.path.join(args.output_dir, "eval_history.csv"),
                      "a") as f:
                f.write(f"{j},{r['success_rate']},{r['collision_rate']},"
                        f"{r['timeout_rate']},{r['nav_time']},"
                        f"{r['path_length']},{r['intrusion_ratio']},"
                        f"{r['min_intrusion_dist']}\n")
            # checkpoint every eval point so the best-eval policy is always
            # recoverable (round-1 lesson: a late-training collapse can lose
            # an earlier 0.9-success policy; reference only keeps periodic
            # snapshots, train.py:213-219)
            ckpt_util.save_train_state(
                os.path.join(args.output_dir, "checkpoints"), ts, j)
            if r["success_rate"] >= best_success:
                best_success = r["success_rate"]
                with open(os.path.join(args.output_dir, "best.json"),
                          "w") as f:
                    json.dump({"update": j, **{k: v for k, v in r.items()
                                               if not k.endswith("_cases")}},
                              f, indent=2)

        if j % args.save_interval == 0 or j == num_updates - 1:
            ckpt_util.save_train_state(
                os.path.join(args.output_dir, "checkpoints"), ts, j)

        if j % args.log_interval == 0:
            flush_pending()
        if j % args.log_interval == 0 and len(episode_rewards) > 1 \
                and is_main:
            total_num_steps = (j + 1) * cfg.ppo.num_processes * cfg.ppo.num_steps
            fps = int(total_num_steps / (time.time() - start))
            lr_now = cfg.ppo.lr * (max(0.0, 1.0 - j / num_updates)
                                   if cfg.ppo.use_linear_lr_decay else 1.0)
            row = {
                "misc/nupdates": j,
                "misc/total_timesteps": total_num_steps,
                "misc/lr": lr_now,
                "fps": fps,
                "eprewmean": float(np.mean(episode_rewards)),
                "eprewmean_env": float(np.mean(episode_rewards_env)),
                "loss/policy_entropy": float(metrics["dist_entropy"]),
                "loss/policy_loss": float(metrics["action_loss"]),
                "loss/value_loss": float(metrics["value_loss"]),
            }
            print(f"Updates {j}, num timesteps {total_num_steps}, FPS {fps} "
                  f"eprewmean {row['eprewmean']:.2f} "
                  f"value_loss {row['loss/value_loss']:.3f}")
            header = not os.path.exists(csv_path)
            with open(csv_path, "a") as f:
                if header:
                    f.write(",".join(row.keys()) + "\n")
                f.write(",".join(str(v) for v in row.values()) + "\n")


if __name__ == "__main__":
    main()
