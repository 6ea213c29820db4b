"""Evaluation driver (reference test.py:16-158).

Loads a training run's config snapshot + checkpoint and runs the seeded
500-episode suite, logging the reference's metric line to
``<output_dir>/test/<step>.log``.

Usage:
  python -m crowdnav_prediction_attngraph_tpu.test \
      --model-dir trained_models/my_model [--test-case-size 500]
  python -m crowdnav_prediction_attngraph_tpu.test \
      --env-name CrowdSimVarNum --robot-policy orca   # scripted baselines
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys

import jax

from . import config as config_mod
from .algo import evaluation
from .algo import ppo as ppo_mod
from .train import build_config, load_gst_params
from .utils import checkpoint as ckpt_util



def _apply_platform_env():
    """Honor JAX_PLATFORMS even though the container sitecustomize pre-registers
    the axon TPU plugin (which otherwise wins)."""
    import os
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)

def config_from_snapshot(path: str) -> config_mod.Config:
    with open(path) as f:
        d = json.load(f)

    def build(cls, sub):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in sub.items():
            if k not in fields:
                continue
            ft = fields[k].type
            if dataclasses.is_dataclass(fields[k].default.__class__) and \
                    isinstance(v, dict):
                kw[k] = build(fields[k].default.__class__, v)
            else:
                kw[k] = v
        return cls(**kw)

    return build(config_mod.Config, d)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", default=None)
    p.add_argument("--env-name", default="CrowdSimVarNum")
    p.add_argument("--predict-method", default="none")
    p.add_argument("--human-num", type=int, default=20)
    p.add_argument("--human-num-range", type=int, default=0)
    p.add_argument("--num-processes", type=int, default=16)
    p.add_argument("--num-steps", type=int, default=30)
    p.add_argument("--num-env-steps", type=int, default=0)
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--seed", type=int, default=425)
    p.add_argument("--test-case-size", type=int, default=None)
    p.add_argument("--robot-policy", default="network",
                   choices=["network", "orca", "social_force"])
    p.add_argument("--no-randomize-attributes", dest="randomize_attributes",
                   action="store_false", default=True,
                   help="fixed v_pref/radius humans (reference *_no_rand "
                        "baseline configs set env.randomize_attributes=False)")
    p.add_argument("--orca-stale-radii", action="store_true",
                   help="diagnostic: emulate the reference ORCA policy's "
                        "persistent-RVO2-sim stale neighbor radii "
                        "(orca.py:80-82); see OrcaConfig.stale_neighbor_radii")
    p.add_argument("--gst-model-dir", default=None)
    p.add_argument("--ckpt-step", type=int, default=None,
                   help="checkpoint update index to test (reference test.py "
                        "--test_model); default: latest")
    p.add_argument("--visualize", action="store_true",
                   help="render one episode live instead of running the "
                        "suite (reference test.py --visualize)")
    p.add_argument("--test-case", type=int, default=0,
                   help="case index to visualize (reference test.py "
                        "--test_case)")
    p.add_argument("--render-out", default=None,
                   help="GIF path for --visualize (default "
                        "<model-dir>/test/case_<N>.gif)")
    p.add_argument("--gst-matmul-dtype", default=None,
                   choices=["f32", "bf16"],
                   help="override the GST predictor's inference matmul "
                        "dtype (A/B the bf16 fast path against a snapshot "
                        "trained either way)")
    args = p.parse_args(argv)
    _apply_platform_env()

    snapshot = args.model_dir and os.path.join(args.model_dir, "config.json")
    if snapshot and os.path.exists(snapshot):
        cfg = config_from_snapshot(snapshot)
    elif args.robot_policy == "network":
        raise SystemExit(f"no config snapshot at {snapshot or '--model-dir'}"
                         " (required for network policy)")
    else:
        # scripted baselines: --model-dir is just the log location
        cfg = build_config(args)
    if getattr(args, "orca_stale_radii", False):
        cfg = cfg.replace(orca=dataclasses.replace(
            cfg.orca, stale_neighbor_radii=True))
    if args.gst_matmul_dtype:
        cfg = cfg.replace(pred=dataclasses.replace(
            cfg.pred, matmul_dtype=args.gst_matmul_dtype))

    gst_params = load_gst_params(cfg, args.gst_model_dir)

    params = None
    step = 0
    if args.robot_policy == "network":
        if not args.model_dir:
            raise SystemExit("--model-dir required for network policy")
        print("[test] building template train state (compiles env reset)...",
              flush=True)
        ts = ppo_mod.init_train_state(cfg, jax.random.key(cfg.ppo.seed),
                                      gst_params)
        ts, step = ckpt_util.restore_train_state(
            os.path.join(args.model_dir, "checkpoints"), ts,
            step=args.ckpt_step)
        params = ts.params
        step = step - 1  # restore returns the NEXT update index
        print(f"[test] restored checkpoint {step}", flush=True)

    out_dir = os.path.join(args.model_dir or ".", "test")
    os.makedirs(out_dir, exist_ok=True)

    if args.visualize:
        from .utils import render
        out_path = args.render_out or os.path.join(
            out_dir, f"case_{args.test_case}.gif")
        render.render_episode_live(
            cfg, params, gst_params, case_idx=args.test_case,
            base_seed=cfg.ppo.seed, robot_policy=args.robot_policy,
            out_path=out_path)
        print(f"wrote {out_path}")
        return

    log_path = os.path.join(out_dir, f"test_{step:05d}.log")
    # explicit handlers: jax/absl already attach root handlers at import, so
    # logging.basicConfig would silently no-op and drop INFO records
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s, %(levelname)s: %(message)s",
                            "%Y-%m-%d %H:%M:%S")
    fh = logging.FileHandler(log_path, mode="w")
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(sh)

    results = evaluation.evaluate(
        cfg, params, gst_params, test_size=args.test_case_size,
        robot_policy=args.robot_policy)
    logging.info(evaluation.format_results(results))
    logging.info("Collision cases: " +
                 " ".join(str(x) for x in results["collision_cases"]))
    logging.info("Timeout cases: " +
                 " ".join(str(x) for x in results["timeout_cases"]))


if __name__ == "__main__":
    main()
