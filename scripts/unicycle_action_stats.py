"""Action-distribution analysis for a trained unicycle policy.

VERDICT r4 item 5 asks a quantified unicycle verdict to include an
action-distribution analysis: if the policy rides the |dtheta| <= 0.06
rad/step clip (srnn.py:29-43) most of the time, its turn authority — not
its optimization — is the binding constraint of the env contract.

Runs N deterministic val-suite episodes with the checkpoint, captures the
RAW network actions before clipping, and reports saturation fractions.

Usage:
  JAX_PLATFORMS=cpu python scripts/unicycle_action_stats.py \
      --model-dir trained_models/GST_predictor_unicycle_scratch_r5 \
      [--ckpt-step N] [--episodes 20]
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", required=True)
    p.add_argument("--ckpt-step", type=int, default=None)
    p.add_argument("--episodes", type=int, default=20)
    args = p.parse_args()

    from crowdnav_prediction_attngraph_tpu.test import config_from_snapshot
    from crowdnav_prediction_attngraph_tpu.train import load_gst_params
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    from crowdnav_prediction_attngraph_tpu.models import policy as policy_mod
    from crowdnav_prediction_attngraph_tpu.models.policy_net import (
        init_hidden, obs_to_dict)
    from crowdnav_prediction_attngraph_tpu.env import crowd_sim
    from crowdnav_prediction_attngraph_tpu.env.pretext import pretext_process
    from crowdnav_prediction_attngraph_tpu.utils import checkpoint as ck

    cfg = config_from_snapshot(os.path.join(args.model_dir, "config.json"))
    gst_params = load_gst_params(cfg, None)
    ts = ppo_mod.init_train_state(cfg, jax.random.key(cfg.ppo.seed),
                                  gst_params)
    ts, step = ck.restore_train_state(
        os.path.join(args.model_dir, "checkpoints"), ts,
        step=args.ckpt_step)
    print(f"checkpoint {step - 1}; kinematics={cfg.action_space.kinematics} "
          f"v_pref={cfg.robot.v_pref}")

    @jax.jit
    def reset(key):
        state, obs = crowd_sim.reset(cfg, key)
        if cfg.sim.predict_method == "inferred":
            state, obs, _, _ = pretext_process(cfg, gst_params, state, obs,
                                               jnp.float32(0.0))
        return state, obs

    @jax.jit
    def step_fn(state, obs_d, hxs):
        masks = jnp.ones((1,))
        value, action, _, hxs = policy_mod.act(
            cfg, ts.params, jax.tree.map(lambda a: a[None], obs_d),
            hxs, masks, jax.random.key(0), deterministic=True)
        a = action[0]
        state, obs, rew, done, info = crowd_sim.step(cfg, state, a, "test")
        if cfg.sim.predict_method == "inferred":
            state, obs, rew, _ = pretext_process(cfg, gst_params, state, obs,
                                                 rew)
        return state, obs, hxs, a, done

    raw_actions, outcomes = [], []
    for ep in range(args.episodes):
        state, obs = reset(jax.random.key(10_000 + ep))
        hxs = init_hidden(cfg, 1)
        for _ in range(cfg.max_episode_steps):
            state, obs, hxs, a, done = step_fn(state, obs_to_dict(obs), hxs)
            raw_actions.append(np.asarray(a))
            if bool(done):
                break
        outcomes.append(int(state.step_count))

    a = np.stack(raw_actions)            # (steps, 2) raw (dv, dtheta)
    dv, dth = a[:, 0], a[:, 1]
    # clip bounds (kinematics.clip_unicycle_action / srnn.py:29-43)
    DV_LO, DV_HI, DTH = -0.1, 0.087, 0.06
    print(f"steps analysed: {len(a)} over {args.episodes} episodes")
    print(f"|dtheta| at clip (>= {DTH:.3f}): "
          f"{float(np.mean(np.abs(dth) >= DTH)):.1%}")
    print(f"dv at accel clip (>= {DV_HI:.3f}): "
          f"{float(np.mean(dv >= DV_HI)):.1%}; at brake clip "
          f"(<= {DV_LO:.3f}): {float(np.mean(dv <= DV_LO)):.1%}")
    print(f"mean |dtheta| raw {float(np.abs(dth).mean()):.3f} "
          f"(post-clip {float(np.abs(np.clip(dth, -DTH, DTH)).mean()):.3f})")
    print(f"mean dv raw {float(dv.mean()):+.3f}; "
          f"fraction braking (dv<0) {float(np.mean(dv < 0)):.1%}")


if __name__ == "__main__":
    main()
