"""Recurrent PPO, fully fused under jit.

The reference splits one training iteration across processes and devices
(train.py:144-242: 16-process rollout via pipes -> GAE in Python -> 5x2
minibatch Adam steps); here rollout (policy + simulator + GST predictor),
GAE, and the PPO optimization loop are ONE jitted function per iteration —
no host round-trips. Loss structure follows rl/ppo/ppo.py:36-101 exactly
(clipped surrogate, clipped value loss, entropy bonus, grad-norm clip, Adam).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..env import vector
from ..env.types import EnvState, OUTCOME_TIMEOUT
from ..models import distributions, policy as policy_mod
from ..models.policy_net import init_hidden, obs_to_dict
from .gae import compute_returns


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_states: EnvState
    obs: Dict[str, jnp.ndarray]          # (N, ...)
    hxs: Dict[str, jnp.ndarray]          # recurrent hidden per env
    masks: jnp.ndarray                   # (N,)
    key: jnp.ndarray
    ep_return: jnp.ndarray               # (N,) running episode reward
    ep_return_env: jnp.ndarray           # (N,) same, excluding GST penalties
    total_steps: jnp.ndarray             # () int64-ish counter


class RolloutBatch(NamedTuple):
    obs: Dict[str, jnp.ndarray]          # (T+1, N, ...)
    hxs0: Dict[str, jnp.ndarray]         # hidden at rollout start (N, ...)
    actions: jnp.ndarray                 # (T, N, 2)
    log_probs: jnp.ndarray               # (T, N, 1)
    values: jnp.ndarray                  # (T+1, N, 1)
    rewards: jnp.ndarray                 # (T, N)
    masks: jnp.ndarray                   # (T+1, N)
    bad_masks: jnp.ndarray               # (T+1, N)
    done_returns: jnp.ndarray            # (T, N) episode return where done else nan
    done_returns_env: jnp.ndarray        # (T, N) same, env reward only (the
                                         # reference Monitor metric)


def make_optimizer(cfg: Config):
    p = cfg.ppo
    if p.use_linear_lr_decay:
        # reference network_utils.py:45-50: lr_j = lr * (1 - j/num_updates),
        # stepped once per update; here expressed over Adam steps (each update
        # applies ppo_epoch*num_mini_batch of them) as an optax schedule.
        num_updates = int(p.num_env_steps) // p.num_steps // p.num_processes
        lr = optax.linear_schedule(
            init_value=p.lr, end_value=0.0,
            transition_steps=num_updates * p.ppo_epoch * p.num_mini_batch)
    else:
        lr = p.lr
    return optax.chain(
        optax.clip_by_global_norm(p.max_grad_norm),
        optax.adam(lr, eps=p.eps),
    )


def init_train_state(cfg: Config, key, gst_params=None) -> TrainState:
    """Build the initial TrainState under ONE jit.

    Running the 256-env reset + flax init eagerly dispatched every jnp op
    as its own tiny program through the remote TPU compiler — ~228 s of a
    fresh container's cold start was exactly this (compile_report r4). One
    fused program compiles in a fraction of that and is persistently
    cached."""
    N = cfg.ppo.num_processes

    def build(key, gst_params):
        key, k_env, k_par = jax.random.split(key, 3)
        env_states, obs = vector.vec_reset_with_pretext(cfg, k_env, N,
                                                        gst_params)
        obs_d = obs_to_dict(obs)
        params = policy_mod.init_params(cfg, k_par, obs_d)
        tx = make_optimizer(cfg)
        return TrainState(
            params=params, opt_state=tx.init(params), env_states=env_states,
            obs=obs_d, hxs=init_hidden(cfg, N), masks=jnp.ones((N,)),
            key=key, ep_return=jnp.zeros((N,)), ep_return_env=jnp.zeros((N,)),
            total_steps=jnp.zeros((), jnp.int32))

    return jax.jit(build)(key, gst_params)


def rollout(cfg: Config, ts: TrainState, gst_params=None, phase="train"
            ) -> Tuple[TrainState, RolloutBatch]:
    """T-step fused rollout (train.py:152-199)."""
    T = cfg.ppo.num_steps

    # linear warmup of the unicycle spin-penalty coefficient (static branch:
    # the default warmup=0 path traces the exact same program as before)
    spin_coef = None
    if (cfg.reward.spin_penalty_warmup_steps > 0
            and cfg.action_space.kinematics == "unicycle"
            and phase == "train"):
        frac = jnp.clip(ts.total_steps.astype(jnp.float32)
                        / cfg.reward.spin_penalty_warmup_steps, 0.0, 1.0)
        spin_coef = cfg.reward.spin_penalty_factor * frac

    def step_fn(carry, _):
        env_states, obs, hxs, masks, key, ep_ret, ep_ret_env = carry
        key, k_act = jax.random.split(key)
        value, action, log_prob, hxs_new = policy_mod.act(
            cfg, ts.params, obs, hxs, masks, k_act)
        env_states, obs_next, rew, done, info, penalty = vector.vec_step(
            cfg, env_states, action, phase, gst_params, spin_coef=spin_coef)
        ep_ret_next = ep_ret + rew
        ep_env_next = ep_ret_env + rew - penalty
        done_ret = jnp.where(done, ep_ret_next, jnp.nan)
        done_ret_env = jnp.where(done, ep_env_next, jnp.nan)
        ep_ret_next = jnp.where(done, 0.0, ep_ret_next)
        ep_env_next = jnp.where(done, 0.0, ep_env_next)
        masks_next = 1.0 - done.astype(jnp.float32)
        bad_next = jnp.where(info.outcome == OUTCOME_TIMEOUT, 0.0, 1.0)
        out = (obs, value, action, log_prob, rew, masks, done_ret,
               done_ret_env, bad_next)
        return ((env_states, obs_to_dict(obs_next), hxs_new, masks_next, key,
                 ep_ret_next, ep_env_next), out)

    carry0 = (ts.env_states, ts.obs, ts.hxs, ts.masks, ts.key, ts.ep_return,
              ts.ep_return_env)
    carry, outs = jax.lax.scan(step_fn, carry0, None, length=T)
    (env_states, obs_last, hxs_last, masks_last, key, ep_ret,
     ep_ret_env) = carry
    (obs_seq, values, actions, log_probs, rewards, masks_seq, done_rets,
     done_rets_env, bad_seq) = outs

    # bootstrap value for the T+1 slot (train.py:200-207)
    last_value = policy_mod.get_value(cfg, ts.params, obs_last, hxs_last,
                                      masks_last)
    obs_full = jax.tree.map(
        lambda seq, last: jnp.concatenate([seq, last[None]], axis=0),
        obs_seq, obs_last)
    values_full = jnp.concatenate([values, last_value[None]], axis=0)
    masks_full = jnp.concatenate([masks_seq, masks_last[None]], axis=0)
    bad_full = jnp.concatenate([jnp.ones_like(bad_seq[:1]), bad_seq], axis=0)

    batch = RolloutBatch(
        obs=obs_full, hxs0=ts.hxs, actions=actions, log_probs=log_probs,
        values=values_full, rewards=rewards, masks=masks_full,
        bad_masks=bad_full, done_returns=done_rets,
        done_returns_env=done_rets_env)
    ts = ts.replace(env_states=env_states, obs=obs_last, hxs=hxs_last,
                    masks=masks_last, key=key, ep_return=ep_ret,
                    ep_return_env=ep_ret_env,
                    total_steps=ts.total_steps + T * cfg.ppo.num_processes)
    return ts, batch


def ppo_update(cfg: Config, params, opt_state, batch: RolloutBatch, key):
    """5-epoch x 2-minibatch clipped-PPO optimization (ppo.py:36-101)."""
    p = cfg.ppo
    T = p.num_steps
    N = p.num_processes
    n_per_batch = N // p.num_mini_batch
    tx = make_optimizer(cfg)

    returns = compute_returns(batch.rewards, batch.values[:, :, 0],
                              batch.masks, batch.bad_masks, p.gamma,
                              p.gae_lambda, p.use_gae,
                              p.use_proper_time_limits)      # (T, N)
    advantages = returns - batch.values[:-1, :, 0]
    adv_mean = jnp.mean(advantages)
    adv_std = jnp.std(advantages, ddof=1)                    # torch .std()
    advantages_n = (advantages - adv_mean) / (adv_std + 1e-5)

    perm_keys = jax.random.split(key, p.ppo_epoch)
    perms = jax.vmap(lambda k: jax.random.permutation(k, N))(perm_keys)

    obs_steps = jax.tree.map(lambda x: x[:-1], batch.obs)    # (T, N, ...)

    def loss_fn(params, idx):
        take = lambda x: jnp.take(x, idx, axis=1)
        obs_mb = jax.tree.map(take, obs_steps)
        hxs_mb = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), batch.hxs0)
        masks_mb = take(batch.masks[:-1])
        actions_mb = take(batch.actions)
        old_lp = take(batch.log_probs)
        vpred_old = take(batch.values[:-1, :, 0])
        ret_mb = take(returns)
        adv_mb = take(advantages_n)

        values, log_probs, entropy = policy_mod.evaluate_actions(
            cfg, params, obs_mb, hxs_mb, masks_mb, actions_mb)
        values = values[:, :, 0]
        ratio = jnp.exp(log_probs[:, :, 0] - old_lp[:, :, 0])
        surr1 = ratio * adv_mb
        surr2 = jnp.clip(ratio, 1.0 - p.clip_param, 1.0 + p.clip_param) * adv_mb
        action_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        if p.use_clipped_value_loss:
            v_clipped = vpred_old + jnp.clip(values - vpred_old,
                                             -p.clip_param, p.clip_param)
            v_losses = (values - ret_mb) ** 2
            v_losses_clipped = (v_clipped - ret_mb) ** 2
            value_loss = 0.5 * jnp.mean(jnp.maximum(v_losses,
                                                    v_losses_clipped))
        else:
            value_loss = 0.5 * jnp.mean((ret_mb - values) ** 2)

        total = (value_loss * p.value_loss_coef + action_loss
                 - entropy * p.entropy_coef)
        return total, (value_loss, action_loss, entropy)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    n_updates = p.ppo_epoch * p.num_mini_batch

    def body(k, carry):
        params, opt_state, acc = carry
        epoch = k // p.num_mini_batch
        mb = k % p.num_mini_batch
        idx = jax.lax.dynamic_slice_in_dim(perms[epoch], mb * n_per_batch,
                                           n_per_batch)
        (_, aux), grads = grad_fn(params, idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jax.tree.map(lambda a, b: a + b, acc, aux)
        return params, opt_state, acc

    acc0 = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    params, opt_state, acc = jax.lax.fori_loop(
        0, n_updates, body, (params, opt_state, acc0))
    value_loss, action_loss, entropy = [a / n_updates for a in acc]
    return params, opt_state, {"value_loss": value_loss,
                               "action_loss": action_loss,
                               "dist_entropy": entropy}


def train_iteration(cfg: Config, ts: TrainState, gst_params=None):
    """One full PPO iteration: rollout + GAE + optimization. Jit me."""
    ts, batch = rollout(cfg, ts, gst_params)
    key, k_up = jax.random.split(ts.key)
    params, opt_state, metrics = ppo_update(cfg, ts.params, ts.opt_state,
                                            batch, k_up)
    ts = ts.replace(params=params, opt_state=opt_state, key=key)
    metrics["done_returns"] = batch.done_returns
    metrics["done_returns_env"] = batch.done_returns_env
    metrics["reward_mean"] = jnp.mean(batch.rewards)
    # fully-reduced scalars for multi-host logging (a host cannot np.asarray
    # the dp-sharded done_returns; these replicate instead)
    metrics["done_count"] = jnp.sum(~jnp.isnan(batch.done_returns))
    metrics["done_sum"] = jnp.nansum(batch.done_returns)
    metrics["done_sum_env"] = jnp.nansum(batch.done_returns_env)
    return ts, metrics
