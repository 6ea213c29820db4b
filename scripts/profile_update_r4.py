"""Decompose the 144 ms ppo_update (58% of the train iteration).

Times, each jitted alone on the chip:
  - ppo_update at ppo_epoch in {5 (prod), 1} -> per-grad-step cost + GAE base
  - value_and_grad of the minibatch loss (one grad step, no optimizer)
  - the minibatch loss forward only
  - fused_graph_attention at the minibatch row count (30*128=3840), fwd and
    fwd+bwd, einsum vs pallas — the attention share of one grad step
"""

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


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from crowdnav_prediction_attngraph_tpu.config import gst_config
    from crowdnav_prediction_attngraph_tpu.algo import ppo as ppo_mod
    from crowdnav_prediction_attngraph_tpu.models import policy as policy_mod
    from crowdnav_prediction_attngraph_tpu.train import load_gst_params
    from crowdnav_prediction_attngraph_tpu.ops.masked_attention import (
        fused_graph_attention, reference_fused_graph_attention)

    N, T = 256, 30
    cfg = gst_config(human_num=20)
    cfg = cfg.replace(ppo=cfg.ppo.__class__(
        num_processes=N, num_steps=T, num_mini_batch=2, ppo_epoch=5))
    gst_params = load_gst_params(cfg, None)
    ts = ppo_mod.init_train_state(cfg, jax.random.key(0), gst_params)
    ro = jax.jit(lambda t: ppo_mod.rollout(cfg, t, gst_params))
    ts, batch = ro(ts)
    jax.block_until_ready(batch.rewards)
    k = jax.random.key(1)

    for ep in (5, 1):
        c = cfg.replace(ppo=cfg.ppo.__class__(
            num_processes=N, num_steps=T, num_mini_batch=2, ppo_epoch=ep))
        up = jax.jit(lambda p, o, b, kk: ppo_mod.ppo_update(c, p, o, b, kk))
        ms = timeit(up, ts.params, ts.opt_state, batch, k)
        print(f"ppo_update epochs={ep} ({2*ep} grad steps): {ms:.2f} ms")

    # one grad step of the minibatch loss (value_and_grad, no optimizer)
    from crowdnav_prediction_attngraph_tpu.algo.gae import compute_returns
    p = cfg.ppo
    returns = compute_returns(batch.rewards, batch.values[:, :, 0],
                              batch.masks, batch.bad_masks, p.gamma,
                              p.gae_lambda, p.use_gae,
                              p.use_proper_time_limits)
    advantages = returns - batch.values[:-1, :, 0]
    adv_n = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-5)
    idx = jnp.arange(N // 2)
    obs_steps = jax.tree.map(lambda x: x[:-1], batch.obs)

    def loss_fn(params):
        take = lambda x: jnp.take(x, idx, axis=1)
        obs_mb = jax.tree.map(take, obs_steps)
        hxs_mb = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), batch.hxs0)
        values, log_probs, entropy = policy_mod.evaluate_actions(
            cfg, params, obs_mb, hxs_mb, take(batch.masks[:-1]),
            take(batch.actions))
        ratio = jnp.exp(log_probs[:, :, 0] - take(batch.log_probs)[:, :, 0])
        action_loss = -jnp.mean(jnp.minimum(ratio, 1.0) * take(adv_n))
        value_loss = 0.5 * jnp.mean((take(returns) - values[:, :, 0]) ** 2)
        return value_loss + action_loss - 0.0 * entropy

    fwd = jax.jit(loss_fn)
    print(f"minibatch loss fwd only:        {timeit(fwd, ts.params):.2f} ms")
    grad = jax.jit(jax.value_and_grad(loss_fn))
    print(f"minibatch loss value_and_grad:  {timeit(grad, ts.params):.2f} ms")

    # attention share at the minibatch shape
    rows, A, D, H = T * (N // 2), 20, 512, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, A, D) * 0.3, jnp.float32)
    det = rng.randint(1, A + 1, rows)
    mask = jnp.asarray(np.arange(A)[None, :] < det[:, None])
    w_qkv = jnp.asarray(rng.randn(D, 3 * D) / np.sqrt(D), jnp.float32)
    b_qkv = jnp.asarray(rng.randn(3 * D) * 0.01, jnp.float32)
    w_out = jnp.asarray(rng.randn(D, D) / np.sqrt(D), jnp.float32)
    b_out = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)
    for name, fn in (("pallas", fused_graph_attention),
                     ("einsum", reference_fused_graph_attention)):
        f = jax.jit(lambda x, fn=fn: fn(x, mask, w_qkv, b_qkv, w_out, b_out,
                                        H))
        print(f"attention rows={rows} {name} fwd:      {timeit(f, x):.2f} ms")
        g = jax.jit(jax.grad(lambda x, wq, bq, wo, bo, fn=fn: jnp.sum(
            fn(x, mask, wq, bq, wo, bo, H) ** 2), argnums=(0, 1, 2, 3, 4)))
        print(f"attention rows={rows} {name} fwd+bwd:  "
              f"{timeit(g, x, w_qkv, b_qkv, w_out, b_out):.2f} ms")


if __name__ == "__main__":
    main()
