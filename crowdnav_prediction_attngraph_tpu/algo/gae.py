"""Generalized Advantage Estimation as a reverse lax.scan
(reference rl/networks/storage.py:98-137 sequential Python loop)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_returns(rewards, values, masks, bad_masks, gamma: float,
                    gae_lambda: float, use_gae: bool = True,
                    use_proper_time_limits: bool = False):
    """rewards: (T, N); values: (T+1, N); masks/bad_masks: (T+1, N).

    Returns returns (T, N). masks[t+1]=0 when the episode ended at step t;
    bad_masks[t+1]=0 when that end was a time-limit truncation
    (storage.py:49-51)."""
    T = rewards.shape[0]

    if use_gae:
        def body(gae, t):
            delta = (rewards[t] + gamma * values[t + 1] * masks[t + 1]
                     - values[t])
            gae = delta + gamma * gae_lambda * masks[t + 1] * gae
            if use_proper_time_limits:
                gae = gae * bad_masks[t + 1]
            return gae, gae + values[t]

        _, returns = jax.lax.scan(body, jnp.zeros_like(rewards[0]),
                                  jnp.arange(T - 1, -1, -1))
        return returns[::-1]
    else:
        def body(ret, t):
            ret = ret * gamma * masks[t + 1] + rewards[t]
            if use_proper_time_limits:
                ret = (ret * bad_masks[t + 1]
                       + (1.0 - bad_masks[t + 1]) * values[t])
            return ret, ret

        _, returns = jax.lax.scan(body, values[-1],
                                  jnp.arange(T - 1, -1, -1))
        return returns[::-1]
