"""Functional policy API: act / get_value / evaluate_actions
(reference rl/networks/model.py:14-90) over the Flax base networks."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from . import distributions
from .policy_net import SelfAttnMergeSRNN, init_hidden, obs_to_dict
from .srnn import SRNN


class PolicyHead(nn.Module):
    """Base network + DiagGaussian action head (model.py:16-42)."""

    cfg: Config

    def setup(self):
        if self.cfg.robot.policy == "selfAttn_merge_srnn":
            self.base = SelfAttnMergeSRNN(self.cfg, name="base")
        elif self.cfg.robot.policy == "srnn":
            self.base = SRNN(self.cfg, name="base")
        else:
            raise NotImplementedError(self.cfg.robot.policy)
        self.dist = distributions.DiagGaussianParams(2, name="dist")

    def __call__(self, obs, rnn_h, masks):
        value, actor_features, h_new = self.base(obs, rnn_h, masks)
        mean, logstd = self.dist(actor_features)
        return value, mean, logstd, h_new


def make_policy(cfg: Config) -> PolicyHead:
    return PolicyHead(cfg)


def _update_cfg(cfg: Config) -> Config:
    """Config for gradient-path forwards: with pallas_scope='rollout' the
    fused kernel is scoped to inference and the PPO update runs the XLA
    einsum path (identical math, identical param tree — the pallas branch
    materializes the same Dense params)."""
    net = cfg.network
    if net.use_pallas_attention and \
            getattr(net, "pallas_scope", "all") == "rollout":
        cfg = cfg.replace(network=net.__class__(
            **{**net.__dict__, "use_pallas_attention": False}))
    return cfg


def init_params(cfg: Config, key, example_obs: Dict[str, jnp.ndarray]):
    """Initialize parameters from a [N, ...] observation dict."""
    model = make_policy(cfg)
    n = example_obs["robot_node"].shape[0]
    obs_t = jax.tree.map(lambda x: x[None], example_obs)      # add T=1
    h = init_hidden(cfg, n)
    masks = jnp.ones((1, n))
    return model.init(key, obs_t, h, masks)


def act(cfg: Config, params, obs: Dict[str, jnp.ndarray], rnn_h, masks, key,
        deterministic: bool = False):
    """Rollout-time forward (model.py:56-74). obs is [N, ...]; masks [N]."""
    model = make_policy(cfg)
    obs_t = jax.tree.map(lambda x: x[None], obs)
    value, mean, logstd, h_new = model.apply(params, obs_t, rnn_h,
                                             masks[None, :])
    value, mean, logstd = value[0], mean[0], logstd[0]
    if deterministic:
        action = distributions.mode(mean)
    else:
        action = distributions.sample(key, mean, logstd)
    log_prob = distributions.log_prob(mean, logstd, action)
    return value, action, log_prob, h_new


def get_value(cfg: Config, params, obs, rnn_h, masks):
    model = make_policy(cfg)
    obs_t = jax.tree.map(lambda x: x[None], obs)
    value, _, _, _ = model.apply(params, obs_t, rnn_h, masks[None, :])
    return value[0]


def evaluate_actions(cfg: Config, params, obs: Dict[str, jnp.ndarray], rnn_h,
                     masks, actions):
    """Training-time forward over [T, N, ...] (model.py:82-90).
    Returns (values [T,N,1], log_probs [T,N,1], entropy scalar)."""
    model = make_policy(_update_cfg(cfg))
    value, mean, logstd, _ = model.apply(params, obs, rnn_h, masks)
    log_probs = distributions.log_prob(mean, logstd, actions)
    entropy = jnp.mean(distributions.entropy(logstd))
    return value, log_probs, entropy
