"""Mesh-sharded PPO training step.

Wraps ``algo.ppo.train_iteration`` in a jit whose inputs carry NamedShardings:
env-batch leaves (env states, obs, hidden, masks, per-env stats) are sharded
over ``dp``; parameters and optimizer state follow ``mesh.param_spec`` (wide
attention projections over ``tp``, rest replicated). XLA then inserts the
gradient all-reduce (psum over dp) and the tp collectives over ICI — the
TPU-native equivalent of the reference's process fork + nn.DataParallel
(SURVEY.md section 2.5).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..algo import ppo as ppo_mod
from . import mesh as mesh_mod


def shard_train_state(ts: ppo_mod.TrainState, mesh: Mesh) -> ppo_mod.TrainState:
    """Place a TrainState onto the mesh: per-env leaves over dp, the rest
    per param_spec / replicated."""
    def put_batch(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))), tree)

    return ts.replace(
        params=mesh_mod.shard_params(ts.params, mesh),
        opt_state=jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(
                x, NamedSharding(mesh, mesh_mod.param_spec(p, x))),
            ts.opt_state),
        env_states=put_batch(ts.env_states),
        obs=put_batch(ts.obs),
        hxs=put_batch(ts.hxs),
        masks=put_batch(ts.masks),
        ep_return=put_batch(ts.ep_return),
        ep_return_env=put_batch(ts.ep_return_env),
        key=jax.device_put(ts.key, NamedSharding(mesh, P())),
        total_steps=jax.device_put(ts.total_steps, NamedSharding(mesh, P())),
    )


def make_sharded_iteration(cfg: Config, mesh: Mesh, gst_params=None):
    """Jitted full train step over the mesh. gst_params are replicated.

    Runs under ``jax.set_mesh(mesh)`` so the policy network can resolve the
    ambient mesh (cfg.network.use_ring_attention routes the human-human
    attention through the edge-partitioned ring over the 'tp' axis)."""
    if gst_params is not None:
        gst_params = mesh_mod.replicate(gst_params, mesh)

    @jax.jit
    def it(ts):
        return ppo_mod.train_iteration(cfg, ts, gst_params)

    def run(ts):
        with jax.set_mesh(mesh):
            return it(ts)

    return run


def init_sharded(cfg: Config, key, mesh: Mesh, gst_params=None):
    ts = ppo_mod.init_train_state(cfg, key, gst_params)
    return shard_train_state(ts, mesh)
