"""Device-mesh construction and sharding rules.

The reference's entire distributed story is 16 forked env processes + pipes +
nn.DataParallel (SURVEY.md section 2.5). The TPU-native replacement: one fused
XLA program per host, with the env batch sharded over a ``dp`` mesh axis (PPO
data parallelism — XLA inserts the gradient all-reduce over ICI) and the wide
attention projections optionally sharded over a ``tp`` axis (tensor
parallelism for the 512-dim human-human attention stack).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % tp == 0, (n, tp)
    dp = n // tp
    dev = mesh_utils.create_device_mesh((dp, tp), devices=devices[:n])
    return Mesh(dev, ("dp", "tp"))


def param_spec(path, leaf) -> P:
    """Tensor-parallel layout for the policy params: shard the 512-wide
    attention projections column-wise over ``tp``; replicate the rest."""
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    if "spatial_attn" in names and hasattr(leaf, "ndim") and leaf.ndim == 2 \
            and leaf.shape[-1] % 512 == 0:
        return P(None, "tp")
    return P()


def batch_spec(leaf) -> P:
    """Env-batch leaves: shard the leading axis over ``dp``."""
    return P("dp")


def shard_params(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, param_spec(path, leaf))), params)


def shard_batch(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P("dp"))), tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)
