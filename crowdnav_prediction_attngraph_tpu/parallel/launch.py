"""Multi-host launch path (jax.distributed bootstrap + global-mesh init).

The reference has no multi-host story at all (its parallelism is 16 forked
env processes on one box, SURVEY.md section 2.5); this is new capability: every
host runs the same fused train program under ``jax.distributed``, the mesh
spans all hosts' chips, the env batch is sharded over the global ``dp`` axis,
and XLA's gradient all-reduce rides ICI within a slice / DCN across slices.

Usage (same command on every host):
  python -m crowdnav_prediction_attngraph_tpu.train \
      --multihost --coordinator-address host0:1234 \
      --num-hosts 4 --process-id $HOST_INDEX ...

On Cloud TPU the three flags can be omitted (jax.distributed.initialize
auto-detects from the TPU metadata server).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..algo import ppo as ppo_mod
from . import mesh as mesh_mod


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Bootstrap the jax.distributed runtime; returns this process's index.

    Safe to call when already initialized (no-op)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    return jax.process_index()


def global_mesh(tp: int = 1) -> Mesh:
    """Mesh over ALL devices across hosts: ('dp', 'tp')."""
    return mesh_mod.make_mesh(len(jax.devices()), tp=tp)


def train_state_shardings(cfg: Config, mesh: Mesh, gst_params=None):
    """NamedSharding pytree for a TrainState: env-batch leaves over dp,
    params/opt_state per mesh.param_spec, scalars/keys replicated.
    Built from jax.eval_shape — no arrays are materialized."""
    shape_ts = jax.eval_shape(
        lambda k: ppo_mod.init_train_state(cfg, k, gst_params),
        jax.random.key(0))

    def spec_of(path, leaf):
        names = [getattr(k, "name", getattr(k, "key", "")) for k in path]
        top = names[0] if names else ""
        if top in ("params", "opt_state"):
            return mesh_mod.param_spec(path[1:], leaf)
        if top in ("env_states", "obs", "hxs", "masks", "ep_return",
                   "ep_return_env"):
            return P("dp")
        return P()  # key, total_steps

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_of(path, leaf)), shape_ts)


def init_sharded_global(cfg: Config, key, mesh: Mesh, gst_params=None
                        ) -> ppo_mod.TrainState:
    """Initialize the TrainState directly into its global sharding.

    Under multi-host, host-local arrays cannot be device_put onto a global
    mesh; instead init runs inside jit with out_shardings so every host
    materializes exactly its addressable shards of the global TrainState.
    """
    shardings = train_state_shardings(cfg, mesh, gst_params)
    init = jax.jit(lambda k: ppo_mod.init_train_state(cfg, k, gst_params),
                   out_shardings=shardings)
    return init(key)


def make_global_iteration(cfg: Config, mesh: Mesh, gst_params=None):
    """Jitted train iteration whose TrainState output keeps the global
    shardings (donated input avoids a full-state copy per step)."""
    if gst_params is not None:
        # replicate via jit-of-constant (device_put cannot target
        # non-addressable devices under multi-host)
        rep = jax.tree.map(lambda x: NamedSharding(mesh, P()), gst_params)
        gst_params = jax.jit(lambda: gst_params, out_shardings=rep)()
    shardings = train_state_shardings(cfg, mesh, gst_params)

    it = jax.jit(lambda ts: ppo_mod.train_iteration(cfg, ts, gst_params),
                 out_shardings=(shardings, None), donate_argnums=0)

    def run(ts):
        # ambient mesh lets cfg.network.use_ring_attention shard the agent
        # axis (parallel/edge_partition.py) inside the same program
        with jax.set_mesh(mesh):
            return it(ts)

    return run
