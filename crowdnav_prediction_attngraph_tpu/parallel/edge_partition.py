"""Edge-partitioned interaction-graph attention across the device mesh.

The reference has no scaling story beyond 16 processes on one host
(SURVEY.md section 2.5); BASELINE.json mandates a new capability: batched
interaction graphs (env-batch x agents) edge-partitioned across devices/hosts
with boundary agent features exchanged over ICI, overlapped with local
attention aggregation.

Mechanism: ring attention over the agent axis. Each device owns a shard of
agents (their queries AND their K/V features). Attention scores against
remote agents' K/V are accumulated with an online (flash-style) softmax while
K/V shards rotate around the ring via ``ppermute`` — device d computes the
local partial while the next shard is in flight, so for n devices each step
overlaps O(A_local^2) compute with O(A_local) communication. Per-device edge
work is (A/n)^2 * n = A^2/n: linear weak scaling in device count.

Exposed as a ``shard_map``-wrapped drop-in for the dense masked attention:
numerics match the dense path exactly (tests/test_edge_partition.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, mask, axis_name: str, scale: float):
    """Per-device body under shard_map.

    q: (rows, A_loc, H, hd) local queries
    k, v: (rows, A_loc, H, hd) local keys/values (rotating)
    mask: (rows, A_loc) local key validity (rotating)
    Returns (rows, A_loc, H, hd) attention outputs for the local agents.
    """
    n_dev = jax.lax.psum(1, axis_name)
    rows, A_loc, H, hd = q.shape

    # derive the init carry from q so it inherits the shard_map varying axis
    z = jnp.transpose(q[..., 0], (0, 2, 1)) * 0.0    # (rows, H, A_loc)
    m0 = z + NEG_INF
    l0 = z
    o0 = q * 0.0

    def step(carry, _):
        m, l, o, k_cur, v_cur, mask_cur = carry
        s = jnp.einsum("rqhd,rkhd->rhqk", q, k_cur) * scale
        s = jnp.where(mask_cur[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        o_new = o * jnp.transpose(corr, (0, 2, 1))[..., None] + \
            jnp.einsum("rhqk,rkhd->rqhd", p, v_cur)
        # rotate K/V/mask to the next device (halo exchange over ICI),
        # issued before the result of this chunk is needed again
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        mask_next = jax.lax.ppermute(mask_cur, axis_name, perm)
        return (m_new, l_new, o_new, k_next, v_next, mask_next), None

    (m, l, o, _, _, _), _ = jax.lax.scan(
        step, (m0, l0, o0, k, v, mask), None, length=n_dev)
    denom = jnp.transpose(l, (0, 2, 1))[..., None]
    return o / jnp.maximum(denom, 1e-30)


def edge_partitioned_attention(q, k, v, mask, num_heads: int,
                               mesh: Optional[Mesh] = None,
                               axis: str = "tp"):
    """Masked MHA with the agent axis sharded over ``axis`` of ``mesh``.

    q/k/v: (rows, A, D); mask: (rows, A). A must divide evenly by the axis
    size. Matches reference_masked_attention numerically.

    ``mesh=None`` resolves the ambient abstract mesh (callers run the train
    step under ``jax.set_mesh(mesh)``), letting the policy network route its
    human-human attention through the ring without threading a Mesh object
    through the module tree. The row axis is sharded over every other
    non-trivial mesh axis (dp), so the training batch stays distributed."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or axis not in mesh.axis_names:
            raise ValueError(
                "edge_partitioned_attention: no ambient mesh with axis "
                f"'{axis}' (run under jax.set_mesh)")
    rows, A, D = q.shape
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)
    n_dev = mesh.shape[axis]
    assert A % n_dev == 0, (A, n_dev)

    qh = q.reshape(rows, A, num_heads, hd)
    kh = k.reshape(rows, A, num_heads, hd)
    vh = v.reshape(rows, A, num_heads, hd)

    row_axes = tuple(n for n in mesh.axis_names
                     if n != axis and mesh.shape[n] > 1
                     and rows % mesh.shape[n] == 0)
    row_spec = row_axes if row_axes else None
    spec = P(row_spec, axis, None, None)
    out = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(row_spec, axis)),
        out_specs=spec,
    )(qh, kh, vh, mask)
    return out.reshape(rows, A, D)
