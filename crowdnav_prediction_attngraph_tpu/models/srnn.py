"""DS-RNN baseline policy (reference rl/networks/srnn_model.py:326-468).

Temporal-edge GRU + spatial-edge GRU + unmasked dot-product edge attention +
node GRU. Kept for ablation parity with the reference; the flagship model is
``policy_net.SelfAttnMergeSRNN``.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .policy_net import TorchGRUCell, orth2, zeros


def _masked_gru_scan(cell: TorchGRUCell, module, x, h, masks):
    """Run a GRU over time with done-mask hidden resets
    (srnn_model.py:35-105 semantics). x: (T, N, E, in); h: (N, E, H);
    masks: (T, N)."""

    def body(c, carry, inp):
        x_t, m_t = inp
        carry = carry * m_t[:, None, None]
        h_new = c(x_t, carry)
        return h_new, h_new

    return nn.scan(body, variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=0, out_axes=0)(
        cell, h, (x, masks))


class HumanHumanEdgeRNN(nn.Module):
    """Edge GRU (srnn_model.py:177-216): Linear(in->64) + ReLU + GRU(64->256)."""

    embedding_size: int = 64
    rnn_size: int = 256

    @nn.compact
    def __call__(self, inp, h, masks):
        x = nn.relu(nn.Dense(self.embedding_size, name="encoder_linear")(inp))
        cell = TorchGRUCell(self.rnn_size, name="gru")
        h_new, outputs = _masked_gru_scan(cell, self, x, h, masks)
        return outputs, h_new


class HumanNodeRNN(nn.Module):
    """Node GRU (srnn_model.py:108-174)."""

    embedding_size: int = 64
    rnn_size: int = 128
    output_size: int = 256

    @nn.compact
    def __call__(self, pos, h_temporal, h_spatial_other, h, masks):
        enc = nn.relu(nn.Dense(self.embedding_size, name="encoder_linear")(pos))
        h_edges = jnp.concatenate([h_temporal, h_spatial_other], axis=-1)
        att = nn.relu(nn.Dense(self.embedding_size,
                               name="edge_attention_embed")(h_edges))
        x = jnp.concatenate([enc, att], axis=-1)
        cell = TorchGRUCell(self.rnn_size, name="gru")
        h_new, outputs = _masked_gru_scan(cell, self, x, h, masks)
        return nn.Dense(self.output_size, name="output_linear")(outputs), h_new


class EdgeAttention(nn.Module):
    """Unmasked robot-human attention (srnn_model.py:219-323)."""

    attention_size: int = 64

    @nn.compact
    def __call__(self, h_temporal, h_spatials):
        # h_temporal: (T, N, 1, 256); h_spatials: (T, N, A, 256)
        A = h_spatials.shape[2]
        te = nn.Dense(self.attention_size, name="temporal_edge_layer")(h_temporal)
        sp = nn.Dense(self.attention_size, name="spatial_edge_layer")(h_spatials)
        attn = jnp.sum(te * sp, axis=-1) * (A / math.sqrt(self.attention_size))
        attn = jax.nn.softmax(attn, axis=-1)                    # (T, N, A)
        weighted = jnp.einsum("tna,tnac->tnc", attn, h_spatials)
        return weighted[:, :, None, :], attn


class SRNN(nn.Module):
    """Full DS-RNN base. Returns (value, actor_features, new hidden dict)."""

    cfg: Config

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], rnn_hxs, masks):
        cfg = self.cfg
        net = cfg.network
        T, N = masks.shape
        A = cfg.sim.max_human_num

        robot_node = obs["robot_node"].reshape(T, N, 1, -1)
        temporal_edges = obs["temporal_edges"].reshape(T, N, 1, -1)
        spatial_edges = obs["spatial_edges"].reshape(T, N, A, -1)

        h_nodes = rnn_hxs["human_node_rnn"]                  # (N, 1, 128)
        h_edges = rnn_hxs["human_human_edge_rnn"]            # (N, A+1, 256)

        out_temporal, h_temporal = HumanHumanEdgeRNN(
            net.human_human_edge_embedding_size, net.human_human_edge_rnn_size,
            name="edgeRNN_temporal")(temporal_edges, h_edges[:, 0:1], masks)
        out_spatial, h_spatial = HumanHumanEdgeRNN(
            net.human_human_edge_embedding_size, net.human_human_edge_rnn_size,
            name="edgeRNN_spatial")(spatial_edges, h_edges[:, 1:], masks)

        hidden_attn_weighted, _ = EdgeAttention(
            net.attention_size, name="attn")(out_temporal, out_spatial)

        nodes = nn.Dense(3, name="robot_linear", kernel_init=orth2,
                         bias_init=zeros)(robot_node)
        outputs, h_node_new = HumanNodeRNN(
            net.human_node_embedding_size, net.human_node_rnn_size,
            net.human_node_output_size, name="humanNodeRNN")(
                nodes, out_temporal, hidden_attn_weighted, h_nodes, masks)

        x = outputs[:, :, 0, :]
        h = net.human_node_output_size
        hc, ha = x, x
        for i in range(2):
            hc = jnp.tanh(nn.Dense(h, name=f"critic_{i}", kernel_init=orth2,
                                   bias_init=zeros)(hc))
            ha = jnp.tanh(nn.Dense(h, name=f"actor_{i}", kernel_init=orth2,
                                   bias_init=zeros)(ha))
        value = nn.Dense(1, name="critic_linear", kernel_init=orth2,
                         bias_init=zeros)(hc)
        new_hxs = {
            "human_node_rnn": h_node_new,
            "human_human_edge_rnn": jnp.concatenate([h_temporal, h_spatial],
                                                    axis=1),
        }
        return value, ha, new_hxs
