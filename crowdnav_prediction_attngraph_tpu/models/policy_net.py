"""The attention interaction-graph policy network in Flax.

TPU-native re-design of the reference ``selfAttn_merge_SRNN``
(rl/networks/selfAttn_srnn_temp_node.py:287-449): human-human multi-head
self-attention over spatial edges, robot-human dot-product attention, and a
GRU over time. All ops are batched dense [T, N, A, ·] tensors — the MXU sees
large fused GEMMs; variable human counts are cumsum-sentinel padding masks
exactly like the reference (selfAttn_srnn_temp_node.py:49-60).

Parameter names/shapes mirror the PyTorch modules one-to-one so the shipped
checkpoints (trained_models/*/checkpoints/*.pt) can be imported and verified
per-layer (see utils/torch_import.py). Torch ``Linear.weight`` is (out, in);
flax kernels are (in, out) — the importer transposes.

Time recurrence: the reference splits training sequences at done boundaries to
re-mask GRU state (srnn_model.py:35-105); because masks are {0,1} this is
identical to multiplying the hidden state by mask[t] before every GRU step,
which is what the ``lax.scan`` here does.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config

orth2 = nn.initializers.orthogonal(math.sqrt(2.0))
orth1 = nn.initializers.orthogonal(1.0)
zeros = nn.initializers.zeros


def create_attn_mask(each_seq_len, rows: int, max_human_num: int):
    """Sentinel-cumsum padding mask (selfAttn_srnn_temp_node.py:49-60).

    each_seq_len: (rows,) int — number of valid humans per row.
    Returns (rows, max_human_num) bool, True = valid (attend).
    """
    sentinel = jax.nn.one_hot(each_seq_len, max_human_num + 1, dtype=jnp.float32)
    mask = jnp.logical_not(jnp.cumsum(sentinel, axis=-1))
    return mask[:, :-1]


class TorchGRUCell(nn.Module):
    """GRU cell with torch ``nn.GRU`` gate layout/semantics so reference
    checkpoints load directly. Weights: w_ih (in, 3H), w_hh (H, 3H) with gate
    order [r, z, n]; orthogonal init, zero bias (srnn_model.py:26-30)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, h):
        in_dim = x.shape[-1]
        H = self.hidden_size
        w_ih = self.param("w_ih", orth1, (in_dim, 3 * H))
        w_hh = self.param("w_hh", orth1, (H, 3 * H))
        b_ih = self.param("b_ih", zeros, (3 * H,))
        b_hh = self.param("b_hh", zeros, (3 * H,))
        gi = x @ w_ih + b_ih
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class SpatialEdgeSelfAttn(nn.Module):
    """Human-human MHA over spatial edges (selfAttn_srnn_temp_node.py:5-91).

    Input (rows, A, input_size) -> (rows, A, 512). ``attn_mask`` (rows, A)
    True = valid key. Reproduces torch's double projection: separate q/k/v
    Dense layers feeding a standard MultiheadAttention (with its own packed
    in_proj) — required for checkpoint parity."""

    input_size: int
    attn_size: int = 512
    num_heads: int = 8
    use_pallas: bool = False
    pallas_dtype: str = "bfloat16"   # "float32" for strict parity
    use_ring: bool = False           # edge-partitioned ring attention
    ring_axis: str = "tp"

    @nn.compact
    def __call__(self, inp, attn_mask):
        rows, A, _ = inp.shape
        D, nh = self.attn_size, self.num_heads
        hd = D // nh

        x = nn.relu(nn.Dense(128, name="embed_0")(inp))
        x = nn.relu(nn.Dense(D, name="embed_1")(x))

        # torch MultiheadAttention packed projections
        w_in = self.param("mha_in_proj_weight",
                          nn.initializers.xavier_uniform(), (D, 3 * D))
        b_in = self.param("mha_in_proj_bias", zeros, (3 * D,))

        # the fused kernel only lowers on real TPUs; elsewhere (CPU tests,
        # virtual-mesh dryruns) the identical-math einsum path below runs,
        # keeping strict f32 parity and avoiding interpret-mode slowness.
        # Exception: float32 strict-parity configs DO run the kernel in
        # interpret mode off-TPU — that is how test_pallas_attention proves
        # kernel-through-policy parity on CPU.
        use_pallas = self.use_pallas and (
            jax.default_backend() == "tpu" or self.pallas_dtype == "float32")
        if use_pallas:
            # ONE fused Pallas kernel: QKV projection + masked MHA + out
            # projection, VMEM-resident. The reference's double projection
            # (Dense then torch in_proj) folds into a single (D, 3D) matmul:
            # x@Wq@Win_q + (bq@Win_q + bin_q). Param tree is identical to the
            # XLA path — the Dense calls below only materialize the params
            # (their outputs are unused and DCE'd).
            from ..ops.masked_attention import fused_graph_attention
            for name in ("q_linear", "k_linear", "v_linear", "mha_out_proj"):
                nn.Dense(D, name=name)(x[:1, :1])
            pv = self.variables["params"]
            folded_w, folded_b = [], []
            for i, name in enumerate(("q_linear", "k_linear", "v_linear")):
                w, b = pv[name]["kernel"], pv[name]["bias"]
                w_slice = w_in[:, i * D:(i + 1) * D]
                b_slice = b_in[i * D:(i + 1) * D]
                folded_w.append(w @ w_slice)
                folded_b.append(b @ w_slice + b_slice)
            w_qkv = jnp.concatenate(folded_w, axis=1)
            b_qkv = jnp.concatenate(folded_b)
            wo = pv["mha_out_proj"]["kernel"]
            bo = pv["mha_out_proj"]["bias"]
            dtype = jnp.float32 if self.pallas_dtype == "float32" \
                else jnp.bfloat16
            return fused_graph_attention(
                x, attn_mask, w_qkv, b_qkv, wo, bo, nh,
                compute_dtype=dtype,
                interpret=jax.default_backend() == "cpu")

        q = nn.Dense(D, name="q_linear")(x)
        k = nn.Dense(D, name="k_linear")(x)
        v = nn.Dense(D, name="v_linear")(x)
        q = q @ w_in[:, :D] + b_in[:D]
        k = k @ w_in[:, D:2 * D] + b_in[D:2 * D]
        v = v @ w_in[:, 2 * D:] + b_in[2 * D:]

        if self.use_ring:
            # agent axis edge-partitioned over the mesh ring (ppermute halo
            # exchange + online softmax); resolves the ambient mesh set by
            # jax.set_mesh in the sharded train step. Falls back to the dense
            # einsum when no mesh (or a trivial ring axis) is active, so the
            # same config runs single-device.
            am = jax.sharding.get_abstract_mesh()
            if (am is not None and self.ring_axis in am.axis_names
                    and am.shape[self.ring_axis] > 1
                    and A % am.shape[self.ring_axis] == 0):
                from ..parallel.edge_partition import edge_partitioned_attention
                out = edge_partitioned_attention(q, k, v, attn_mask, nh,
                                                 axis=self.ring_axis)
                return nn.Dense(D, name="mha_out_proj")(out)

        qh = q.reshape(rows, A, nh, hd)
        kh = k.reshape(rows, A, nh, hd)
        vh = v.reshape(rows, A, nh, hd)
        logits = jnp.einsum("rqhd,rkhd->rhqk", qh, kh) / math.sqrt(hd)
        logits = jnp.where(attn_mask[:, None, None, :], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("rhqk,rkhd->rqhd", w, vh).reshape(rows, A, D)
        out = nn.Dense(D, name="mha_out_proj")(out)
        return out


class EdgeAttentionM(nn.Module):
    """Robot-human single-head dot-product attention
    (selfAttn_srnn_temp_node.py:95-223). Temperature = num_edges / sqrt(64)."""

    attention_size: int = 64

    @nn.compact
    def __call__(self, h_temporal, h_spatials, attn_mask):
        # h_temporal: (rows, 1, 256); h_spatials: (rows, A, 256); mask (rows, A)
        rows, A, _ = h_spatials.shape
        te = nn.Dense(self.attention_size, name="temporal_edge_layer")(h_temporal)
        sp = nn.Dense(self.attention_size, name="spatial_edge_layer")(h_spatials)
        attn = jnp.sum(te * sp, axis=-1)                       # (rows, A)
        attn = attn * (A / math.sqrt(self.attention_size))
        attn = jnp.where(attn_mask, attn, -1e9)                # masked_fill(attn_mask==0, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        weighted = jnp.einsum("ra,rac->rc", attn, h_spatials)  # (rows, 256)
        return weighted[:, None, :], attn


class EndRNN(nn.Module):
    """Node GRU with done-mask resets (selfAttn_srnn_temp_node.py:225-285)."""

    rnn_size: int = 128
    output_size: int = 256
    embedding_size: int = 64

    @nn.compact
    def __call__(self, robot_s, h_spatial_other, h, masks):
        # robot_s: (T, N, 1, 256); h_spatial_other: (T, N, 1, 256)
        # h: (N, 1, rnn); masks: (T, N)
        enc = nn.relu(nn.Dense(self.embedding_size, name="encoder_linear")(robot_s))
        att = nn.relu(nn.Dense(self.embedding_size,
                               name="edge_attention_embed")(h_spatial_other))
        x = jnp.concatenate([enc, att], axis=-1)              # (T, N, 1, 128)
        gru = TorchGRUCell(self.rnn_size, name="gru")

        def body(cell, h_t, inp):
            x_t, m_t = inp
            h_t = h_t * m_t[:, None, None]   # done-mask hidden reset
            h_new = cell(x_t, h_t)
            return h_new, h_new

        h_final, outputs = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0)(gru, h, (x, masks))
        outputs = nn.Dense(self.output_size, name="output_linear")(outputs)
        return outputs, h_final


class SelfAttnMergeSRNN(nn.Module):
    """The full policy base (selfAttn_srnn_temp_node.py:287-449).

    __call__ consumes time-major obs [T, N, ...] and returns
    (value [T, N, 1], actor_features [T, N, 256], new_hidden [N, 1, 128]).
    """

    cfg: Config

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray], rnn_hxs, masks):
        cfg = self.cfg
        net = cfg.network
        T, N = masks.shape
        A = cfg.sim.max_human_num
        rows = T * N
        rnn_h = rnn_hxs["human_node_rnn"]                      # (N, 1, 128)

        robot_node = obs["robot_node"].reshape(T, N, 1, -1)
        temporal_edges = obs["temporal_edges"].reshape(T, N, 1, -1)
        spatial_edges = obs["spatial_edges"].reshape(rows, A, -1)

        if net.sort_humans:
            detected = obs["detected_human_num"].reshape(rows).astype(jnp.int32)
            attn_mask = create_attn_mask(detected, rows, A)
        else:
            attn_mask = obs["visible_masks"].reshape(rows, A)
            # dummy-human fallback when nothing is visible
            # (selfAttn_srnn_temp_node.py:351-356, 383)
            none_visible = ~jnp.any(attn_mask, axis=-1, keepdims=True)
            attn_mask = attn_mask.at[:, 0].set(
                attn_mask[:, 0] | none_visible[:, 0])
        attn_mask = attn_mask.astype(bool)

        robot_states = jnp.concatenate([temporal_edges, robot_node], axis=-1)
        robot_states = nn.relu(
            nn.Dense(256, name="robot_linear", kernel_init=orth2,
                     bias_init=zeros)(robot_states))            # (T, N, 1, 256)

        if net.use_self_attn:
            spatial_attn_out = SpatialEdgeSelfAttn(
                input_size=cfg.spatial_edge_dim, attn_size=net.attn_size,
                num_heads=net.num_attn_heads,
                use_pallas=net.use_pallas_attention,
                pallas_dtype=net.pallas_dtype,
                use_ring=net.use_ring_attention,
                ring_axis=net.ring_axis, name="spatial_attn")(
                    spatial_edges, attn_mask)
            output_spatial = nn.relu(
                nn.Dense(256, name="spatial_linear", kernel_init=orth2,
                         bias_init=zeros)(spatial_attn_out))    # (rows, A, 256)
        else:
            x = nn.relu(nn.Dense(128, name="spatial_linear_0", kernel_init=orth2,
                                 bias_init=zeros)(spatial_edges))
            output_spatial = nn.relu(
                nn.Dense(256, name="spatial_linear_1", kernel_init=orth2,
                         bias_init=zeros)(x))

        if net.use_hr_attn:
            hidden_attn_weighted, _ = EdgeAttentionM(
                attention_size=net.attention_size, name="attn")(
                    robot_states.reshape(rows, 1, 256), output_spatial,
                    attn_mask)
            hidden_attn_weighted = hidden_attn_weighted.reshape(T, N, 1, 256)
        else:
            hidden_attn_weighted = jnp.mean(
                output_spatial, axis=1, keepdims=True).reshape(T, N, 1, 256)

        outputs, h_new = EndRNN(
            rnn_size=net.human_node_rnn_size,
            output_size=net.human_node_output_size,
            embedding_size=net.human_node_embedding_size,
            name="humanNodeRNN")(robot_states, hidden_attn_weighted, rnn_h,
                                 masks)

        x = outputs[:, :, 0, :]                                 # (T, N, 256)

        h = net.human_node_output_size
        hidden_critic = x
        hidden_actor = x
        for i in range(2):
            hidden_critic = jnp.tanh(nn.Dense(
                h, name=f"critic_{i}", kernel_init=orth2, bias_init=zeros)(
                    hidden_critic))
            hidden_actor = jnp.tanh(nn.Dense(
                h, name=f"actor_{i}", kernel_init=orth2, bias_init=zeros)(
                    hidden_actor))
        value = nn.Dense(1, name="critic_linear", kernel_init=orth2,
                         bias_init=zeros)(hidden_critic)
        # edge-RNN hidden is unused by this model and re-zeroed every call
        # (selfAttn_srnn_temp_node.py:390-395)
        new_hxs = {
            "human_node_rnn": h_new,
            "human_human_edge_rnn": jnp.zeros_like(
                rnn_hxs["human_human_edge_rnn"]),
        }
        return value, hidden_actor, new_hxs


def init_hidden(cfg: Config, n_envs: int):
    """Fresh recurrent state (storage.py:26-34). The edge-RNN slot exists for
    the SRNN baseline; the selfAttn model re-zeros it every call
    (selfAttn_srnn_temp_node.py:390-395)."""
    return {
        "human_node_rnn": jnp.zeros(
            (n_envs, 1, cfg.network.human_node_rnn_size)),
        "human_human_edge_rnn": jnp.zeros(
            (n_envs, cfg.sim.max_human_num + 1,
             cfg.network.human_human_edge_rnn_size)),
    }


def obs_to_dict(obs) -> Dict[str, jnp.ndarray]:
    """Observation struct -> network input dict (adds no copies)."""
    return {
        "robot_node": obs.robot_node,
        "temporal_edges": obs.temporal_edges,
        "spatial_edges": obs.spatial_edges,
        "visible_masks": obs.visible_masks,
        "detected_human_num": obs.detected_human_num,
    }
