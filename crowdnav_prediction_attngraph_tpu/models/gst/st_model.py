"""Gumbel Social Transformer trajectory predictor in Flax.

TPU-native re-implementation of the reference GST stack
(gst_updated/src/gumbel_social_transformer/): spatial masked attention per
timestep, an LSTM temporal encoder, and a recursive Gaussian decoder with
edge evolution — the decoder loop is a ``lax.scan`` so the 5 sequential
GST+LSTM evaluations stay fused in one XLA program.

Two faithfulness-critical details (SURVEY.md "hard parts" #2):
  * the attention float-mask is applied multiplicatively AFTER softmax and
    the weights renormalized (+1e-10) — NOT -inf masking (mha.py:236-242);
  * the edge multinomial is masked and renormalized the same way
    (edge_selector_no_ghost.py:85-87).

Shipped checkpoints use the full-connectivity configuration
(spatial_num_heads_edges=0 — no edge selector, gumbel_social_transformer.py:83-86),
faster_lstm, one encoder layer (SURVEY.md section 2.6); the EdgeSelector is
implemented for completeness and GST training.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

# Unroll the (length-5) observation LSTM scan and the (length-4) decoder
# scan. Unrolling wins ~2 ms on the standalone 30-step rollout but the env
# var allows A/B-ing it inside the full fused train program, where XLA's
# scheduling of the bigger code can differ.
UNROLL = os.environ.get("GST_SCAN_UNROLL", "1") != "0"

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import PredConfig


def masked_renorm_attention(q, k, v, float_mask, num_heads: int,
                            compute_dtype=jnp.float32):
    """VanillaMultiheadAttention core with float-mask renormalization
    (mha.py:221-246). q: (B, L, D); k/v: (B, S, D); float_mask: (B, L, S)
    target x neighbor. Returns (attn_out (B, L, H, hd), weights (B, H, L, S)).

    ``compute_dtype=bf16`` runs the two einsums at 2x MXU rate with f32
    accumulation; softmax and the renormalization stay f32."""
    B, L, D = q.shape
    hd = D // num_heads
    qh = q.reshape(B, L, num_heads, hd).astype(compute_dtype)
    kh = k.reshape(B, k.shape[1], num_heads, hd).astype(compute_dtype)
    vh = v.reshape(B, v.shape[1], num_heads, hd).astype(compute_dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    w = jax.nn.softmax(logits, axis=-1)
    w = w * float_mask[:, None, :, :]
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-10)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(compute_dtype), vh,
                     preferred_element_type=jnp.float32)
    return out, w


def _dense(mod, features: int, name: str, cd):
    """nn.Dense whose matmul runs in the compute dtype but whose output is
    returned in f32 (mixed-precision inference; identity when cd is f32)."""
    if cd == jnp.float32:
        return nn.Dense(features, name=name)
    layer = nn.Dense(features, name=name, dtype=cd)
    return lambda x: layer(x).astype(jnp.float32)


class NodeEncoderLayer(nn.Module):
    """Pre-norm masked MHA + FFN (node_encoder_layer_no_ghost.py:25-67;
    ghost=True appends a zero "attend-to-nothing" key/value column,
    node_encoder_layer_ghost.py:50-58)."""

    d_model: int = 64
    nhead: int = 8
    dim_feedforward: int = 128
    dropout: float = 0.1
    ghost: bool = False
    matmul_dtype: str = "f32"

    @nn.compact
    def __call__(self, x, adj_mask, attn_mask, deterministic: bool = True):
        # x: (B, A, d); adj_mask: (B, A, A[+1]) float; attn_mask: (B, A, A)
        B, A, D = x.shape
        cd = jnp.bfloat16 if self.matmul_dtype == "bf16" else jnp.float32
        ped_mask = (jnp.sum(attn_mask, axis=-1) > 0).astype(x.dtype)[..., None]
        # the reference REASSIGNS x to the normed+masked value before the
        # residual (node_encoder_layer_no_ghost.py:48-49,59) — the skip
        # connection is around the attention only, from the normed input
        h = nn.LayerNorm(name="norm_node")(x)
        h = h * ped_mask
        x = h
        kv = h
        if self.ghost:
            kv = jnp.concatenate([h, jnp.zeros((B, 1, D), h.dtype)], axis=1)
        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (D, 3 * D))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * D,))
        w_c = w_in.astype(cd)
        h_c, kv_c = h.astype(cd), kv.astype(cd)
        q = jnp.dot(h_c, w_c[:, :D],
                    preferred_element_type=jnp.float32) + b_in[:D]
        k = jnp.dot(kv_c, w_c[:, D:2 * D],
                    preferred_element_type=jnp.float32) + b_in[D:2 * D]
        v = jnp.dot(kv_c, w_c[:, 2 * D:],
                    preferred_element_type=jnp.float32) + b_in[2 * D:]
        out_h, weights = masked_renorm_attention(q, k, v, adj_mask, self.nhead,
                                                 compute_dtype=cd)
        out = _dense(self, D, "out_proj", cd)(out_h.reshape(B, A, D))
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        x = x + out
        h2 = nn.LayerNorm(name="norm1_node")(x)
        h2 = nn.relu(_dense(self, self.dim_feedforward, "linear1", cd)(h2))
        h2 = nn.Dropout(self.dropout, deterministic=deterministic)(h2)
        h2 = _dense(self, D, "linear2", cd)(h2)
        h2 = nn.Dropout(self.dropout, deterministic=deterministic)(h2)
        return x + h2, weights


def gumbel_softmax(key, logits, tau: float, hard: bool, eps: float = 1e-10):
    """Straight-through Gumbel softmax (gst utils.py:18-41)."""
    u = jax.random.uniform(key, logits.shape)
    g = -jnp.log(eps - jnp.log(u + eps))
    y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        y_hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1),
                                logits.shape[-1], dtype=y_soft.dtype)
        return y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    return y_soft


class EdgeSelector(nn.Module):
    """Sparse-edge sampler (edge_selector_no_ghost.py:26-97; ghost=True adds
    an always-available zero neighbor so a target may attend to nothing,
    edge_selector_ghost.py:56-97)."""

    d_motion: int = 2
    d_model: int = 64
    nhead: int = 4
    dropout: float = 0.1
    ghost: bool = False

    @nn.compact
    def __call__(self, x, A, attn_mask, tau: float, hard: bool, key,
                 deterministic: bool = True):
        B, nnode, d_motion = x.shape
        D, nh = self.d_model, self.nhead
        hd = D // nh
        ped_mask = (jnp.sum(attn_mask, axis=-1) > 0).astype(x.dtype)[..., None]
        x = x * ped_mask
        if self.ghost:
            x_aug = jnp.concatenate(
                [x, jnp.zeros((B, 1, d_motion), x.dtype)], axis=1)
            Am = A * jnp.transpose(attn_mask, (0, 2, 1))[..., None]
            Am = jnp.concatenate(
                [Am, jnp.zeros((B, 1, nnode, d_motion), A.dtype)], axis=1)
            # ghost column always attendable (edge_selector_ghost.py:77-78)
            attn_mask = jnp.concatenate(
                [attn_mask, jnp.ones((B, nnode, 1), attn_mask.dtype)], axis=2)
        else:
            x_aug = x
            Am = A * jnp.transpose(attn_mask, (0, 2, 1))[..., None]
        n_nbr = x_aug.shape[1]
        x_nbr = jnp.broadcast_to(x_aug[:, :, None, :],
                                 (B, n_nbr, nnode, d_motion))
        x_tgt = jnp.broadcast_to(x[:, None, :, :], (B, n_nbr, nnode, d_motion))
        aug = jnp.concatenate([x_nbr, x_tgt, Am], axis=-1)
        aug = nn.Dense(D, name="augmented_edge_embedding")(aug)
        aug = nn.LayerNorm(name="norm_augmented_edge")(aug)
        # (B, neighbor, target, D) -> rows of neighbors per target
        rows = jnp.transpose(aug, (0, 2, 1, 3)).reshape(B * nnode, n_nbr, D)

        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (D, 3 * D))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * D,))
        q = rows @ w_in[:, :D] + b_in[:D]
        k = rows @ w_in[:, D:2 * D] + b_in[D:2 * D]
        v = rows @ w_in[:, 2 * D:] + b_in[2 * D:]
        nbr_mask = (attn_mask[:, :, :, None] * attn_mask[:, :, None, :]) \
            .reshape(B * nnode, n_nbr, n_nbr)
        heads, _ = masked_renorm_attention(q, k, v, nbr_mask, nh)
        # out_proj exists in the torch module but its per-head raw outputs are
        # what EdgeSelector consumes (mha.py:247-253); keep params for import
        _ = nn.Dense(D, name="out_proj")(heads.reshape(B * nnode, n_nbr, D))
        heads = heads.reshape(B, nnode, n_nbr, nh, hd)
        heads = jnp.transpose(heads, (0, 1, 3, 2, 4))  # (B, tgt, nh, nbr, hd)
        z = nn.relu(nn.Dense(hd, name="linear1")(heads))
        z = nn.Dropout(self.dropout, deterministic=deterministic)(z)
        logit = nn.Dense(1, name="linear2")(z)[..., 0]  # (B, tgt, nh, nbr)
        multinomial = jax.nn.softmax(logit, axis=-1)
        multinomial = multinomial * attn_mask[:, :, None, :]
        multinomial = multinomial / (jnp.sum(multinomial, axis=-1,
                                             keepdims=True) + 1e-10)
        sampled = gumbel_softmax(key, jnp.log(multinomial + 1e-10), tau, hard)
        return multinomial, sampled


class GumbelSocialTransformer(nn.Module):
    """Spatial encoder (gumbel_social_transformer.py:43-96)."""

    cfg: PredConfig

    @nn.compact
    def __call__(self, x, A, attn_mask, tau: float, hard: bool,
                 key=None, deterministic: bool = True):
        cfg = self.cfg
        B, nnode = attn_mask.shape[0], attn_mask.shape[1]
        if cfg.ghost and cfg.spatial_num_heads_edges == 0:
            # gumbel_social_transformer.py:10-11
            raise ValueError("Full connectivity conflicts with ghost mode")
        if cfg.spatial_num_heads_edges != 0:
            multinomial, sampled = EdgeSelector(
                cfg.motion_dim, cfg.embedding_size,
                nhead=cfg.spatial_num_heads_edges, ghost=cfg.ghost,
                name="edge_selector")(x, A, attn_mask, tau, hard, key,
                                      deterministic)
        else:
            # full connectivity (gumbel_social_transformer.py:83-86)
            sampled = jnp.ones((B, nnode, 1, nnode)) * attn_mask[:, :, None, :]
            multinomial = sampled
        adj = jnp.sum(sampled, axis=2)                  # (B, tgt, nbr[+ghost])
        h = nn.Dense(cfg.embedding_size, name="node_embedding")(x)
        weights = []
        for i in range(cfg.spatial_num_layers):
            h, w = NodeEncoderLayer(
                cfg.embedding_size, cfg.spatial_num_heads,
                cfg.dim_feedforward, ghost=cfg.ghost,
                matmul_dtype=cfg.matmul_dtype, name=f"layer_{i}")(
                    h, adj, attn_mask, deterministic)
            weights.append(w)
        return h, sampled, multinomial, jnp.stack(weights)


def lstm_step(params, x, h, c, compute_dtype=jnp.float32):
    """torch nn.LSTM cell semantics; gate order [i, f, g, o]. The two gate
    matmuls run in ``compute_dtype`` with f32 accumulation; gate nonlinearity
    and cell state stay f32."""
    cd = compute_dtype
    gi = jnp.dot(x.astype(cd), params["w_ih"].astype(cd),
                 preferred_element_type=jnp.float32) + params["b_ih"]
    gh = jnp.dot(h.astype(cd), params["w_hh"].astype(cd),
                 preferred_element_type=jnp.float32) + params["b_hh"]
    i, f, g, o = jnp.split(gi + gh, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


class STModel(nn.Module):
    """st_model (st_model.py:115-455): spatial -> temporal -> recursive decode.

    __call__ inputs (batch-of-graphs layout of the reference):
      x: (B, obs_len, A, 2)  pedestrian displacements
      A_edges: (B, obs_len, A, A, 2) relative positions (i - j)
      attn_mask: (B, obs_len, A, A) float, [neighbor, target] orientation as
                 produced by the wrapper (st_model permutes it, st_model.py:321)
      loss_mask_rel: (B, A, obs_len + pred_len)
    Returns ((mu, sx, sy, corr), x_sample_pred) with mu (B, pred_len, A, 2).
    """

    cfg: PredConfig

    @nn.compact
    def __call__(self, x, A_edges, attn_mask, loss_mask_rel, tau: float,
                 hard: bool, sampling: bool, key=None,
                 deterministic: bool = True):
        cfg = self.cfg
        B, obs_len, A, _ = x.shape
        H = cfg.lstm_hidden_size
        cd = jnp.bfloat16 if cfg.matmul_dtype == "bf16" else jnp.float32

        gst = GumbelSocialTransformer(cfg, name="gst")
        lstm_params = {
            "w_ih": self.param("lstm_w_ih", nn.initializers.xavier_uniform(),
                               (cfg.embedding_size, 4 * H)),
            "w_hh": self.param("lstm_w_hh", nn.initializers.orthogonal(),
                               (H, 4 * H)),
            "b_ih": self.param("lstm_b_ih", nn.initializers.zeros, (4 * H,)),
            "b_hh": self.param("lstm_b_hh", nn.initializers.zeros, (4 * H,)),
        }
        hidden2pos = nn.Dense(cfg.output_dim, name="hidden2pos")

        if key is None:
            key = jax.random.key(0)
        k_obs, k_dec, k_sample = jax.random.split(key, 3)

        # --- observation period: spatial (st_model.py:318-338) ---
        am = jnp.transpose(attn_mask, (0, 1, 3, 2))        # -> (tgt, nbr)
        am_flat = am.reshape(B * obs_len, A, A)
        x_flat = x.reshape(B * obs_len, A, -1)
        A_flat = A_edges.reshape(B * obs_len, A, A, -1)
        xs, _, _, _ = gst(x_flat, A_flat, am_flat, tau, hard, k_obs,
                          deterministic)
        xs = xs.reshape(B, obs_len, A, -1)

        # --- observation period: temporal (faster_lstm, st_model.py:351-355) ---
        obs_mask = jnp.transpose(loss_mask_rel[:, :, :obs_len],
                                 (0, 2, 1))[..., None]      # (B, obs, A, 1)
        xs_masked = (xs * obs_mask).reshape(B, obs_len, A, -1)
        ht = jnp.zeros((B * A, H))
        ct = jnp.zeros((B * A, H))

        def obs_step(carry, x_t):
            h, c = carry
            h, c = lstm_step(lstm_params, x_t.reshape(B * A, -1), h, c, cd)
            return (h, c), None

        # obs_len is 5: full unroll lets XLA fuse the tiny gate matmuls
        # across steps instead of paying loop overhead per step
        (ht, ct), _ = jax.lax.scan(obs_step, (ht, ct),
                                   jnp.transpose(xs_masked, (1, 0, 2, 3)),
                                   unroll=UNROLL)

        # pedestrians valid for prediction (st_model.py:358-365)
        if cfg.only_observe_full_period:
            lm_fp = (jnp.sum(loss_mask_rel, axis=2) ==
                     loss_mask_rel.shape[2]).astype(x.dtype)
        else:
            lm_fp = loss_mask_rel[:, :, obs_len - 1]        # (B, A)
        lm_flat = lm_fp.reshape(B * A, 1)
        ht = ht * lm_flat
        ct = ct * lm_flat
        attn_mask_pred = jnp.transpose(
            lm_fp[:, :, None] * lm_fp[:, None, :], (0, 2, 1))

        # --- recursive decoder (st_model.py:367-441) ---
        def gaussian_from_hidden(h):
            raw = hidden2pos(h).reshape(B, A, -1)[:, None]   # (B, 1, A, 5)
            mu = raw[..., :2]
            sx = jnp.exp(raw[..., 2:3])
            sy = jnp.exp(raw[..., 3:4])
            corr = jnp.tanh(raw[..., 4:5])
            return mu, sx, sy, corr

        def draw(k, mu, sx, sy, corr):
            if not sampling:
                return mu
            u = jax.random.normal(k, mu.shape)
            ux, uy = u[..., 0:1], u[..., 1:2]
            s_x = sx * ux
            s_y = corr * sy * ux + jnp.sqrt(1.0 - corr ** 2) * sy * uy
            return jnp.concatenate([s_x, s_y], axis=-1) + mu

        mu, sx, sy, corr = gaussian_from_hidden(ht)
        x_sample = draw(k_sample, mu, sx, sy, corr) * lm_fp[:, None, :, None]
        A_sample = A_edges[:, -1:] + (x_sample[:, :, :, None, :]
                                      - x_sample[:, :, None, :, :])

        def dec_step(carry, k_t):
            ht, ct, x_s, A_s = carry
            xs_tt, _, _, _ = gst(x_s.reshape(B, A, -1),
                                 A_s.reshape(B, A, A, -1), attn_mask_pred,
                                 tau, hard, k_t, deterministic)
            h_new, c_new = lstm_step(lstm_params, xs_tt.reshape(B * A, -1) *
                                     lm_flat, ht, ct, cd)
            ht2 = h_new * lm_flat + ht * (1.0 - lm_flat)
            ct2 = c_new * lm_flat + ct * (1.0 - lm_flat)
            mu, sx, sy, corr = gaussian_from_hidden(ht2)
            x_next = draw(k_t, mu, sx, sy, corr) * lm_fp[:, None, :, None]
            A_next = A_s + (x_next[:, :, :, None, :] - x_next[:, :, None, :, :])
            return (ht2, ct2, x_next, A_next), (mu[:, 0], sx[:, 0], sy[:, 0],
                                                corr[:, 0], x_next[:, 0])

        keys = jax.random.split(k_dec, cfg.pred_seq_len - 1)
        # 4 decode steps: unrolled for the same reason as the obs scan
        _, tail = jax.lax.scan(dec_step, (ht, ct, x_sample, A_sample), keys,
                               unroll=UNROLL)
        mu_t, sx_t, sy_t, corr_t, xs_t = tail                # (K-1, B, A, ·)

        def cat(first, rest):
            return jnp.concatenate([first, jnp.transpose(
                rest, (1, 0) + tuple(range(2, rest.ndim)))], axis=1)

        mu_pred = cat(mu, mu_t)
        sx_pred = cat(sx, sx_t)
        sy_pred = cat(sy, sy_t)
        corr_pred = cat(corr, corr_t)
        x_sample_pred = cat(x_sample, xs_t)
        return (mu_pred, sx_pred, sy_pred, corr_pred), x_sample_pred
