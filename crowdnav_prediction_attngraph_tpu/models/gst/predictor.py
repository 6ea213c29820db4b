"""Env-facing GST inference interface.

Pure-function equivalent of ``CrowdNavPredInterfaceMultiEnv.forward``
(gst_updated/scripts/wrapper/crowd_nav_interface_parallel.py:45-114):
converts rolling position/mask history into the displacement-graph inputs,
runs the recursive st_model, and accumulates the per-step displacement
Gaussians into absolute-frame predictions (mu cumsum, sigma^2 cumsum).

Operates on ONE env (A pedestrians); batch via ``jax.vmap``. In the fused
rollout this runs on-device inside the same XLA program as the policy and the
simulator — the reference's pipes/talk2Env channel does not exist here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...config import PredConfig
from .st_model import STModel

INVALID = -999.0


def gst_predict(cfg: PredConfig, params, input_traj, input_mask,
                key=None, sampling: bool = False):
    """input_traj: (A, L, 2) absolute positions; input_mask: (A, L) bool.

    Returns (out_traj (A, K, 5) [mu_x, mu_y, sx, sy, corr] in absolute frame,
    out_mask (A, 1) bool)."""
    A, L, _ = input_traj.shape
    K = cfg.pred_seq_len
    m = input_mask.astype(jnp.float32)                       # (A, L)

    # relative-displacement validity (crowd_nav_interface_parallel.py:77-78)
    lm_rel_obs = jnp.concatenate([m[:, :1], m[:, :-1] * m[:, -1:]], axis=1)
    lm_rel_pred = jnp.ones((A, K)) * lm_rel_obs[:, -1:]
    loss_mask_rel = jnp.concatenate([lm_rel_obs, lm_rel_pred], axis=1)

    # pairwise attention masks per timestep (lines 82-84)
    lm_t = jnp.transpose(lm_rel_obs, (1, 0))                 # (L, A)
    attn_mask_obs = lm_t[:, :, None] * lm_t[:, None, :]      # (L, A, A)

    # displacements, invalid slots -> -999 (lines 86-89)
    disp = input_traj[:, 1:] - input_traj[:, :-1]
    disp = jnp.concatenate([jnp.zeros((A, 1, 2)), disp], axis=1)
    disp = jnp.where(lm_rel_obs[:, :, None] > 0, disp, INVALID)

    # graph layout (seq_to_graph, lines 9-21)
    v_obs = jnp.transpose(disp, (1, 0, 2))                   # (L, A, 2)
    pos_t = jnp.transpose(input_traj, (1, 0, 2))             # (L, A, 2)
    A_obs = pos_t[:, :, None, :] - pos_t[:, None, :, :]      # (L, A_i, A_j, 2)

    model = STModel(cfg)
    (mu, sx, sy, corr), _ = model.apply(
        params, v_obs[None], A_obs[None], attn_mask_obs[None],
        loss_mask_rel[None], cfg.tau, True, sampling,
        key if key is not None else jax.random.key(0))
    mu, sx, sy, corr = mu[0], sx[0], sy[0], corr[0]          # (K, A, ·)

    # accumulate displacement Gaussians to absolute frame (lines 98-111)
    mu_cum = jnp.cumsum(mu, axis=0) + input_traj[:, -1][None]
    sx_cum = jnp.sqrt(jnp.cumsum(sx ** 2, axis=0))
    sy_cum = jnp.sqrt(jnp.cumsum(sy ** 2, axis=0))
    corr_cum = jnp.cumsum(corr * sx * sy, axis=0) / (sx_cum * sy_cum)

    lm_pred = jnp.transpose(lm_rel_pred, (1, 0))[:, :, None]  # (K, A, 1)
    mu_cum = mu_cum * lm_pred + INVALID * (1.0 - lm_pred)
    out = jnp.concatenate([mu_cum, sx_cum, sy_cum, corr_cum], axis=-1)
    out_traj = jnp.transpose(out, (1, 0, 2))                 # (A, K, 5)
    out_mask = lm_rel_pred[:, :1] > 0                         # (A, 1)
    return out_traj, out_mask
