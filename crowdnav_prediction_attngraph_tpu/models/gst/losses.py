"""GST losses and metrics (reference gst_updated st_model.py:15-111,
src/mgnn/utils.py:8-26). Batched (the reference forces batch=1; here padded
dense batches feed the MXU)."""

from __future__ import annotations

import jax.numpy as jnp


def negative_log_likelihood(gaussian_params, x_target, loss_mask_ped,
                            loss_mask_pred_seq):
    """Masked bivariate-Gaussian NLL (st_model.py:62-111).

    gaussian_params: (mu (B,K,A,2), sx (B,K,A,1), sy, corr)
    x_target: (B, K, A, 2) gt displacements
    loss_mask_ped: (B, A); loss_mask_pred_seq: (B, A, K)
    Returns (prob_loss (B,K,A), eventual_mask (B,K,A))."""
    mu, sx, sy, corr = gaussian_params
    lm_seq = jnp.transpose(loss_mask_pred_seq, (0, 2, 1))[..., None]  # (B,K,A,1)
    lm_ped = loss_mask_ped[:, None, :, None]                          # (B,1,A,1)
    mu = mu * lm_seq * lm_ped
    corr = corr * lm_seq * lm_ped
    x_target = x_target * lm_seq * lm_ped
    sx = sx * lm_seq + (1.0 - lm_seq)
    sy = sy * lm_seq + (1.0 - lm_seq)
    sx = sx * lm_ped + (1.0 - lm_ped)
    sy = sy * lm_ped + (1.0 - lm_ped)
    sigma = jnp.concatenate([sx, sy], axis=-1)
    xn = (x_target - mu) / sigma
    nx, ny = xn[..., 0:1], xn[..., 1:2]
    t1 = jnp.log(1.0 - corr ** 2) / 2.0 + jnp.log(sx) + jnp.log(sy)
    t2 = (nx ** 2 - 2.0 * corr * nx * ny + ny ** 2) / (2.0 * (1.0 - corr ** 2))
    prob_loss = (t1 + t2)[..., 0]
    eventual = lm_seq[..., 0] * lm_ped[..., 0]
    return prob_loss * eventual, eventual


def offset_error_square(x_pred, x_target, loss_mask_ped, loss_mask_pred_seq):
    """Masked squared position offset (st_model.py:15-58)."""
    lm_seq = jnp.transpose(loss_mask_pred_seq, (0, 2, 1))[..., None]
    lm_ped = loss_mask_ped[:, None, :, None]
    xp = x_pred * lm_seq * lm_ped
    xt = x_target * lm_seq * lm_ped
    pos_pred = jnp.cumsum(xp, axis=1)
    pos_target = jnp.cumsum(xt, axis=1)
    err = jnp.sum((pos_pred - pos_target) ** 2, axis=-1)
    eventual = lm_seq[..., 0] * lm_ped[..., 0]
    return err * eventual, eventual


def offset_errors(x_pred, x_target, loss_mask_ped):
    """(aoe (B,A), foe (B,A)) masked by fully-observed pedestrians
    (mgnn/utils.py:8-26)."""
    pos_pred = jnp.cumsum(x_pred, axis=1)
    pos_target = jnp.cumsum(x_target, axis=1)
    err = jnp.sqrt(jnp.sum((pos_pred - pos_target) ** 2, axis=-1))  # (B,K,A)
    aoe = jnp.mean(err, axis=1) * loss_mask_ped
    foe = err[:, -1] * loss_mask_ped
    return aoe, foe
