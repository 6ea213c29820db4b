"""Standalone GST predictor evaluation (reference
gst_updated/scripts/experiments/eval.py).

Mirrors the reference's two inference modes (eval.py:57-150):
  val  -- soft edges (hard=False), decoder feeds predicted means
          (sampling=False); metrics normalized per-pedestrian over the
          whole split: sum(aoe)/sum(full-period mask) (eval.py:139-147)
  test -- 20 stochastic decoder rollouts (hard=True, sampling=True unless
          --deterministic); per-sample ped-summed aoe/foe -> mean/std/min
          across samples, normalized by the split's mask sum
          (eval.py:84-117, 149-150)

and the checkpoint-consistency check (eval.py:36-41): the stored
val_loss/aoe/foe inside the checkpoint are printed next to the recomputed
ones -- on the checkpoint's own validation split they must agree.

Usage:
  python -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
      --dataset eth --data-root datasets [--mode test]
  python -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
      --data-dir data/orca20 --ckpt results/gst_run/epoch_100
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ...config import PredConfig
from . import dataset as ds
from . import trainer
from .losses import negative_log_likelihood, offset_error_square
from .st_model import STModel


def _forward(cfg: PredConfig, params, batch, tau, key, hard, sampling,
             deterministic_loss):
    """One forward pass returning (loss, ped_aoe, ped_foe, full_mask)."""
    model = STModel(cfg)
    obs = cfg.obs_seq_len
    v_obs, A_obs = batch["v"][:, :obs], batch["A"][:, :obs]
    attn_obs = batch["attn_mask"][:, :obs]
    lm_rel = batch["loss_mask_rel"]
    v_pred_gt = batch["v"][:, obs:]
    gp, x_sample = model.apply(params, v_obs, A_obs, attn_obs, lm_rel,
                               tau, hard, sampling, key)
    lm_fp = lm_rel[:, :, obs - 1]
    lm_pred = lm_rel[:, :, obs:]
    if deterministic_loss:
        err, mask = offset_error_square(x_sample, v_pred_gt, lm_fp, lm_pred)
        loss = jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        nll, mask = negative_log_likelihood(gp, v_pred_gt, lm_fp, lm_pred)
        loss = jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)
    # full-period pedestrians (reference loss_mask_per_pedestrian)
    full = (jnp.sum(lm_rel, axis=2) == lm_rel.shape[2]).astype(jnp.float32)
    # per-ped offset errors on cumulative positions (mgnn/utils.py:8-26)
    pos_pred = jnp.cumsum(x_sample, axis=1)
    pos_gt = jnp.cumsum(v_pred_gt, axis=1)
    err = jnp.sqrt(jnp.sum((pos_pred - pos_gt) ** 2, axis=3))  # (B, K, P)
    ped_aoe = jnp.mean(err, axis=1) * full                     # (B, P)
    ped_foe = err[:, -1] * full
    return loss, ped_aoe, ped_foe, full


def evaluate_dataset(cfg: PredConfig, params, windows, batch_size: int = 16,
                     tau: float = 0.03, mode: str = "val",
                     num_samples: int = 20,
                     deterministic_loss: bool = False):
    """Reference-exact split metrics (eval.py:57-150). Returns a dict."""
    fwd = jax.jit(lambda p, b, k, hard, sampling: _forward(
        cfg, p, b, tau, k, hard, sampling, deterministic_loss),
        static_argnums=(3, 4))
    rng = np.random.RandomState(0)
    losses, weights, mask_sum = [], [], 0.0
    if mode == "val":
        aoe_sum = foe_sum = 0.0
        for i, batch in enumerate(ds.batches(windows, batch_size, rng,
                                             shuffle=False,
                                             drop_last=False)):
            batch = jax.tree.map(jnp.asarray, batch)
            loss, aoe, foe, full = fwd(params, batch,
                                       jax.random.key(i), False, False)
            losses.append(float(loss))
            weights.append(batch["v"].shape[0])
            aoe_sum += float(jnp.sum(aoe))
            foe_sum += float(jnp.sum(foe))
            mask_sum += float(jnp.sum(full))
        d = max(mask_sum, 1.0)
        # per-window mean (the reference iterates at batch_size 1)
        return {"loss": float(np.average(losses, weights=weights)),
                "aoe": aoe_sum / d, "foe": foe_sum / d}
    # test: num_samples stochastic rollouts, min/std taken across samples
    # PER WINDOW (the reference iterates at batch_size 1, so its per-batch
    # aoe.sum(1) -> mean/std/min over the 20 samples is a per-scene best-of-20
    # statistic, summed over the split and normalized by the split's mask sum,
    # eval.py:84-117, 149-157)
    sampling = not deterministic_loss
    aoe_cols, foe_cols = [], []          # each (num_samples, B) per batch
    for i, batch in enumerate(ds.batches(windows, batch_size, rng,
                                         shuffle=False, drop_last=False)):
        batch = jax.tree.map(jnp.asarray, batch)
        key = jax.random.key(1000 + i)
        B = batch["v"].shape[0]
        batch_losses = []
        aoe_sw = np.zeros((num_samples, B))
        foe_sw = np.zeros((num_samples, B))
        for s in range(num_samples):
            loss, aoe, foe, full = fwd(params, batch,
                                       jax.random.fold_in(key, s),
                                       True, sampling)
            batch_losses.append(float(loss))
            aoe_sw[s] = np.asarray(jnp.sum(aoe, axis=1))   # ped-summed / window
            foe_sw[s] = np.asarray(jnp.sum(foe, axis=1))
        aoe_cols.append(aoe_sw)
        foe_cols.append(foe_sw)
        losses.append(float(np.mean(batch_losses)))
        weights.append(B)
        mask_sum += float(jnp.sum(full))
    aoe_sw = np.concatenate(aoe_cols, axis=1)              # (S, num_windows)
    foe_sw = np.concatenate(foe_cols, axis=1)
    d = max(mask_sum, 1.0)
    return {"loss": float(np.average(losses, weights=weights)),
            "aoe": float(aoe_sw.mean(axis=0).sum()) / d,
            "foe": float(foe_sw.mean(axis=0).sum()) / d,
            "aoe_std": float(aoe_sw.std(axis=0, ddof=1).sum()) / d,
            "foe_std": float(foe_sw.std(axis=0, ddof=1).sum()) / d,
            "aoe_min": float(aoe_sw.min(axis=0).sum()) / d,
            "foe_min": float(foe_sw.min(axis=0).sum()) / d}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default=None,
                   help="named benchmark (eth/hotel/univ/zara1/zara2/sdd/sj)")
    p.add_argument("--data-root", default="datasets",
                   help="root holding the reference directory layout")
    p.add_argument("--data-dir", default=None,
                   help="flat dir of txt files (collect_data.py output)")
    p.add_argument("--split", default="val")
    p.add_argument("--mode", default=None, choices=["val", "test"],
                   help="inference mode (default: same as --split)")
    p.add_argument("--obs-len", type=int, default=None)
    p.add_argument("--pred-len", type=int, default=None)
    p.add_argument("--num-samples", type=int, default=20)
    p.add_argument("--ckpt", default=None,
                   help="orbax checkpoint dir saved by the trainer")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference epoch_*.pt to import instead")
    p.add_argument("--max-peds", type=int, default=None,
                   help="cap on pedestrians per window; default: no cap for "
                        "--dataset benchmarks (a cap silently filters "
                        "crowded univ/sdd scenes), 32 for --data-dir "
                        "training dumps (matching the trainer)")
    p.add_argument("--edge-heads", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--stride", type=int, default=1,
                   help="window stride for --data-dir dumps (collect_data "
                        "streams are dense; the trainer subsamples the same "
                        "way)")
    p.add_argument("--max-windows", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args(argv)

    cfg = PredConfig(spatial_num_heads_edges=args.edge_heads)
    obs_len = args.obs_len or cfg.obs_seq_len
    pred_len = args.pred_len or cfg.pred_seq_len
    if obs_len != cfg.obs_seq_len or pred_len != cfg.pred_seq_len:
        import dataclasses
        cfg = dataclasses.replace(cfg, obs_seq_len=obs_len,
                                  pred_seq_len=pred_len)

    if args.dataset:
        windows = ds.load_benchmark(args.dataset, args.data_root, args.split,
                                    obs_len, pred_len, max_peds=args.max_peds)
        name = args.dataset
    elif args.data_dir:
        sub = os.path.join(args.data_dir, args.split)
        windows = ds.load_dataset(sub if os.path.isdir(sub) else args.data_dir,
                                  obs_len, pred_len,
                                  32 if args.max_peds is None
                                  else args.max_peds,
                                  stride=args.stride,
                                  max_windows=args.max_windows)
        name = args.data_dir
    else:
        raise SystemExit("provide --dataset or --data-dir")
    if not windows:
        raise SystemExit(f"no windows found for {name}:{args.split}")
    print(f"{len(windows)} {args.split} windows "
          f"({windows[0]['v'].shape[1]} ped slots)")

    stored = None
    if args.torch_ckpt:
        import torch
        from ...utils.torch_import import load_gst_checkpoint
        params = jax.tree.map(jnp.asarray,
                              load_gst_checkpoint(args.torch_ckpt))
        raw = torch.load(args.torch_ckpt, map_location="cpu",
                         weights_only=False)
        stored = {k: float(raw[k]) for k in
                  ("val_loss_epoch", "val_aoe_epoch", "val_foe_epoch")
                  if k in raw}
    elif args.ckpt:
        from ...utils.checkpoint import load_params
        P = windows[0]["v"].shape[1]
        template = trainer.init_params(cfg, jax.random.key(0), P)
        params = load_params(args.ckpt, template)
        meta_path = os.path.join(args.ckpt, "val_metrics.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                stored = json.load(f)
    else:
        raise SystemExit("provide --ckpt or --torch-ckpt")

    mode = args.mode or ("test" if args.split == "test" else "val")
    m = evaluate_dataset(cfg, params, windows, batch_size=args.batch_size,
                         mode=mode,
                         num_samples=args.num_samples,
                         deterministic_loss=args.deterministic)
    if stored:
        # checkpoint-consistency check (reference eval.py:36-41): on the
        # checkpoint's own val split these must match the recomputation
        print("Stored in checkpoint: "
              + " | ".join(f"{k} {v:.4f}" for k, v in stored.items()))
    line = f"{name}/{args.split} [{mode}]: " + " | ".join(
        f"{k} {v:.4f}" for k, v in m.items())
    print(line)
    return m


if __name__ == "__main__":
    main()
