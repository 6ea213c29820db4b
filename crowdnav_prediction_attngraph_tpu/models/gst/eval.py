"""Standalone GST predictor evaluation (reference
gst_updated/scripts/experiments/eval.py / test.py: inference over val/test
loaders with aoe/foe metrics and checkpoint-consistency reporting).

Usage:
  python -m crowdnav_prediction_attngraph_tpu.models.gst.eval \
      --data-dir data/orca20 --ckpt results/gst_run/epoch_100 [--torch-ckpt ...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ...config import PredConfig
from . import dataset as ds
from . import trainer


def evaluate_dataset(cfg: PredConfig, params, windows, batch_size: int = 16,
                     tau: float = 0.03, deterministic_loss: bool = False):
    """Returns dict(loss, aoe, foe) averaged over the dataset."""
    estep = trainer.make_eval_step(cfg, deterministic_loss)
    rng = np.random.RandomState(0)
    losses, aoes, foes = [], [], []
    for batch in ds.batches(windows, batch_size, rng, shuffle=False):
        batch = jax.tree.map(jnp.asarray, batch)
        loss, aoe, foe = estep(params, batch, tau, jax.random.key(0))
        losses.append(float(loss))
        aoes.append(float(aoe))
        foes.append(float(foe))
    return {"loss": float(np.mean(losses)), "aoe": float(np.mean(aoes)),
            "foe": float(np.mean(foes))}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--ckpt", default=None,
                   help="orbax params dir saved by the trainer")
    p.add_argument("--torch-ckpt", default=None,
                   help="reference epoch_*.pt to import instead")
    p.add_argument("--max-peds", type=int, default=32)
    p.add_argument("--edge-heads", type=int, default=0)
    args = p.parse_args(argv)

    cfg = PredConfig(spatial_num_heads_edges=args.edge_heads)
    windows = ds.load_dataset(os.path.join(args.data_dir, args.split),
                              cfg.obs_seq_len, cfg.pred_seq_len, args.max_peds)
    print(f"{len(windows)} {args.split} windows")

    if args.torch_ckpt:
        from ...utils.torch_import import load_gst_checkpoint
        params = jax.tree.map(jnp.asarray, load_gst_checkpoint(args.torch_ckpt))
    elif args.ckpt:
        from ...utils.checkpoint import load_params
        template = trainer.init_params(cfg, jax.random.key(0), args.max_peds)
        params = load_params(args.ckpt, template)
    else:
        raise SystemExit("provide --ckpt or --torch-ckpt")

    metrics = evaluate_dataset(cfg, params, windows)
    print(f"{args.split}: loss {metrics['loss']:.4f} | "
          f"aoe {metrics['aoe']:.4f} | foe {metrics['foe']:.4f}")


if __name__ == "__main__":
    main()
