"""Offline GST predictor training (reference
gst_updated/scripts/experiments/train.py:17-195).

TPU-first redesign: padded fixed-shape batches (the reference forces
batch_size=1 variable-ped graphs), one jitted train step, optax Adam with the
reference's StepLR(gamma=.3 every temp_epochs/4) schedule, linear Gumbel
temperature annealing to 0.03 (temperature_scheduler.py:1-20), NLL or
deterministic offset loss, aoe/foe validation metrics, orbax checkpoints with
full optimizer state + temperature (matching the reference's resume support).

Usage:
  python -m crowdnav_prediction_attngraph_tpu.models.gst.trainer \
      --data-dir data/orca_20humans --epochs 100 --out results/gst_run
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ...config import PredConfig
from . import dataset as ds
from .losses import negative_log_likelihood, offset_error_square, offset_errors
from .st_model import STModel


def temperature(epoch: int, temp_epochs: int, init_temp: float,
                temp_min: float = 0.03) -> float:
    """Linear annealing (temperature_scheduler.py:12-20)."""
    t = (1.0 - epoch / temp_epochs) * (init_temp - temp_min) + temp_min
    return max(t, temp_min)


def make_optimizer(lr: float, temp_epochs: int, steps_per_epoch: int,
                   clip_grad: float | None = None):
    """Adam + StepLR(step=temp_epochs/4, gamma=0.3) (gst train.py:56-57)."""
    boundaries = {}
    step_size = max(int(temp_epochs / 4), 1) * steps_per_epoch
    for k in range(1, 5):
        boundaries[k * step_size] = 0.3
    sched = optax.piecewise_constant_schedule(lr, boundaries)
    chain = [optax.scale_by_adam(), optax.scale_by_learning_rate(sched)]
    if clip_grad is not None:
        chain.insert(0, optax.clip_by_global_norm(clip_grad))
    return optax.chain(*chain)


def rotate_graph(v, A, theta):
    """Rotate node displacements and pairwise edges by per-window angles
    (reference mgnn/utils.py:66-84 ``rotate_graph``).

    v: (B, seq, P, 2), A: (B, seq, P, P, 2), theta: (B,) radians.
    """
    def rot(x):
        shape = (x.shape[0],) + (1,) * (x.ndim - 2)
        c = jnp.cos(theta).reshape(shape)
        s = jnp.sin(theta).reshape(shape)
        return jnp.stack([x[..., 0] * c - x[..., 1] * s,
                          x[..., 0] * s + x[..., 1] * c], axis=-1)
    return rot(v), rot(A)


def random_rotate_batch(batch, key, pattern: str):
    """Random-rotation augmentation (reference mgnn/utils.py:86-98
    ``random_rotate_graph``); the reference draws one angle per graph
    (its batches are single graphs), here one angle per window in the batch.
    Masks are rotation-invariant and left untouched."""
    B = batch["v"].shape[0]
    if pattern == "right_angle":
        theta = (jax.random.randint(key, (B,), 0, 4).astype(jnp.float32)
                 * (jnp.pi / 2.0))
    elif pattern == "random":
        theta = jax.random.uniform(key, (B,)) * (2.0 * jnp.pi)
    else:
        raise ValueError(f"unknown rotation pattern {pattern!r}")
    v, A = rotate_graph(batch["v"], batch["A"], theta)
    return dict(batch, v=v, A=A)


def loss_fn(cfg: PredConfig, params, batch, tau, key, deterministic_loss):
    model = STModel(cfg)
    obs = cfg.obs_seq_len
    v_obs = batch["v"][:, :obs]
    A_obs = batch["A"][:, :obs]
    attn_obs = batch["attn_mask"][:, :obs]
    lm_rel = batch["loss_mask_rel"]
    v_pred_gt = batch["v"][:, obs:]
    gp, x_sample = model.apply(params, v_obs, A_obs, attn_obs, lm_rel,
                               tau, False, False, key)
    lm_fp = lm_rel[:, :, obs - 1]
    lm_pred = lm_rel[:, :, obs:]
    if deterministic_loss:
        err, mask = offset_error_square(x_sample, v_pred_gt, lm_fp, lm_pred)
        loss = jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        nll, mask = negative_log_likelihood(gp, v_pred_gt, lm_fp, lm_pred)
        loss = jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1.0)
    # metrics over fully-observed pedestrians; returned as (sum, sum, count)
    # so the epoch loop can normalize over the whole epoch exactly like the
    # reference (gst train.py:149-156: concat then sum/sum)
    full = (jnp.sum(batch["loss_mask_rel"], axis=2)
            == batch["loss_mask_rel"].shape[2]).astype(jnp.float32)
    aoe, foe = offset_errors(x_sample, v_pred_gt, full)
    return loss, (jnp.sum(aoe), jnp.sum(foe), jnp.sum(full))


def _step_math(cfg, tx, params, opt_state, batch, tau, key,
               deterministic_loss, rotation_pattern):
    """One optimizer step (shared by the per-batch host loop and the fused
    on-device epoch scan so both paths run identical math)."""
    if rotation_pattern is not None:
        key, k_rot = jax.random.split(key)
        batch = random_rotate_batch(batch, k_rot, rotation_pattern)
    (loss, aux), grads = jax.value_and_grad(
        loss_fn, argnums=1, has_aux=True)(cfg, params, batch, tau, key,
                                          deterministic_loss)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, aux


def make_train_step(cfg: PredConfig, tx, deterministic_loss: bool,
                    rotation_pattern: str | None = None):
    @jax.jit
    def step(params, opt_state, batch, tau, key):
        return _step_math(cfg, tx, params, opt_state, batch, tau, key,
                          deterministic_loss, rotation_pattern)

    return step


def stack_windows(windows):
    """One contiguous (N, ...) array per window field — the epoch-resident
    device copy for the fused epoch path (the whole dataset lives in HBM;
    batches are gathered on device, so an epoch is ONE XLA program instead
    of ~1.7k host dispatches)."""
    return {k: np.stack([w[k] for w in windows]) for k in windows[0]}


def make_epoch_fns(cfg: PredConfig, tx, deterministic_loss: bool,
                   rotation_pattern: str | None, batch_size: int):
    """Whole-epoch device programs (TPU-first replacement for the
    reference's per-graph host loop, gst train.py:100-160): lax.scan of the
    batch-``batch_size`` Adam step over an on-device shuffle permutation.
    Identical update sequence to the host loop — same micro-batch size,
    same order, same fold_in(ekey, i) per-step keys — so resuming or
    switching paths mid-run reproduces the same trajectory."""

    def train_epoch(params, opt_state, data, perm, ekey, tau):
        n_steps = perm.shape[0] // batch_size
        idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)

        def body(carry, xs):
            params, opt_state = carry
            sel, i = xs
            batch = jax.tree.map(lambda a: jnp.take(a, sel, axis=0), data)
            k = jax.random.fold_in(ekey, i)
            params, opt_state, loss, aux = _step_math(
                cfg, tx, params, opt_state, batch, tau, k,
                deterministic_loss, rotation_pattern)
            return (params, opt_state), (loss, jnp.stack(aux))

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            body, (params, opt_state), (idx, jnp.arange(n_steps)))
        return params, opt_state, losses, jnp.sum(auxs, axis=0)

    def eval_epoch(params, data, idx, vkey, tau):
        def body(_, xs):
            sel, i = xs
            batch = jax.tree.map(lambda a: jnp.take(a, sel, axis=0), data)
            k = jax.random.fold_in(vkey, i)
            loss, aux = loss_fn(cfg, params, batch, tau, k,
                                deterministic_loss)
            return None, (loss, jnp.stack(aux))

        _, (losses, auxs) = jax.lax.scan(
            body, None, (idx, jnp.arange(idx.shape[0])))
        return losses, jnp.sum(auxs, axis=0)

    return jax.jit(train_epoch), jax.jit(eval_epoch)


def make_eval_step(cfg: PredConfig, deterministic_loss: bool):
    @jax.jit
    def step(params, batch, tau, key):
        loss, aux = loss_fn(cfg, params, batch, tau, key, deterministic_loss)
        return loss, aux

    return step


def init_params(cfg: PredConfig, key, max_peds: int):
    L, K, A = cfg.obs_seq_len, cfg.pred_seq_len, max_peds
    model = STModel(cfg)
    return model.init(key, jnp.zeros((1, L, A, 2)), jnp.zeros((1, L, A, A, 2)),
                      jnp.ones((1, L, A, A)), jnp.ones((1, A, L + K)),
                      0.5, False, False)


def train(cfg: PredConfig, train_windows, val_windows, out_dir: str,
          epochs: int = 100, temp_epochs: int = 100, lr: float = 1e-3,
          batch_size: int = 16, init_temp: float = 0.5, seed: int = 1000,
          deterministic_loss: bool = False, save_epochs: int = 10,
          max_peds: int = 32, rotation_pattern: str | None = None,
          resume_epoch: int = 0, fused_epochs: bool = True):
    """Epoch loop (gst train.py:50-195). Per-epoch RNG is derived by
    ``fold_in(seed, epoch)`` so resuming from epoch k reproduces the exact
    run that never stopped (the reference restores its schedulers on resume,
    gst train.py:59-98; here the LR/temperature schedules are pure functions
    of the restored optimizer step count and epoch index)."""
    base_key = jax.random.key(seed)
    params = init_params(cfg, jax.random.fold_in(base_key, 0), max_peds)
    steps_per_epoch = max(len(train_windows) // batch_size, 1)
    tx = make_optimizer(lr, temp_epochs, steps_per_epoch)
    opt_state = tx.init(params)
    tstep = make_train_step(cfg, tx, deterministic_loss, rotation_pattern)
    estep = make_eval_step(cfg, deterministic_loss)
    if fused_epochs:
        # fused epochs device_put the ENTIRE stacked window set into HBM; an
        # uncapped collected stream (millions of ~80 KB windows) would OOM
        # the device at startup. Estimate the stacked bytes and degrade to
        # the host-batch path instead of crashing (ADVICE r3).
        sample = train_windows[:1] + val_windows[:1]
        est_bytes = sum(
            sum(a.nbytes for a in w.values()) for w in sample) // max(
                len(sample), 1) * (len(train_windows) + len(val_windows))
        budget = int(os.environ.get("GST_FUSED_HBM_BUDGET",
                                    str(8 * 1024 ** 3)))
        if est_bytes > budget:
            print(f"[trainer] fused_epochs disabled: stacked windows ~"
                  f"{est_bytes / 1e9:.1f} GB exceed the {budget / 1e9:.0f} GB "
                  "device budget — falling back to host batches "
                  "(cap the load with --max-windows to re-enable)")
            fused_epochs = False
    if fused_epochs:
        train_ep, eval_ep = make_epoch_fns(cfg, tx, deterministic_loss,
                                           rotation_pattern, batch_size)
        train_data = jax.device_put(
            jax.tree.map(jnp.asarray, stack_windows(train_windows)))
        val_data = jax.device_put(
            jax.tree.map(jnp.asarray, stack_windows(val_windows)))
        n_val_full = len(val_windows) // batch_size
        val_idx = jnp.arange(n_val_full * batch_size).reshape(
            n_val_full, batch_size)
        # the remainder batch (< batch_size) is scored host-side with the
        # same fold_in(vkey, n_val_full) key the host loop would use
        val_rem = val_windows[n_val_full * batch_size:]
        val_rem_batch = jax.tree.map(jnp.asarray, stack_windows(val_rem)) \
            if val_rem else None

    os.makedirs(out_dir, exist_ok=True)
    # tfevents output matching the reference's tensorboardX scalars
    # (gst train.py:192-194: 'loss'/'aoe'/'foe' with train/val sub-tags);
    # CSV/JSON history remains the primary record.
    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(os.path.join(out_dir, "tensorboard"))
    except Exception as e:  # tensorboardX is optional
        print(f"[trainer] tfevents disabled ({type(e).__name__}: {e})")
    hist = {"train_loss": [], "val_loss": [], "train_aoe": [], "val_aoe": [],
            "train_foe": [], "val_foe": []}
    if resume_epoch:
        from ...utils.checkpoint import restore_trainer_checkpoint
        params, opt_state = restore_trainer_checkpoint(
            os.path.join(out_dir, f"epoch_{resume_epoch}"), params, opt_state)
        hist_path = os.path.join(out_dir, "train_hist.json")
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                saved = json.load(f)
            hist = {k: saved.get(k, [])[:resume_epoch] for k in hist}
    for epoch in range(resume_epoch + 1, epochs + 1):
        tau = temperature(epoch, temp_epochs, init_temp)
        t0 = time.time()
        ekey = jax.random.fold_in(base_key, epoch)
        rng = np.random.RandomState(seed + epoch)
        vkey = jax.random.fold_in(ekey, 1 << 20)
        if fused_epochs:
            perm = np.arange(len(train_windows))
            rng.shuffle(perm)
            params, opt_state, losses, t_aux = train_ep(
                params, opt_state, train_data, jnp.asarray(perm), ekey,
                jnp.float32(tau))
            tl = [float(jnp.mean(losses))] if losses.size else []
            t_sums = np.asarray(t_aux)
            v_losses, v_aux = eval_ep(params, val_data, val_idx, vkey,
                                      jnp.float32(tau))
            vl = [float(x) for x in np.asarray(v_losses)]
            v_sums = np.asarray(v_aux)
            if val_rem_batch is not None:
                k = jax.random.fold_in(vkey, n_val_full)
                loss, aux = estep(params, val_rem_batch, tau, k)
                vl.append(float(loss))
                v_sums = v_sums + np.asarray(jax.tree.map(float, aux))
        else:
            tl, t_sums = [], np.zeros(3)
            for i, batch in enumerate(ds.batches(train_windows, batch_size,
                                                 rng)):
                k = jax.random.fold_in(ekey, i)
                batch = jax.tree.map(jnp.asarray, batch)
                params, opt_state, loss, aux = tstep(params, opt_state,
                                                     batch, tau, k)
                tl.append(float(loss))
                t_sums += np.asarray(jax.tree.map(float, aux))
            vl, v_sums = [], np.zeros(3)
            for i, batch in enumerate(ds.batches(val_windows, batch_size,
                                                 rng, shuffle=False,
                                                 drop_last=False)):
                k = jax.random.fold_in(vkey, i)
                batch = jax.tree.map(jnp.asarray, batch)
                loss, aux = estep(params, batch, tau, k)
                vl.append(float(loss))
                v_sums += np.asarray(jax.tree.map(float, aux))
        # epoch normalization: sum over peds / sum of full-period mask,
        # exactly the reference's (gst train.py:149-156, eval.py:139-147)
        td, vd = max(t_sums[2], 1.0), max(v_sums[2], 1.0)
        for name, val in (("train_loss", np.mean(tl) if tl else np.nan),
                          ("val_loss", np.mean(vl) if vl else np.nan),
                          ("train_aoe", t_sums[0] / td),
                          ("val_aoe", v_sums[0] / vd),
                          ("train_foe", t_sums[1] / td),
                          ("val_foe", v_sums[1] / vd)):
            hist[name].append(float(val))
        if writer is not None:
            for tag, key in (("loss", "loss"), ("aoe", "aoe"), ("foe", "foe")):
                writer.add_scalars(tag, {
                    "train": hist[f"train_{key}"][-1],
                    "val": hist[f"val_{key}"][-1]}, epoch)
        print(f"Epoch {epoch} | train loss {hist['train_loss'][-1]:.4f} | "
              f"val loss {hist['val_loss'][-1]:.4f} | "
              f"train aoe {hist['train_aoe'][-1]:.4f} | "
              f"val aoe {hist['val_aoe'][-1]:.4f} | "
              f"tau {tau:.3f} | {time.time()-t0:.1f}s")
        if epoch % save_epochs == 0 or epoch == epochs:
            from ...utils.checkpoint import save_trainer_checkpoint
            ck_dir = os.path.join(out_dir, f"epoch_{epoch}")
            save_trainer_checkpoint(ck_dir, params, opt_state)
            with open(os.path.join(out_dir, "train_hist.json"), "w") as f:
                json.dump(hist, f)
            # stored val metrics enable eval.py's checkpoint-consistency
            # check (the reference stores val_loss_epoch etc. in its .pt,
            # gst train.py:166-177 / eval.py:36-41)
            with open(os.path.join(ck_dir, "val_metrics.json"), "w") as f:
                json.dump({"val_loss_epoch": hist["val_loss"][-1],
                           "val_aoe_epoch": hist["val_aoe"][-1],
                           "val_foe_epoch": hist["val_foe"][-1],
                           "epoch": epoch}, f)
    if writer is not None:
        writer.close()
    return params, hist


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", default="results/gst_run")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--temp-epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-peds", type=int, default=32)
    p.add_argument("--seed", type=int, default=1000)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--edge-heads", type=int, default=0)
    p.add_argument("--rotation-pattern", default=None,
                   choices=["random", "right_angle"],
                   help="random-rotation augmentation "
                        "(reference mgnn/utils.py:86-98)")
    p.add_argument("--resume-epoch", type=int, default=0,
                   help="resume from <out>/epoch_N (reference "
                        "--resume_training/--resume_epoch)")
    p.add_argument("--stride", type=int, default=1,
                   help="window start stride (reference --skip)")
    p.add_argument("--max-windows", type=int, default=0,
                   help="cap the train window count (0 = all)")
    p.add_argument("--max-val-windows", type=int, default=0,
                   help="cap the val window count (0 = all)")
    p.add_argument("--host-batches", action="store_true",
                   help="per-batch host loop instead of the fused on-device "
                        "epoch scan (debug / low-memory fallback)")
    args = p.parse_args(argv)

    cfg = PredConfig(spatial_num_heads_edges=args.edge_heads)
    train_w = ds.load_dataset(os.path.join(args.data_dir, "train"),
                              cfg.obs_seq_len, cfg.pred_seq_len,
                              args.max_peds, stride=args.stride,
                              max_windows=args.max_windows)
    test_dir = os.path.join(args.data_dir, "test")
    val_w = ds.load_dataset(test_dir, cfg.obs_seq_len, cfg.pred_seq_len,
                            args.max_peds, stride=args.stride,
                            max_windows=args.max_val_windows) \
        if os.path.isdir(test_dir) else train_w[: max(len(train_w) // 10, 1)]
    print(f"{len(train_w)} train windows, {len(val_w)} val windows")
    train(cfg, train_w, val_w, args.out, epochs=args.epochs,
          temp_epochs=args.temp_epochs, lr=args.lr,
          batch_size=args.batch_size, seed=args.seed,
          deterministic_loss=args.deterministic, max_peds=args.max_peds,
          rotation_pattern=args.rotation_pattern,
          resume_epoch=args.resume_epoch,
          fused_epochs=not args.host_batches)


if __name__ == "__main__":
    main()
