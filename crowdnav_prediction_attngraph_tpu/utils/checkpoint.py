"""Checkpoint/resume via orbax (reference train.py:213-219 torch.save;
improved: optimizer state and env/train counters are saved too)."""

from __future__ import annotations

import os
from typing import Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_train_state(ckpt_dir: str, ts, step: int):
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{step:05d}")
    with ocp.StandardCheckpointer() as cptr:
        payload = {"params": ts.params, "opt_state": ts.opt_state}
        cptr.save(path, payload, force=True)


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, ts, step: int | None = None
                        ) -> Tuple[object, int]:
    """Restore params/opt_state into ts; returns (ts, next_update_index).
    ``step`` selects a specific checkpoint (reference test.py --test_model);
    default latest."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"{step:05d}")
    with ocp.StandardCheckpointer() as cptr:
        target = {"params": ts.params, "opt_state": ts.opt_state}
        payload = cptr.restore(path, target)
    ts = ts.replace(params=payload["params"], opt_state=payload["opt_state"])
    return ts, step + 1


def save_params(path: str, params):
    with ocp.StandardCheckpointer() as cptr:
        cptr.save(os.path.abspath(path), {"params": params}, force=True)


def load_params(path: str, template):
    with ocp.StandardCheckpointer() as cptr:
        return cptr.restore(os.path.abspath(path),
                            {"params": template})["params"]


def save_trainer_checkpoint(path: str, params, opt_state):
    """GST-trainer checkpoint: params at ``path`` (load_params-compatible),
    optimizer state beside it (reference gst train.py:173-191 saves both)."""
    save_params(path, params)
    with ocp.StandardCheckpointer() as cptr:
        cptr.save(os.path.abspath(path) + "__opt", {"opt_state": opt_state},
                  force=True)


def restore_trainer_checkpoint(path: str, params_template, opt_template):
    params = load_params(path, params_template)
    with ocp.StandardCheckpointer() as cptr:
        opt_state = cptr.restore(os.path.abspath(path) + "__opt",
                                 {"opt_state": opt_template})["opt_state"]
    return params, opt_state
