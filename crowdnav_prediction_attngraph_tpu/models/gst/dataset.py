"""GST trajectory dataset: txt records -> padded graph windows.

Replaces the reference's per-scene variable-size graph batches
(gst_updated/src/mgnn/trajectories*.py + batch_trajectories.py, batch_size
forced to 1) with fixed-size padded windows batched for the MXU. Input txt
format is the reference's own (frame\\tid\\tx\\ty, collect_data.py:72-76), so
eth/ucy/self-collected files work unchanged.

Each window: seq_len = obs_len + pred_len consecutive frames; pedestrians
appearing in >= 2 frames of the window occupy slots (padded to max_peds).
Outputs per window:
  v: (seq, P, 2) displacements (0 at first valid frame)
  A: (seq, P, P, 2) pairwise relative positions
  attn_mask: (seq, P, P) pairwise validity
  loss_mask: (P, seq) raw per-frame presence
  loss_mask_rel: (P, seq) displacement validity (present at t and t-1;
                 first appearance counts, mirroring the reference's
                 rel masks in crowd_nav_interface_parallel.py:77-78 shape)
"""

from __future__ import annotations

import os
from typing import Iterator, List, Tuple

import numpy as np


def read_txt(path: str) -> np.ndarray:
    """(N, 4) rows of frame, ped_id, x, y."""
    return np.loadtxt(path, delimiter="\t").reshape(-1, 4)


def build_windows(records: np.ndarray, obs_len: int = 5, pred_len: int = 5,
                  max_peds: int = 32, stride: int = 1):
    """Yield padded windows from one env's record stream."""
    seq_len = obs_len + pred_len
    frames = np.unique(records[:, 0])
    frames.sort()
    by_frame = {f: records[records[:, 0] == f] for f in frames}
    windows = []
    for s in range(0, len(frames) - seq_len + 1, stride):
        fr = frames[s:s + seq_len]
        # consecutive frames only
        if not np.allclose(np.diff(fr), fr[1] - fr[0]):
            continue
        rows = [by_frame[f] for f in fr]
        ped_ids = np.unique(np.concatenate([r[:, 1] for r in rows]))
        # keep pedestrians present in >=2 frames (displacements exist)
        keep = [p for p in ped_ids
                if sum(1 for r in rows if p in r[:, 1]) >= 2]
        if not keep or len(keep) > max_peds:
            continue
        P = max_peds
        pos = np.zeros((seq_len, P, 2), np.float32)
        present = np.zeros((seq_len, P), np.float32)
        for t, r in enumerate(rows):
            for j, p in enumerate(keep):
                hit = r[r[:, 1] == p]
                if len(hit):
                    pos[t, j] = hit[0, 2:4]
                    present[t, j] = 1.0
        windows.append(_window_arrays(pos, present, obs_len, pred_len))
    return windows


def _window_arrays(pos, present, obs_len, pred_len):
    seq_len, P, _ = pos.shape
    # displacement validity: valid at t if present at t and t-1 (or t == first)
    rel_valid = np.zeros_like(present)
    rel_valid[0] = present[0]
    rel_valid[1:] = present[1:] * present[:-1]
    v = np.zeros_like(pos)
    v[1:] = (pos[1:] - pos[:-1]) * rel_valid[1:, :, None]
    A = (pos[:, :, None, :] - pos[:, None, :, :]) * \
        (present[:, :, None, None] * present[:, None, :, None])
    attn = rel_valid[:, :, None] * rel_valid[:, None, :]
    return {
        "v": v.astype(np.float32),
        "A": A.astype(np.float32),
        "attn_mask": attn.astype(np.float32),
        "loss_mask": np.transpose(present, (1, 0)).astype(np.float32),
        "loss_mask_rel": np.transpose(rel_valid, (1, 0)).astype(np.float32),
    }


def load_dataset(data_dir: str, obs_len: int = 5, pred_len: int = 5,
                 max_peds: int = 32, stride: int = 1) -> List[dict]:
    windows = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".txt"):
            continue
        rec = read_txt(os.path.join(data_dir, name))
        windows.extend(build_windows(rec, obs_len, pred_len, max_peds, stride))
    return windows


def batches(windows: List[dict], batch_size: int, rng: np.random.RandomState,
            shuffle: bool = True) -> Iterator[dict]:
    idx = np.arange(len(windows))
    if shuffle:
        rng.shuffle(idx)
    for s in range(0, len(idx) - batch_size + 1, batch_size):
        sel = idx[s:s + batch_size]
        yield {k: np.stack([windows[i][k] for i in sel]) for k in windows[0]}
