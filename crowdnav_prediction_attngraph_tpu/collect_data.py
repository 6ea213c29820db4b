"""GST training-data collection driver (reference collect_data.py:13-80).

Runs B parallel collect envs fully on-device, gathering (frame, track_id, x, y)
records every pred_interval steps, and writes one tab-separated txt per env in
the reference's exact format (frame\\tid\\tx\\ty) so datasets are
interchangeable between frameworks.

Usage:
  python -m crowdnav_prediction_attngraph_tpu.collect_data \
      --tot-steps 40000 --num-envs 5 --out data/orca_20humans
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from .config import varnum_config
from .env import collect



def _apply_platform_env():
    """Honor JAX_PLATFORMS even though the container sitecustomize pre-registers
    the axon TPU plugin (which otherwise wins)."""
    import os
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)

def collect_dataset(cfg, num_envs: int, tot_steps: int, seed: int = 0,
                    chunk: int = 64):
    """Returns per-env lists of (frame, id, x, y) float rows."""
    keys = jax.random.split(jax.random.key(seed), num_envs)
    states, info = jax.vmap(lambda k: collect.reset(cfg, k))(keys)
    step = jax.jit(jax.vmap(lambda s: collect.step(cfg, s)))

    pred_interval = cfg.pred_interval

    def scan_chunk(states, n):
        def body(c, _):
            c, info = step(c)
            return c, info
        return jax.lax.scan(body, states, None, length=n)

    scan_chunk_j = jax.jit(lambda s: scan_chunk(s, chunk * pred_interval))

    data = [[] for _ in range(num_envs)]

    def drain(infos):
        frames = np.asarray(infos.frame)       # (T, B, A)
        ids = np.asarray(infos.pred_id)
        pos = np.asarray(infos.pos)
        valid = np.asarray(infos.valid)
        T = frames.shape[0]
        for t in range(0, T, pred_interval):
            for b in range(num_envs):
                m = valid[t, b]
                rows = np.stack([frames[t, b, m], ids[t, b, m].astype(float),
                                 pos[t, b, m, 0], pos[t, b, m, 1]], axis=1)
                data[b].extend(rows.tolist())

    remaining = int(tot_steps)
    while remaining > 0:
        states, infos = scan_chunk_j(states)
        drain(infos)
        remaining -= chunk

    return data


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tot-steps", type=int, default=40000)
    p.add_argument("--num-envs", type=int, default=5)
    p.add_argument("--human-num", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--phase", default="train", choices=["train", "test"])
    p.add_argument("--out", default="data/orca_20humans")
    args = p.parse_args(argv)
    _apply_platform_env()

    cfg = varnum_config(human_num=args.human_num)
    data = collect_dataset(cfg, args.num_envs, args.tot_steps, args.seed)

    out_dir = os.path.join(args.out, args.phase)
    os.makedirs(out_dir, exist_ok=True)
    for i, rows in enumerate(data):
        with open(os.path.join(out_dir, f"{i}.txt"), "w") as f:
            for r in rows:
                f.write(f"{r[0]}\t{r[1]}\t{r[2]}\t{r[3]}\n")
    print(f"wrote {sum(len(d) for d in data)} records to {out_dir}")


if __name__ == "__main__":
    main()
