"""Training-curve plotting (reference plot.py:1-44): reads progress.csv of one
or more runs and plots eprewmean / losses vs timesteps.

Usage:
  python -m crowdnav_prediction_attngraph_tpu.plot trained_models/my_model [...]
"""

from __future__ import annotations

import argparse
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", help="run directories with progress.csv")
    p.add_argument("--out", default="training_curves.png")
    p.add_argument("--metrics", nargs="+",
                   default=["eprewmean", "loss/value_loss"])
    args = p.parse_args(argv)

    fig, axes = plt.subplots(1, len(args.metrics),
                             figsize=(6 * len(args.metrics), 4))
    if len(args.metrics) == 1:
        axes = [axes]
    for run in args.runs:
        df = pd.read_csv(os.path.join(run, "progress.csv"))
        label = os.path.basename(os.path.normpath(run))
        for ax, metric in zip(axes, args.metrics):
            ax.plot(df["misc/total_timesteps"], df[metric], label=label)
    for ax, metric in zip(axes, args.metrics):
        ax.set_xlabel("timesteps")
        ax.set_ylabel(metric)
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
