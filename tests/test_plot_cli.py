"""Smoke tests for the training-curve plot CLI and the episode renderer.

Covers the reference's plot.py:1-44 (progress.csv -> curves PNG) and the
render hook used by ``test.py --visualize``.
"""

import os

import numpy as np

from crowdnav_prediction_attngraph_tpu import plot as plot_cli


def _write_progress_csv(run_dir, n=5, offset=0.0):
    os.makedirs(run_dir, exist_ok=True)
    lines = ["misc/total_timesteps,eprewmean,loss/value_loss"]
    for i in range(n):
        lines.append(f"{(i + 1) * 1000},{offset + 0.1 * i},{1.0 / (i + 1)}")
    with open(os.path.join(run_dir, "progress.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_plot_cli_writes_png(tmp_path):
    run_a = str(tmp_path / "run_a")
    run_b = str(tmp_path / "run_b")
    _write_progress_csv(run_a)
    _write_progress_csv(run_b, offset=0.5)
    out = str(tmp_path / "curves.png")
    plot_cli.main([run_a, run_b, "--out", out])
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_plot_cli_single_metric(tmp_path):
    run = str(tmp_path / "run")
    _write_progress_csv(run)
    out = str(tmp_path / "one.png")
    plot_cli.main([run, "--out", out, "--metrics", "eprewmean"])
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_render_frame_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from crowdnav_prediction_attngraph_tpu.utils.render import render_frame

    fig, ax = plt.subplots()
    render_frame(
        ax,
        robot_pos=np.array([0.0, 0.0]),
        robot_goal=np.array([0.0, 4.0]),
        robot_radius=0.3,
        human_pos=np.array([[1.0, 1.0], [-1.0, 2.0]]),
        human_radius=np.array([0.3, 0.3]),
        human_visible=np.array([True, False]),
        sensor_range=5.0,
        human_num=2,
    )
    out = str(tmp_path / "frame.png")
    fig.savefig(out)
    plt.close(fig)
    assert os.path.exists(out) and os.path.getsize(out) > 0
