"""Episode visualization (reference crowd_sim_var_num.py:564-691 render).

The reference renders interactively inside the env process; here rendering is
host-side from recorded trajectory arrays (gathered from device after an
episode), producing PNG frames or a GIF — no matplotlib state inside the
jitted step.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.lines as mlines
from matplotlib import patches


def render_frame(ax, robot_pos, robot_goal, robot_radius, human_pos,
                 human_radius, human_visible, sensor_range: float,
                 human_num: int, pred_pos: Optional[np.ndarray] = None,
                 arena_size: float = 6.0):
    """Draw one timestep. pred_pos: (A, K, 2) predicted future positions."""
    ax.clear()
    lim = arena_size + 4
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    ax.add_artist(plt.Circle(robot_pos, robot_radius, fill=True, color="gold"))
    ax.plot([robot_goal[0]], [robot_goal[1]], color="red", marker="*",
            markersize=15, linestyle="None")
    ax.add_artist(plt.Circle(robot_pos, sensor_range + robot_radius + 0.3,
                             fill=False, linestyle="--", color="gray"))
    for i in range(human_num):
        color = "b" if human_visible[i] else "r"
        ax.add_artist(plt.Circle(human_pos[i], human_radius[i], fill=False,
                                 linewidth=1.5, color=color))
        ax.text(human_pos[i][0] - 0.1, human_pos[i][1] - 0.1, str(i),
                color="black", fontsize=10)
        if pred_pos is not None and human_visible[i]:
            for k in range(pred_pos.shape[1]):
                ax.add_artist(plt.Circle(pred_pos[i, k], human_radius[i],
                                         fill=False, color="tab:orange",
                                         alpha=0.3, linewidth=0.8))


def render_episode(traj: dict, out_path: str, cfg=None, fps: int = 8,
                   max_frames: int = 400):
    """traj keys (T, ...): robot_pos, robot_goal, human_pos, human_radius,
    human_visible, human_num, optional pred_pos. Writes a GIF (or PNG frames
    directory if imageio-style writer is unavailable)."""
    T = min(len(traj["robot_pos"]), max_frames)
    sensor_range = getattr(getattr(cfg, "robot", None), "sensor_range", 5.0)
    arena = getattr(getattr(cfg, "sim", None), "arena_size", 6.0)
    robot_radius = float(np.asarray(traj.get("robot_radius", 0.3)).ravel()[0])

    fig, ax = plt.subplots(figsize=(7, 7))
    frames_dir = None
    try:
        from matplotlib.animation import PillowWriter
        writer = PillowWriter(fps=fps)
        with writer.saving(fig, out_path, dpi=80):
            for t in range(T):
                render_frame(ax, traj["robot_pos"][t], traj["robot_goal"][t],
                             robot_radius, traj["human_pos"][t],
                             traj["human_radius"][t], traj["human_visible"][t],
                             sensor_range, int(traj["human_num"][t]),
                             traj.get("pred_pos", [None] * T)[t], arena)
                writer.grab_frame()
    except Exception:
        frames_dir = os.path.splitext(out_path)[0] + "_frames"
        os.makedirs(frames_dir, exist_ok=True)
        for t in range(T):
            render_frame(ax, traj["robot_pos"][t], traj["robot_goal"][t],
                         robot_radius, traj["human_pos"][t],
                         traj["human_radius"][t], traj["human_visible"][t],
                         sensor_range, int(traj["human_num"][t]),
                         traj.get("pred_pos", [None] * T)[t], arena)
            fig.savefig(os.path.join(frames_dir, f"{t:04d}.png"), dpi=80)
    plt.close(fig)
    return frames_dir or out_path


def render_episode_live(cfg, params=None, gst_params=None, case_idx: int = 0,
                        base_seed: int = 425, robot_policy: str = "network",
                        out_path: Optional[str] = None, fps: int = 8):
    """Step the episode and draw each frame as it happens (the reference
    renders inside env.step, crowd_sim.py:750-873).

    With a display (DISPLAY set and an interactive backend available) the
    figure updates live via plt.pause; headless, frames stream to a GIF at
    ``out_path`` while the episode is still running — either way rendering is
    per-step, not post-hoc.
    """
    interactive = bool(os.environ.get("DISPLAY"))
    if interactive:
        try:
            matplotlib.use("TkAgg", force=True)
            plt.ion()
        except Exception:
            interactive = False

    fig, ax = plt.subplots(figsize=(7, 7))
    sensor_range = cfg.robot.sensor_range
    arena = cfg.sim.arena_size
    writer = None
    if out_path:
        from matplotlib.animation import PillowWriter
        writer = PillowWriter(fps=fps)
        writer.setup(fig, out_path, dpi=80)

    def on_frame(t, frame):
        render_frame(ax, frame["robot_pos"], frame["robot_goal"],
                     float(np.ravel(frame["robot_radius"])[0]),
                     frame["human_pos"], frame["human_radius"],
                     frame["human_visible"], sensor_range,
                     int(frame["human_num"]), frame.get("pred_pos"), arena)
        ax.set_title(f"t = {t * cfg.env.time_step:.2f}s")
        if writer is not None:
            writer.grab_frame()
        if interactive:
            plt.pause(0.001)

    traj = record_episode(cfg, params, gst_params, case_idx, base_seed,
                          robot_policy, on_frame=on_frame)
    if writer is not None:
        writer.finish()
    plt.close(fig)
    return traj


def record_episode(cfg, params=None, gst_params=None, case_idx: int = 0,
                   base_seed: int = 425, robot_policy: str = "orca",
                   on_frame=None):
    """Roll one seeded episode and return a host-side trajectory dict.
    ``on_frame(t, frame_dict)`` is invoked per step for live rendering."""
    import jax
    import jax.numpy as jnp
    from ..algo.evaluation import _reset_case
    from ..env import crowd_sim
    from ..env.pretext import pretext_process
    from ..models import policy as policy_mod
    from ..models.policy_net import init_hidden, obs_to_dict

    state, obs = _reset_case(cfg, base_seed, jnp.int32(case_idx))
    if cfg.sim.predict_method == "inferred" and gst_params is not None:
        state, obs, _, _ = pretext_process(cfg, gst_params, state, obs,
                                           jnp.float32(0.0))
    hxs = init_hidden(cfg, 1)
    masks = jnp.ones((1,))
    use_pretext = (cfg.sim.predict_method == "inferred"
                   and gst_params is not None)

    def _step(s, a):
        s, o, r, d, info = crowd_sim.step(cfg, s, a, "test", robot_policy)
        if use_pretext:
            # per-step GST prediction + reward rewrite, as in
            # vector.vec_step (VecPretextNormalize.step_wait:69-75)
            s, o, r, _ = pretext_process(cfg, gst_params, s, o, r)
        return s, o, r, d, info

    step = jax.jit(_step)
    traj = {k: [] for k in ("robot_pos", "robot_goal", "human_pos",
                            "human_radius", "human_visible", "human_num",
                            "pred_pos")}
    done = False
    t = 0
    while not done and t < cfg.max_episode_steps:
        traj["robot_pos"].append(np.asarray(state.robot.pos))
        traj["robot_goal"].append(np.asarray(state.robot.goal))
        traj["human_pos"].append(np.asarray(state.humans.pos))
        traj["human_radius"].append(np.asarray(state.humans.radius))
        traj["human_visible"].append(
            np.asarray(crowd_sim.robot_human_visibility(cfg, state)))
        traj["human_num"].append(int(state.human_num))
        # predicted future positions ride in spatial_edges[:, 2:] for the
        # pred/GST envs (robot-centric; crowd_sim_pred_real_gst.py:226-235)
        se = np.asarray(obs.spatial_edges)
        if se.shape[-1] > 2:
            pred = se[:, 2:].reshape(se.shape[0], -1, 2) + \
                traj["robot_pos"][-1]
            traj["pred_pos"].append(pred)
        else:
            traj["pred_pos"].append(None)
        if on_frame is not None:
            on_frame(t, {k: traj[k][-1] for k in traj} |
                     {"robot_radius": np.asarray(state.robot.radius)})
        if robot_policy == "network" and params is not None:
            obs_d = jax.tree.map(lambda x: x[None], obs_to_dict(obs))
            _, action, _, hxs = policy_mod.act(cfg, params, obs_d, hxs, masks,
                                               jax.random.key(0), True)
            action = action[0]
        else:
            action = jnp.zeros(2)
        state, obs, _, d, _ = step(state, action)
        done = bool(d)
        t += 1
    traj["robot_radius"] = np.asarray(state.robot.radius)
    return traj
