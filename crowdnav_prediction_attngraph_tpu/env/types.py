"""State and observation pytrees for the vectorized crowd simulator.

The reference keeps env state in Python objects (crowd_sim/envs/utils/agent.py,
crowd_sim.py instance attributes); here the entire simulator state is a single
pytree of dense arrays so that ``reset``/``step`` are pure, jittable functions
and a batch of environments is just a leading axis added by ``jax.vmap``.

Variable human count (crowd_sim_var_num.py:406-439) is represented by the
integer ``human_num``: the reference only ever appends/pops humans at the end
of its list, so the active set is always the slot prefix ``[0, human_num)``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

# Episode outcome codes (reference crowd_sim/envs/utils/info.py:1-44).
OUTCOME_NOTHING = 0
OUTCOME_TIMEOUT = 1
OUTCOME_REACH_GOAL = 2
OUTCOME_COLLISION = 3
OUTCOME_DANGER = 4  # non-terminal; reported via info like Danger(min_dist)


@struct.dataclass
class RobotState:
    """Robot physical state (reference agent.py:28-35, robot.py)."""

    pos: jnp.ndarray      # (2,) px, py
    vel: jnp.ndarray      # (2,) vx, vy
    theta: jnp.ndarray    # () heading (used by unicycle)
    goal: jnp.ndarray     # (2,) gx, gy
    radius: jnp.ndarray   # ()
    v_pref: jnp.ndarray   # ()


@struct.dataclass
class HumanState:
    """All humans as dense padded arrays over slots [0, max_human_num)."""

    pos: jnp.ndarray      # (A, 2)
    vel: jnp.ndarray      # (A, 2)
    goal: jnp.ndarray     # (A, 2)
    radius: jnp.ndarray   # (A,)
    v_pref: jnp.ndarray   # (A,)


@struct.dataclass
class EnvState:
    """Complete simulator state; one env (batch via vmap)."""

    key: jnp.ndarray              # PRNG key driving all in-episode randomness
    robot: RobotState
    humans: HumanState
    human_num: jnp.ndarray        # () int32 — active slot count
    # Robot's belief of human observable states [px, py, vx, vy, radius]
    # (crowd_sim.py:243-273). Invisible humans coast in a straight line.
    last_human_states: jnp.ndarray       # (A, 5)
    prev_human_states: jnp.ndarray       # (A, 5) — belief before latest update
                                         # (crowd_sim_pred.py:71, for const-vel)
    visible_masks: jnp.ndarray    # (A,) bool — human visibility by slot id
    potential: jnp.ndarray        # () — -(dist robot->goal) (crowd_sim.py:407)
    global_time: jnp.ndarray      # () float
    step_count: jnp.ndarray       # () int32
    desired_velocity: jnp.ndarray  # () — unicycle accumulated speed (crowd_sim_var_num.py:380)
    orca_neighbor_dist: jnp.ndarray  # () — U(5,10) when randomized (agent.py:21-22)
    # GST observation history ring buffers (vec_pretext_normalize.py:85-101).
    # Only used when predict_method == 'inferred'; otherwise shape (0, A, ·).
    traj_buffer: jnp.ndarray      # (L, A, 2) absolute human positions
    mask_buffer: jnp.ndarray      # (L, A) bool visibility history
    # ground-truth future human traj, refreshed in test-phase steps
    # ([K+1, A, 4], crowd_sim_var_num.py:152-228); zeros-shaped in train phase.
    human_future_traj: jnp.ndarray


@struct.dataclass
class Observation:
    """Dict-obs equivalent (crowd_sim_var_num.py:37-58, crowd_sim_pred.py:44-58)."""

    robot_node: jnp.ndarray          # (7,) px, py, r, gx, gy, v_pref, theta
    temporal_edges: jnp.ndarray      # (2,) vx, vy
    spatial_edges: jnp.ndarray       # (A, D) D=2 or 2*(K+1)
    visible_masks: jnp.ndarray       # (A,) bool
    detected_human_num: jnp.ndarray  # () int32, >= 1


@struct.dataclass
class StepInfo:
    """Per-step info (reference info classes + evaluation.py metrics)."""

    outcome: jnp.ndarray    # () int32 — OUTCOME_* of this step
    min_dist: jnp.ndarray   # () — min intrusion distance when in Danger
    in_danger: jnp.ndarray  # () bool
