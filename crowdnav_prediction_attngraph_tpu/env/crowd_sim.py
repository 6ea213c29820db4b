"""The vectorized crowd-navigation simulator as pure jittable functions.

One parametric env family covering the reference's gym classes
(crowd_sim/envs/crowd_sim_var_num.py, crowd_sim_pred.py,
crowd_sim_pred_real_gst.py) selected by ``config.sim.predict_method``:

  'none'      -> CrowdSimVarNum       (spatial_edges: current rel pos)
  'const_vel' -> CrowdSimPred         (+ analytic future rel pos, social reward)
  'truth'     -> CrowdSimPred         (+ ground-truth rollout future)
  'inferred'  -> CrowdSimPredRealGST  (placeholder future; GST fills it in the
                                       fused rollout — the talk2Env pipe of
                                       shmem_vec_env.py:82-91 disappears)

Everything operates on one env; a batch is ``jax.vmap`` over these functions,
and multi-host scaling shards the batch axis over the device mesh (see
``parallel/``). Humans are dense padded slots with an active prefix
[0, human_num); the reference's add/pop-at-end list operations
(crowd_sim_var_num.py:406-439) map exactly onto prefix length changes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from . import kinematics, spawn
from .orca import OrcaParams, orca_velocity
from .social_force import social_force_velocity
from .types import (EnvState, HumanState, Observation, RobotState, StepInfo,
                    OUTCOME_COLLISION, OUTCOME_DANGER, OUTCOME_NOTHING,
                    OUTCOME_REACH_GOAL, OUTCOME_TIMEOUT)

# Belief placeholder for out-of-view humans (crowd_sim.py:258).
# numpy (not jnp) so importing this module never initializes the XLA backend
# — jax.distributed.initialize must be able to run after import (launch.py).
import numpy as _np
BELIEF_DUMMY = _np.array([15.0, 15.0, 0.0, 0.0, 0.3], dtype=_np.float32)
# Dummy neighbor an agent substitutes for peers outside its FOV (crowd_sim.py:132).
NEIGHBOR_DUMMY_POS = 7.0


def _active_mask(cfg: Config, human_num) -> jnp.ndarray:
    return jnp.arange(cfg.sim.max_human_num) < human_num


def _heading(vel, theta, holonomic: bool):
    # crowd_sim.py:514-517 — heading from velocity for holonomic agents.
    return jnp.arctan2(vel[..., 1], vel[..., 0]) if holonomic else theta


def _offset_angle(p1_pos, p1_heading, p2_pos):
    """Angle between agent1's heading ray and the ray to agent2
    (crowd_sim.py:519-528)."""
    fwd = jnp.stack([jnp.cos(p1_heading), jnp.sin(p1_heading)], axis=-1)
    v12 = p2_pos - p1_pos
    v12 = v12 / jnp.maximum(jnp.linalg.norm(v12, axis=-1, keepdims=True), 1e-9)
    return jnp.arccos(jnp.clip(jnp.sum(fwd * v12, axis=-1), -1.0, 1.0))


def robot_human_visibility(cfg: Config, state: EnvState) -> jnp.ndarray:
    """Which active humans the robot currently sees (crowd_sim.py:558-572)."""
    holo = cfg.action_space.kinematics == "holonomic"
    heading = _heading(state.robot.vel, state.robot.theta, holo)
    offset = _offset_angle(state.robot.pos, heading, state.humans.pos)
    in_fov = jnp.abs(offset) <= (math.pi * cfg.robot.fov) / 2.0
    dist = (jnp.linalg.norm(state.humans.pos - state.robot.pos, axis=-1)
            - state.humans.radius - state.robot.radius)
    in_range = dist <= cfg.robot.sensor_range
    return _active_mask(cfg, state.human_num) & in_fov & in_range


def human_pair_visibility(cfg: Config, state: EnvState) -> jnp.ndarray:
    """(A, A) matrix: does human i see human j? (crowd_sim.py:513-552 with
    robot1=False: humans have unbounded sensor range; FOV = humans.fov * pi.
    The reference evaluates the holonomic-vs-theta switch on the *robot's*
    kinematics — reproduced as-is.)"""
    holo = cfg.action_space.kinematics == "holonomic"
    theta = jnp.zeros_like(state.humans.radius)
    heading = _heading(state.humans.vel, theta, holo)           # (A,)
    offset = _offset_angle(state.humans.pos[:, None, :], heading[:, None],
                           state.humans.pos[None, :, :])        # (A, A)
    in_fov = jnp.abs(offset) <= (math.pi * cfg.humans.fov) / 2.0
    active = _active_mask(cfg, state.human_num)
    return in_fov & active[:, None] & active[None, :]


def human_sees_robot(cfg: Config, state: EnvState) -> jnp.ndarray:
    """(A,) — does each human see the robot (for humans.visible reaction)."""
    holo = cfg.action_space.kinematics == "holonomic"
    theta = jnp.zeros_like(state.humans.radius)
    heading = _heading(state.humans.vel, theta, holo)
    offset = _offset_angle(state.humans.pos, heading,
                           jnp.broadcast_to(state.robot.pos, state.humans.pos.shape))
    in_fov = jnp.abs(offset) <= (math.pi * cfg.humans.fov) / 2.0
    return in_fov & _active_mask(cfg, state.human_num)


def update_last_human_states(cfg: Config, state: EnvState, visibility,
                             reset: bool) -> jnp.ndarray:
    """Belief tracking of humans (crowd_sim.py:243-273): visible -> truth;
    invisible -> straight-line coasting (dummy at reset)."""
    truth = jnp.concatenate(
        [state.humans.pos, state.humans.vel, state.humans.radius[:, None]],
        axis=-1)
    last = state.last_human_states
    coast = last.at[:, 0:2].add(last[:, 2:4] * cfg.env.time_step)
    fallback = jnp.broadcast_to(BELIEF_DUMMY, last.shape) if reset else coast
    return jnp.where(visibility[:, None], truth, fallback)


# --------------------------------------------------------------------------
# crowd engine: one action per human
# --------------------------------------------------------------------------

def build_human_neighbor_inputs(cfg: Config, state: EnvState):
    """Fixed-shape neighbor tensors for the scripted human policies
    (crowd_sim.py:680-703): each human acts on the *true* states of peers it
    sees (unseen peers become a dummy at (7,7)), plus the robot iff
    robot.visible and in view. Returns (nbr_pos, nbr_vel, nbr_radius,
    nbr_mask, active) with neighbor axis A (+1 when the robot is visible)."""
    A = cfg.sim.max_human_num
    vis = human_pair_visibility(cfg, state)                      # (A, A)
    eye = jnp.eye(A, dtype=bool)
    active = _active_mask(cfg, state.human_num)

    dummy_pos = jnp.full((2,), NEIGHBOR_DUMMY_POS)
    use_true = vis & ~eye
    nbr_pos = jnp.where(use_true[:, :, None], state.humans.pos[None, :, :],
                        dummy_pos)
    nbr_vel = jnp.where(use_true[:, :, None], state.humans.vel[None, :, :], 0.0)
    nbr_radius = jnp.where(use_true, state.humans.radius[None, :],
                           cfg.humans.radius)
    nbr_mask = jnp.broadcast_to(active[None, :], (A, A)) & ~eye

    # robot column (appended iff robot visible, crowd_sim.py:695-699)
    if cfg.robot.visible:
        sees_robot = human_sees_robot(cfg, state)                # (A,)
        r_pos = jnp.where(sees_robot[:, None], state.robot.pos, dummy_pos)
        r_vel = jnp.where(sees_robot[:, None], state.robot.vel, 0.0)
        r_rad = jnp.where(sees_robot, state.robot.radius, cfg.robot.radius)
        r_mask = jnp.ones((A,), bool)
        nbr_pos = jnp.concatenate([nbr_pos, r_pos[:, None, :]], axis=1)
        nbr_vel = jnp.concatenate([nbr_vel, r_vel[:, None, :]], axis=1)
        nbr_radius = jnp.concatenate([nbr_radius, r_rad[:, None]], axis=1)
        nbr_mask = jnp.concatenate([nbr_mask, r_mask[:, None]], axis=1)
    return nbr_pos, nbr_vel, nbr_radius, nbr_mask, active


def orca_pref_velocity(state: EnvState) -> jnp.ndarray:
    """Unit-clipped preferred velocity toward each human's goal
    (reference orca.py:98-100)."""
    goal_vec = state.humans.goal - state.humans.pos
    speed = jnp.linalg.norm(goal_vec, axis=-1)
    return jnp.where((speed > 1.0)[:, None],
                     goal_vec / jnp.maximum(speed, 1e-9)[:, None], goal_vec)


def get_human_actions(cfg: Config, state: EnvState) -> jnp.ndarray:
    """New velocities for all humans (crowd_sim.py:680-703) for ONE env.

    The fused batched rollout path instead precomputes these across the env
    batch (env/vector.py) so ORCA's LP3 fallback can hide behind a
    batch-level cond; this per-env version (LP3 always computed) serves
    single-env callers and the social-force path."""
    nbr_pos, nbr_vel, nbr_radius, nbr_mask, active = \
        build_human_neighbor_inputs(cfg, state)

    if cfg.humans.policy == "orca":
        inflate = 0.01 + cfg.orca.safety_space                   # orca.py:85-89
        pref_vel = orca_pref_velocity(state)
        params = OrcaParams(cfg.env.time_step, cfg.orca.time_horizon,
                            state.orca_neighbor_dist)
        act = jax.vmap(orca_velocity,
                       in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))(
            state.humans.pos, state.humans.vel,
            state.humans.radius + inflate, state.humans.v_pref, pref_vel,
            nbr_pos, nbr_vel, nbr_radius + inflate, nbr_mask, params)
    elif cfg.humans.policy == "social_force":
        act = jax.vmap(social_force_velocity,
                       in_axes=(0, 0, 0, 0, 0, 0, 0, 0,
                                None, None, None, None))(
            state.humans.pos, state.humans.vel, state.humans.radius,
            state.humans.goal, state.humans.v_pref,
            nbr_pos, nbr_radius, nbr_mask,
            cfg.sf.A, cfg.sf.B, cfg.sf.KI, cfg.env.time_step)
    else:
        raise ValueError(f"unknown human policy {cfg.humans.policy}")

    return jnp.where(active[:, None], act, 0.0)


# --------------------------------------------------------------------------
# future-trajectory prediction (truth / const-vel)
# --------------------------------------------------------------------------

def calc_human_future_traj(cfg: Config, state: EnvState, visibility,
                           method: str) -> jnp.ndarray:
    """[K+1, A, 4] future (px, py, vx, vy) of humans
    (crowd_sim_var_num.py:152-228). Invisible humans pinned to (15, 15, 0, 0)."""
    A = cfg.sim.max_human_num
    K = cfg.sim.predict_steps
    active = _active_mask(cfg, state.human_num)
    cur = jnp.concatenate([state.humans.pos, state.humans.vel], axis=-1)

    if method == "const_vel":
        # velocity approximated by the previous belief's velocity for fair
        # comparison with GST (crowd_sim_var_num.py:171-174)
        vel0 = state.prev_human_states[:, 2:4]
        t = (jnp.arange(K + 1, dtype=cur.dtype)[:, None, None]
             * cfg.env.time_step * cfg.pred_interval)
        pos = cur[None, :, :2] + t * vel0[None, :, :]
        traj = jnp.concatenate(
            [pos, jnp.broadcast_to(vel0[None], (K + 1, A, 2))], axis=-1)
    elif method == "truth":
        inflate = 0.01 + cfg.orca.safety_space
        params = OrcaParams(cfg.env.time_step, cfg.orca.time_horizon,
                            state.orca_neighbor_dist)
        eye = jnp.eye(A, dtype=bool)
        # robot rolls out linearly iff visible (crowd_sim_var_num.py:200-204)
        robot_cur = jnp.concatenate([state.robot.pos, state.robot.vel])

        def roll(carry, _):
            humans4, robot4 = carry
            pos, vel = humans4[:, :2], humans4[:, 2:]
            goal_vec = state.humans.goal - pos
            speed = jnp.linalg.norm(goal_vec, axis=-1)
            pref = jnp.where((speed > 1.0)[:, None],
                             goal_vec / jnp.maximum(speed, 1e-9)[:, None],
                             goal_vec)
            # all active peers are neighbors, no FOV filter
            # (crowd_sim_var_num.py:186-194)
            nbr_pos = jnp.broadcast_to(pos[None], (A, A, 2))
            nbr_vel = jnp.broadcast_to(vel[None], (A, A, 2))
            nbr_rad = jnp.broadcast_to(state.humans.radius[None] + inflate,
                                       (A, A))
            nbr_mask = active[None, :] & ~eye
            if cfg.robot.visible:
                nbr_pos = jnp.concatenate(
                    [nbr_pos, jnp.broadcast_to(robot4[:2], (A, 1, 2))], axis=1)
                nbr_vel = jnp.concatenate(
                    [nbr_vel, jnp.broadcast_to(robot4[2:], (A, 1, 2))], axis=1)
                nbr_rad = jnp.concatenate(
                    [nbr_rad,
                     jnp.full((A, 1), state.robot.radius + inflate)], axis=1)
                nbr_mask = jnp.concatenate(
                    [nbr_mask, jnp.ones((A, 1), bool)], axis=1)
            new_vel = jax.vmap(orca_velocity,
                               in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))(
                pos, vel, state.humans.radius + inflate, state.humans.v_pref,
                pref, nbr_pos, nbr_vel, nbr_rad, nbr_mask, params)
            new_pos = pos + new_vel * cfg.env.time_step
            new_humans4 = jnp.concatenate([new_pos, new_vel], axis=-1)
            new_robot4 = robot4.at[:2].add(robot4[2:] * cfg.env.time_step)
            return (new_humans4, new_robot4), new_humans4

        _, steps = jax.lax.scan(roll, (cur, robot_cur), None,
                                length=cfg.buffer_len)
        traj = jnp.concatenate([cur[None], steps], axis=0)
        traj = traj[::cfg.pred_interval]                         # -> K+1 frames
    else:
        raise ValueError(f"unknown prediction method {method}")

    hidden = ~(visibility & active)
    traj = jnp.where(hidden[None, :, None],
                     jnp.array([15.0, 15.0, 0.0, 0.0]), traj)
    return traj


# --------------------------------------------------------------------------
# observation
# --------------------------------------------------------------------------

def _sorted_rows(edges, sort_key):
    order = jnp.argsort(sort_key, stable=True)
    return edges[order]


def generate_ob(cfg: Config, state: EnvState, reset: bool
                ) -> Tuple[Observation, EnvState]:
    """Build the dict observation and fold belief updates back into the state
    (crowd_sim_var_num.py:233-279, crowd_sim_pred.py:62-97,
    crowd_sim_pred_real_gst.py:76-94)."""
    A = cfg.sim.max_human_num
    K = cfg.sim.predict_steps
    vis = robot_human_visibility(cfg, state)
    num_vis = jnp.sum(vis.astype(jnp.int32))

    prev = state.last_human_states
    last = update_last_human_states(cfg, state, vis, reset=reset)
    state = state.replace(last_human_states=last, prev_human_states=prev,
                          visible_masks=vis)

    robot_node = jnp.concatenate([
        state.robot.pos, state.robot.radius[None], state.robot.goal,
        state.robot.v_pref[None], state.robot.theta[None]])
    temporal_edges = state.robot.vel

    method = cfg.sim.predict_method
    if method == "none":
        rel = last[:, :2] - state.robot.pos                       # beliefs
        edges = jnp.where(vis[:, None], rel, jnp.inf)
        if cfg.network.sort_humans:
            key = jnp.linalg.norm(jnp.where(vis[:, None], rel, jnp.inf), axis=-1)
            edges = _sorted_rows(edges, key)
            vis_out = jnp.arange(A) < num_vis
        else:
            vis_out = vis
        edges = jnp.where(jnp.isinf(edges), 15.0, edges)
    elif method in ("const_vel", "truth"):
        future = calc_human_future_traj(cfg, state, vis, method)
        state = state.replace(human_future_traj=future)
        rel = jnp.transpose(future[:, :, :2], (1, 0, 2)) - state.robot.pos
        rows = rel.reshape(A, 2 * (K + 1))
        edges = jnp.where(vis[:, None], rows, jnp.inf)
        if cfg.network.sort_humans:
            key = jnp.linalg.norm(jnp.where(vis[:, None], rows[:, :2], jnp.inf),
                                  axis=-1)
            edges = _sorted_rows(edges, key)
            vis_out = jnp.arange(A) < num_vis
        else:
            vis_out = vis
        edges = jnp.where(jnp.isinf(edges), 15.0, edges)
    elif method == "inferred":
        # placeholder: tile current rel pos; predictions arrive fused from the
        # GST module in the rollout (crowd_sim_pred_real_gst.py:90)
        rel = last[:, :2] - state.robot.pos
        base = jnp.where(vis[:, None], rel, jnp.inf)
        base = jnp.where(jnp.isinf(base), 15.0, base)
        edges = jnp.tile(base, (1, K + 1))
        vis_out = vis
    else:
        raise ValueError(method)

    obs = Observation(
        robot_node=robot_node.astype(jnp.float32),
        temporal_edges=temporal_edges.astype(jnp.float32),
        spatial_edges=edges.astype(jnp.float32),
        visible_masks=vis_out,
        detected_human_num=jnp.maximum(num_vis, 1).astype(jnp.int32),
    )
    return obs, state


# --------------------------------------------------------------------------
# reward
# --------------------------------------------------------------------------

def calc_reward(cfg: Config, state: EnvState, action_v, action_r, future_traj,
                phase: str, spin_coef=None):
    """R(s, a) (crowd_sim_var_num.py:465-561 + social term
    crowd_sim_pred.py:216-233). Returns (reward, done, StepInfo).

    ``spin_coef``: optional dynamic override of the unicycle spin-penalty
    coefficient (reward.spin_penalty_factor) — the training rollout anneals
    it via total_steps when reward.spin_penalty_warmup_steps > 0."""
    active = _active_mask(cfg, state.human_num)
    d = jnp.linalg.norm(state.humans.pos - state.robot.pos, axis=-1) \
        - state.humans.radius - state.robot.radius
    d = jnp.where(active, d, jnp.inf)
    collision = jnp.any(d < 0.0)
    dmin = jnp.min(d)

    unicycle = cfg.action_space.kinematics == "unicycle"
    goal_radius = 0.6 if unicycle else state.robot.radius
    reaching_goal = jnp.linalg.norm(state.robot.pos - state.robot.goal) < goal_radius

    if phase == "train":
        danger_cond = dmin < cfg.reward.discomfort_dist
        min_danger_dist = jnp.float32(0.0)
    else:
        # future danger zone from ground-truth rollout (crowd_sim_var_num.py:499-511)
        rel = future_traj[1:, :, :2] - state.robot.pos
        rel_dist = jnp.linalg.norm(rel, axis=-1)
        hit = rel_dist < state.robot.radius + cfg.humans.radius
        danger_cond = jnp.any(hit)
        min_danger_dist = jnp.where(
            danger_cond, jnp.min(jnp.where(hit, rel_dist, jnp.inf)), 0.0)

    timeout = state.global_time >= cfg.env.time_limit - 1.0

    pot_cur = jnp.linalg.norm(state.robot.pos - state.robot.goal)
    pot_factor = 3.0 if unicycle else 2.0
    pot_reward = pot_factor * (-jnp.abs(pot_cur) - state.potential)

    danger_reward = ((dmin - cfg.reward.discomfort_dist)
                     * cfg.reward.discomfort_penalty_factor * cfg.env.time_step)

    reward = jnp.where(
        timeout, 0.0,
        jnp.where(collision, cfg.reward.collision_penalty,
                  jnp.where(reaching_goal, cfg.reward.success_reward,
                            jnp.where(danger_cond, danger_reward, pot_reward))))
    done = timeout | ((~timeout) & (collision | reaching_goal))
    outcome = jnp.where(
        timeout, OUTCOME_TIMEOUT,
        jnp.where(collision, OUTCOME_COLLISION,
                  jnp.where(reaching_goal, OUTCOME_REACH_GOAL,
                            jnp.where(danger_cond, OUTCOME_DANGER,
                                      OUTCOME_NOTHING))))
    # potential only updates on the potential-reward branch (crowd_sim_var_num.py:540-543)
    took_pot = ~(timeout | collision | reaching_goal | danger_cond)
    new_potential = jnp.where(took_pot, -jnp.abs(pot_cur), state.potential)

    if unicycle:
        coef = cfg.reward.spin_penalty_factor if spin_coef is None \
            else spin_coef
        r_spin = -coef * action_r ** 2                    # crowd_sim_var_num.py:551
        r_back = jnp.where(action_v < 0, -2.0 * jnp.abs(action_v), 0.0)
        reward = reward + r_spin + r_back

    # social reward from predicted futures (CrowdSimPred only; GST env applies
    # it in the fused predictor wrapper instead, crowd_sim_pred_real_gst.py:97-101)
    if cfg.sim.predict_method in ("const_vel", "truth"):
        rel = future_traj[1:, :, :2] - state.robot.pos
        hit = jnp.linalg.norm(rel, axis=-1) < state.robot.radius + cfg.humans.radius
        coeff = 2.0 ** jnp.arange(2, cfg.sim.predict_steps + 2)
        penalties = cfg.reward.collision_penalty / coeff          # negative
        reward = reward + jnp.min(hit * penalties[:, None])

    info = StepInfo(outcome=outcome.astype(jnp.int32),
                    min_dist=jnp.where(phase == "train",
                                       jnp.float32(0.0), min_danger_dist),
                    in_danger=outcome == OUTCOME_DANGER)
    return reward, done, new_potential, info


# --------------------------------------------------------------------------
# mid-episode human population / goal dynamics
# --------------------------------------------------------------------------

def _respawn_humans(cfg: Config, key, state: EnvState, need,
                    placed=None) -> EnvState:
    """Regenerate every slot in ``need`` as a fresh circle-crossing human
    (batched form of crowd_sim_var_num.py:116-146): fresh attributes when
    randomized, position on the circle ring, goal opposite, velocity zero."""
    k_r, k_v, k_pos = jax.random.split(key, 3)
    A = cfg.sim.max_human_num
    if cfg.env.randomize_attributes:
        radius_new = jax.random.uniform(k_r, (A,), minval=0.3, maxval=0.5)
        v_pref_new = jax.random.uniform(k_v, (A,), minval=0.5, maxval=1.5)
    else:
        radius_new = jnp.full((A,), cfg.humans.radius)
        v_pref_new = jnp.full((A,), cfg.humans.v_pref)
    radius = jnp.where(need, radius_new, state.humans.radius)
    v_pref = jnp.where(need, v_pref_new, state.humans.v_pref)
    if placed is None:
        placed = _active_mask(cfg, state.human_num) & ~need
    robot_min = (cfg.sim.circle_radius / 2.0
                 if cfg.action_space.kinematics == "unicycle" else None)
    pos, goal = spawn.batched_circle_spawn(
        k_pos, need, radius, cfg.sim.circle_radius, state.robot.pos,
        state.robot.goal, state.robot.radius, state.humans.pos,
        state.humans.goal, radius, placed, cfg.reward.discomfort_dist,
        robot_min_dist=robot_min)
    humans = HumanState(
        pos=pos,
        vel=jnp.where(need[:, None], 0.0, state.humans.vel),
        goal=goal, radius=radius, v_pref=v_pref)
    return state.replace(humans=humans)


def update_human_goals_randomly(cfg: Config, key, state: EnvState) -> EnvState:
    """Every-5s random goal changes, each human w.p. goal_change_chance
    (crowd_sim.py:415-450), batched."""
    A = cfg.sim.max_human_num
    active = _active_mask(cfg, state.human_num)
    k_chance, k_goal = jax.random.split(key)
    change = (jax.random.uniform(k_chance, (A,)) <= cfg.humans.goal_change_chance)
    need = change & active & (state.humans.v_pref != 0.0)
    goal = spawn.batched_goal_resample(
        k_goal, need, state.humans.radius, state.humans.v_pref,
        cfg.sim.circle_radius, state.robot.pos, state.robot.goal,
        state.robot.radius, state.humans.pos, state.humans.goal,
        state.humans.radius, active, cfg.reward.discomfort_dist)
    return state.replace(humans=state.humans.replace(goal=goal))


def end_goal_updates(cfg: Config, key, state: EnvState) -> EnvState:
    """Humans that reached their goal are regenerated (holonomic,
    crowd_sim_var_num.py:451-458) or re-goaled (unicycle,
    crowd_sim.py:453-485), batched."""
    active = _active_mask(cfg, state.human_num)
    reached = active & (jnp.linalg.norm(state.humans.goal - state.humans.pos,
                                        axis=-1) < state.humans.radius)
    if cfg.action_space.kinematics == "holonomic":
        return _respawn_humans(cfg, key, state, reached)
    k_chance, k_goal = jax.random.split(key)
    A = cfg.sim.max_human_num
    change = (jax.random.uniform(k_chance, (A,))
              <= cfg.humans.end_goal_change_chance)
    need = reached & change
    goal = spawn.batched_goal_resample(
        k_goal, need, state.humans.radius, state.humans.v_pref,
        cfg.sim.circle_radius, state.robot.pos, state.robot.goal,
        state.robot.radius, state.humans.pos, state.humans.goal,
        state.humans.radius, active, cfg.reward.discomfort_dist)
    return state.replace(humans=state.humans.replace(goal=goal))


def vary_human_num(cfg: Config, key, state: EnvState, pred_rule: bool) -> EnvState:
    """Add/remove humans every 5 s (crowd_sim_var_num.py:406-439 /
    crowd_sim_pred.py:167-194). ``pred_rule`` selects the CrowdSimPred variant
    of max_remove_num."""
    A = cfg.sim.max_human_num
    key, k_coin, k_rm, k_add, k_gen = jax.random.split(key, 5)
    vis = state.visible_masks
    any_vis = jnp.any(vis)
    max_vis_id = jnp.max(jnp.where(vis, jnp.arange(A), -1))

    if pred_rule:
        # crowd_sim_pred.py:170-175
        max_rm = jnp.where(any_vis, (state.human_num - 1) - max_vis_id,
                           state.human_num - 1)
        max_rm = jnp.minimum(cfg.sim.human_num_range, max_rm)
    else:
        # crowd_sim_var_num.py:410-416
        max_rm = jnp.where(
            any_vis,
            jnp.minimum(state.human_num - cfg.sim.min_human_num,
                        (state.human_num - 1) - max_vis_id),
            state.human_num - cfg.sim.min_human_num)
    max_rm = jnp.maximum(max_rm, 0)
    remove_num = jax.random.randint(k_rm, (), 0, max_rm + 1)

    add_wanted = jax.random.randint(k_add, (), 0, cfg.sim.human_num_range + 1)
    add_num = jnp.minimum(add_wanted, A - state.human_num)

    do_remove = jax.random.uniform(k_coin, ()) < 0.5
    new_num = jnp.where(do_remove, state.human_num - remove_num,
                        state.human_num + add_num)

    idx = jnp.arange(A)
    is_new = (~do_remove) & (idx >= state.human_num) & (idx < new_num)
    placed = idx < state.human_num
    state = _respawn_humans(cfg, k_gen, state, is_new, placed)
    # fresh belief rows for new slots (crowd_sim_var_num.py:437)
    state = state.replace(
        last_human_states=jnp.where(is_new[:, None], BELIEF_DUMMY,
                                    state.last_human_states),
        human_num=new_num.astype(jnp.int32))
    return state


# --------------------------------------------------------------------------
# reset / step
# --------------------------------------------------------------------------

def reset(cfg: Config, key) -> Tuple[EnvState, Observation]:
    """Seeded episode generation (crowd_sim_var_num.py:303-363)."""
    A = cfg.sim.max_human_num
    K = cfg.sim.predict_steps
    (key, k_num, k_robot, k_humans, k_nd, k_state) = jax.random.split(key, 6)

    unicycle = cfg.action_space.kinematics == "unicycle"
    if unicycle:
        # crowd_sim_var_num.py:78-89
        pos, goal, theta = spawn.sample_unicycle_robot(
            k_robot, cfg.sim.arena_size, 4.0)
        human_num = jax.random.randint(
            k_num, (), 1, cfg.sim.human_num + cfg.sim.human_num_range + 1)
    else:
        pos, goal = spawn.sample_robot_position(k_robot, cfg.sim.arena_size, 8.0)
        theta = jnp.float32(jnp.pi / 2.0)
        human_num = jax.random.randint(
            k_num, (), cfg.sim.min_human_num, cfg.sim.max_human_num + 1)

    robot = RobotState(pos=pos, vel=jnp.zeros(2), theta=jnp.asarray(theta),
                       goal=goal, radius=jnp.float32(cfg.robot.radius),
                       v_pref=jnp.float32(cfg.robot.v_pref))

    # per-episode ORCA neighbor_dist (agent.py:21-22)
    if cfg.env.randomize_attributes:
        neighbor_dist = jax.random.uniform(k_nd, (), minval=5.0, maxval=10.0)
    else:
        neighbor_dist = jnp.float32(cfg.orca.neighbor_dist)

    humans = HumanState(
        pos=jnp.full((A, 2), 15.0), vel=jnp.zeros((A, 2)),
        goal=jnp.full((A, 2), 15.0),
        radius=jnp.full((A,), cfg.humans.radius),
        v_pref=jnp.full((A,), cfg.humans.v_pref))

    buf_len = cfg.obs_buffer_len if cfg.sim.predict_method == "inferred" else 0
    state = EnvState(
        key=k_state, robot=robot, humans=humans,
        human_num=human_num.astype(jnp.int32),
        last_human_states=jnp.broadcast_to(BELIEF_DUMMY, (A, 5)),
        prev_human_states=jnp.broadcast_to(BELIEF_DUMMY, (A, 5)),
        visible_masks=jnp.zeros((A,), bool),
        potential=-jnp.linalg.norm(pos - goal),
        global_time=jnp.float32(0.0), step_count=jnp.int32(0),
        desired_velocity=jnp.float32(0.0),
        orca_neighbor_dist=neighbor_dist,
        traj_buffer=jnp.full((buf_len, A, 2), -999.0),
        mask_buffer=jnp.zeros((buf_len, A), bool),
        human_future_traj=jnp.zeros((K + 1, A, 4)),
    )

    # batched human placement (priority-ordered parallel rejection rounds
    # standing in for the reference's sequential placement)
    need = jnp.arange(A) < state.human_num
    state = _respawn_humans(cfg, k_humans, state, need,
                            placed=jnp.zeros((A,), bool))

    obs, state = generate_ob(cfg, state, reset=True)
    return state, obs


def scripted_robot_action(cfg: Config, state: EnvState, policy: str):
    """ORCA / social-force robot baselines acting on the belief states
    (crowd_sim_var_num.py:371-375; CrowdSimPred ORCA variant uses the truth
    future rollout as extra neighbors, crowd_sim_pred.py:105-116)."""
    A = cfg.sim.max_human_num
    active = _active_mask(cfg, state.human_num)
    beliefs = state.last_human_states                       # (A, 5)
    goal_vec = state.robot.goal - state.robot.pos
    speed = jnp.linalg.norm(goal_vec)
    pref_vel = jnp.where(speed > 1.0, goal_vec / jnp.maximum(speed, 1e-9),
                         goal_vec)
    inflate = 0.01 + cfg.orca.safety_space
    if policy == "orca":
        if cfg.sim.predict_method == "none":
            nbr_pos, nbr_vel = beliefs[:, :2], beliefs[:, 2:4]
            nbr_radius = beliefs[:, 4] + inflate
            if cfg.orca.stale_neighbor_radii:
                # reference-artifact emulation (see OrcaConfig): persistent
                # RVO2 sim keeps episode-1 radii for the whole suite
                nbr_radius = jax.random.uniform(
                    jax.random.key(0), (A,), minval=0.3, maxval=0.5) + inflate
            nbr_mask = active
        else:
            # each predicted future position becomes an extra neighbor
            future = calc_human_future_traj(cfg, state, state.visible_masks,
                                            "truth")         # (K+1, A, 4)
            nbr_pos = future[:, :, :2].reshape(-1, 2)
            nbr_vel = future[:, :, 2:].reshape(-1, 2)
            nbr_radius = jnp.tile(beliefs[:, 4], future.shape[0]) + inflate
            nbr_mask = jnp.tile(active, future.shape[0])
        params = OrcaParams(cfg.env.time_step, cfg.orca.time_horizon,
                            state.orca_neighbor_dist)
        return orca_velocity(state.robot.pos, state.robot.vel,
                             state.robot.radius + inflate, state.robot.v_pref,
                             pref_vel, nbr_pos, nbr_vel, nbr_radius, nbr_mask,
                             params)
    elif policy == "social_force":
        return social_force_velocity(
            state.robot.pos, state.robot.vel, state.robot.radius,
            state.robot.goal, state.robot.v_pref, beliefs[:, :2],
            beliefs[:, 4], active, cfg.sf.A, cfg.sf.B, cfg.sf.KI,
            cfg.env.time_step)
    raise ValueError(policy)


def step(cfg: Config, state: EnvState, action, phase: str = "train",
         robot_policy: str = "network", human_actions=None, spin_coef=None
         ) -> Tuple[EnvState, Observation, jnp.ndarray, jnp.ndarray, StepInfo]:
    """One control step (crowd_sim_var_num.py:366-460 / crowd_sim_pred.py:100-213).

    ``action``: raw policy output (vx, vy) for holonomic or (dv, dtheta) for
    unicycle; clipping happens here (srnn.py:17-44). ``robot_policy``:
    'network' uses ``action``; 'orca'/'social_force' run the scripted
    baselines on the robot's belief states (ignoring ``action``).
    ``human_actions``: optional precomputed (A, 2) human velocities — the
    batched rollout hoists the ORCA solve out of the per-env vmap (the state
    consumed there is identical: human actions depend only on the pre-step
    state, not on the robot action or the split key).
    """
    key, k_dyn = jax.random.split(state.key)
    state = state.replace(key=key)
    unicycle = cfg.action_space.kinematics == "unicycle"

    if robot_policy != "network":
        action = scripted_robot_action(cfg, state, robot_policy)
        a = action
        action_v, action_r = jnp.linalg.norm(a), jnp.float32(0.0)
    elif unicycle:
        a = kinematics.clip_unicycle_action(action)
        desired_v = jnp.clip(state.desired_velocity + a[0],
                             -state.robot.v_pref, state.robot.v_pref)
        state = state.replace(desired_velocity=desired_v)
        action_v, action_r = desired_v, a[1]
    else:
        a = kinematics.clip_holonomic_action(action, state.robot.v_pref)
        action_v, action_r = jnp.linalg.norm(a), jnp.float32(0.0)

    if human_actions is None:
        human_actions = get_human_actions(cfg, state)

    # refresh truth future traj for intrusion accounting in test phase
    # (crowd_sim_var_num.py:385-388)
    if phase == "test":
        future = calc_human_future_traj(cfg, state, state.visible_masks, "truth")
        state = state.replace(human_future_traj=future)

    reward, done, new_potential, info = calc_reward(
        cfg, state, action_v, action_r, state.human_future_traj, phase,
        spin_coef=spin_coef)
    state = state.replace(potential=new_potential)

    # integrate robot + humans
    if unicycle:
        r_pos, r_theta, r_vel = kinematics.step_unicycle(
            state.robot.pos, state.robot.theta, action_v, action_r,
            cfg.env.time_step)
        robot = state.robot.replace(pos=r_pos, theta=r_theta, vel=r_vel)
    else:
        r_pos, r_vel = kinematics.step_holonomic(state.robot.pos, a,
                                                 cfg.env.time_step)
        robot = state.robot.replace(pos=r_pos, vel=r_vel)

    active = _active_mask(cfg, state.human_num)
    h_pos = jnp.where(active[:, None],
                      state.humans.pos + human_actions * cfg.env.time_step,
                      state.humans.pos)
    h_vel = jnp.where(active[:, None], human_actions, state.humans.vel)
    state = state.replace(
        robot=robot,
        humans=state.humans.replace(pos=h_pos, vel=h_vel),
        global_time=state.global_time + cfg.env.time_step,
        step_count=state.step_count + 1)

    # every-5s population / goal events (guarded by step counter)
    steps_per_5s = int(round(5.0 / cfg.env.time_step))
    at_5s = (state.step_count % steps_per_5s) == 0
    k_dyn, k_var, k_goals, k_end = jax.random.split(k_dyn, 4)

    if cfg.sim.human_num_range > 0:
        pred_rule = cfg.sim.predict_method != "none"
        varied = vary_human_num(cfg, k_var, state, pred_rule)
        state = jax.tree.map(lambda a, b: jnp.where(at_5s, a, b), varied, state)

    obs, state = generate_ob(cfg, state, reset=False)

    if cfg.humans.random_goal_changing:
        regoaled = update_human_goals_randomly(cfg, k_goals, state)
        state = jax.tree.map(lambda a, b: jnp.where(at_5s, a, b), regoaled, state)
    if cfg.humans.end_goal_changing:
        state = end_goal_updates(cfg, k_end, state)

    return state, obs, reward, done, info
