"""Tile-layout horizon rollouts: the TPU-speed MPC inner loop.

Two structural optimizations over solver.rollout (the readable oracle):

  1. Batch-trailing layout (physics.batched/engine_tl): the population fills
     (8, 128) VPU tiles.
  2. Reference hoisting: the mocap reference depends only on (scenario, step),
     never on the control sample — so clip gathers, slerp and reference FK
     are precomputed ONCE per solve into (H, ...) arrays and broadcast over
     the population, instead of being recomputed by all K candidates at every
     step (as the reference's per-env stepping effectively does).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.costs.tracking import TrackingWeights
from lifelike_tpu.math import quat_tl
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import dynamics, engine_tl
from lifelike_tpu.physics.dynamics import RobotState

# exponential scales, reference primitive_level_env.py:373-377
_S_JP = -1.0
_S_JV = -0.1
_S_EE = -40.0
_S_RP = (-20.0, -10.0)
_S_RV = (-2.0, -0.2)


class RefTraj(NamedTuple):
    """Per-step reference, tile layout with two trailing singleton batch axes.

    target_joint: (H, 4, 3, 1, 1) joints the controls are deltas on (time t_i)
    cost state (time t_{i+1}):
    joint_pos/joint_vel: (H, 4, 3, 1, 1)
    foot_pos: (H, 4, 3, 1, 1)
    base_pos/base_lin_vel/base_ang_vel: (H, 3, 1, 1)
    base_orn: (H, 4, 1, 1)
    """

    target_joint: jnp.ndarray
    joint_pos: jnp.ndarray
    joint_vel: jnp.ndarray
    foot_pos: jnp.ndarray
    base_pos: jnp.ndarray
    base_orn: jnp.ndarray
    base_lin_vel: jnp.ndarray
    base_ang_vel: jnp.ndarray


def precompute_reference(model, clips, clip_idx, t0, horizon, policy_dt) -> RefTraj:
    """Build the reference trajectory for one scenario (scalar clip_idx/t0)."""
    steps = jnp.arange(horizon, dtype=jnp.result_type(t0, jnp.float32))
    t_now = t0 + steps * policy_dt  # (H,)
    t_next = t_now + policy_dt
    ref_now = motion_lib.sample_frame(clips, clip_idx, t_now)  # leaves (H, k)
    ref_next = motion_lib.sample_frame(clips, clip_idx, t_next)
    rs = RobotState(
        base_pos=ref_next.base_pos,
        base_orn=ref_next.base_orn,
        base_lin_vel=ref_next.base_lin_vel,
        base_ang_vel=ref_next.base_ang_vel,
        joint_pos=ref_next.joint_pos,
        joint_vel=ref_next.joint_vel,
    )
    foot = dynamics.forward_kinematics(model, rs).p_foot  # (H, 4, 3)

    def t43(x):  # (H, 12) -> (H, 4, 3, 1, 1)
        return x.reshape(x.shape[0], 4, 3)[..., None, None]

    def tk(x):  # (H, k) -> (H, k, 1, 1)
        return x[..., None, None]

    return RefTraj(
        target_joint=t43(ref_now.joint_pos),
        joint_pos=t43(ref_next.joint_pos),
        joint_vel=t43(ref_next.joint_vel),
        foot_pos=foot[..., None, None],
        base_pos=tk(ref_next.base_pos),
        base_orn=tk(ref_next.base_orn),
        base_lin_vel=tk(ref_next.base_lin_vel),
        base_ang_vel=tk(ref_next.base_ang_vel),
    )


def fall_mask_tl(s: B.TLState):
    """Reference check_terminate (legged_robot.py:158-179) as masked arithmetic
    in tile layout: roll > 45 deg or pitch > 60 deg. Returns bool (Bs, L)."""
    m = quat_tl.to_matrix(s.base_orn)
    fwd, up = m[:, 0], m[:, 2]
    left_z = up[0] * fwd[1] - up[1] * fwd[0]
    return (jnp.abs(left_z) > jnp.sin(jnp.pi / 4)) | (up[2] < jnp.cos(jnp.pi / 3))


def yaw_tl(q):
    """Base yaw from a tile-layout quaternion (4, Bs, L) -> (Bs, L)."""
    m = quat_tl.to_matrix(q)
    return jnp.arctan2(m[1, 0], m[0, 0])


def tracking_cost_step(s: B.TLState, foot_pos, ref_t, weights: TrackingWeights):
    """1 - tracking_reward in tile layout; ref_t = RefTraj sliced at one step."""
    w = jnp.asarray(weights, dtype=s.base_pos.dtype)
    w = w / jnp.sum(w)
    r_jp = jnp.exp(_S_JP * jnp.sum((s.joint_pos - ref_t.joint_pos) ** 2, axis=(0, 1)))
    r_jv = jnp.exp(_S_JV * jnp.sum((s.joint_vel - ref_t.joint_vel) ** 2, axis=(0, 1)))
    r_ee = jnp.exp(_S_EE * jnp.sum((foot_pos - ref_t.foot_pos) ** 2, axis=(0, 1)))
    angle = quat_tl.rel_angle(ref_t.base_orn, s.base_orn)
    r_rp = jnp.exp(
        _S_RP[0] * jnp.sum((s.base_pos - ref_t.base_pos) ** 2, axis=0)
        + _S_RP[1] * angle**2
    )
    r_rv = jnp.exp(
        _S_RV[0] * jnp.sum((s.base_lin_vel - ref_t.base_lin_vel) ** 2, axis=0)
        + _S_RV[1] * jnp.sum((s.base_ang_vel - ref_t.base_ang_vel) ** 2, axis=0)
    )
    reward = w[0] * r_jp + w[1] * r_jv + w[2] * r_ee + w[3] * r_rp + w[4] * r_rv
    cost = 1.0 - reward

    # fall / divergence penalties as masked arithmetic (no branches)
    fall = fall_mask_tl(s)
    pos_err = jnp.sum((s.base_pos - ref_t.base_pos) ** 2, axis=0)
    diverged = (pos_err > 1.0) | (angle > 1.0)
    return cost + 5.0 * (fall | diverged).astype(cost.dtype)


def rollout_tracking(
    c: B.TLConstants,
    params,
    state: B.TLState,
    controls,
    ref: RefTraj,
    terrain_fn=None,
    weights: TrackingWeights = TrackingWeights(),
):
    """controls: (H, 4, 3, Bs, L) joint-target deltas on ref.target_joint.

    Returns (total_cost (Bs, L), final TLState)."""

    def body(s, x):
        u_t, ref_t = x
        target_q = ref_t.target_joint + u_t
        s = engine_tl.control_step(c, params, s, target_q, terrain_fn)
        kin = B.fk(c, s)
        cost = tracking_cost_step(s, kin.p_foot, ref_t, weights)
        return s, cost

    final, costs = jax.lax.scan(body, state, (controls, ref))
    return jnp.sum(costs, axis=0), final
