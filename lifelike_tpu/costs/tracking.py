"""PMC mocap-tracking reward/cost, batched.

Exact port of the math (not the code) of the reference imitation reward
(reference primitive_level_env.py:350-426): a normalized weighted sum of five
exponential terms comparing the dynamic robot against the kinematic reference
frame — joint positions, joint velocities, end-effector (foot) positions,
root pose, root velocity. Used both as an RL reward and, negated, as the MPC
stage cost.
"""
from typing import NamedTuple

import jax.numpy as jnp

from lifelike_tpu.math import quat
from lifelike_tpu.physics.dynamics import RobotState


class TrackingWeights(NamedTuple):
    # defaults from reference primitive_level_env.py:359-363 (pre-normalization)
    joint_pos: float = 0.6
    joint_vel: float = 0.05
    end_effector: float = 0.1
    root_pose: float = 0.15
    root_vel: float = 0.1


# exponential scales, reference primitive_level_env.py:373-377
_SCALE_JOINT_POS = -1.0
_SCALE_JOINT_VEL = -0.1
_SCALE_END_EFFECTOR = -40.0
_SCALE_ROOT_POSE = (-20.0, -10.0)
_SCALE_ROOT_VEL = (-2.0, -0.2)


def tracking_reward(
    state: RobotState,
    foot_pos,
    ref,
    ref_foot_pos,
    weights: TrackingWeights = TrackingWeights(),
):
    """Reward in [0, 1]. foot_pos/ref_foot_pos: (..., 4, 3) world foot centers.

    `ref` needs fields base_pos/base_orn/base_lin_vel/base_ang_vel/joint_pos/
    joint_vel (RobotState or FrameState).
    """
    w = jnp.asarray(weights, dtype=state.joint_pos.dtype)
    w = w / jnp.sum(w)

    r_jp = jnp.exp(
        _SCALE_JOINT_POS * jnp.sum((state.joint_pos - ref.joint_pos) ** 2, axis=-1)
    )
    r_jv = jnp.exp(
        _SCALE_JOINT_VEL * jnp.sum((state.joint_vel - ref.joint_vel) ** 2, axis=-1)
    )
    r_ee = jnp.exp(
        _SCALE_END_EFFECTOR
        * jnp.sum((foot_pos - ref_foot_pos) ** 2, axis=(-2, -1))
    )
    # eps-regularized norm: the plain norm has a NaN gradient/Hessian at
    # perfect alignment, which breaks the iLQR quadratization
    rv = quat.diff_rotvec(ref.base_orn, state.base_orn)
    angle = jnp.sqrt(jnp.sum(rv**2, axis=-1) + 1e-12)
    r_pose = jnp.exp(
        _SCALE_ROOT_POSE[0] * jnp.sum((state.base_pos - ref.base_pos) ** 2, axis=-1)
        + _SCALE_ROOT_POSE[1] * angle**2
    )
    r_vel = jnp.exp(
        _SCALE_ROOT_VEL[0]
        * jnp.sum((state.base_lin_vel - ref.base_lin_vel) ** 2, axis=-1)
        + _SCALE_ROOT_VEL[1]
        * jnp.sum((state.base_ang_vel - ref.base_ang_vel) ** 2, axis=-1)
    )
    return w[0] * r_jp + w[1] * r_jv + w[2] * r_ee + w[3] * r_pose + w[4] * r_vel


def tracking_cost(state, foot_pos, ref, ref_foot_pos, weights=TrackingWeights()):
    """MPC stage cost = 1 - reward (nonnegative, zero at perfect tracking)."""
    return 1.0 - tracking_reward(state, foot_pos, ref, ref_foot_pos, weights)


def fall_terminated(state: RobotState):
    """Fall detection matching reference legged_robot.py:158-179.

    roll: |arcsin(left_z)| > 45 deg via left_z = (up x fwd)_z computed from
    column vectors of R; pitch: up_z < cos(60 deg).
    """
    m = quat.to_matrix(state.base_orn)
    fwd = m[..., :, 0]
    up = m[..., :, 2]
    left_z = up[..., 0] * fwd[..., 1] - up[..., 1] * fwd[..., 0]
    roll_bad = jnp.abs(left_z) > jnp.sin(jnp.pi / 4.0)
    pitch_bad = up[..., 2] < jnp.cos(jnp.pi / 3.0)
    return roll_bad | pitch_bad


def divergence_terminated(state: RobotState, ref):
    """Dyn-kin divergence termination (reference primitive_level_env.py:319-335):
    squared position error > 1 m^2 or relative rotation angle > 1 rad."""
    pos_err = jnp.sum((state.base_pos - ref.base_pos) ** 2, axis=-1)
    angle = jnp.linalg.norm(quat.diff_rotvec(ref.base_orn, state.base_orn), axis=-1)
    return (pos_err > 1.0) | (jnp.abs(angle) > 1.0)


def blown_up(state: RobotState):
    """Integrator-blowup guard: non-finite state or velocities beyond any
    physical bound (1e3 m/s | rad/s).

    NaN compares False in every other termination predicate, so a penalty-
    contact blowup under a random exploring policy would otherwise NEVER
    terminate — and a single diverged env poisons a whole (T, B) PPO batch
    with NaN rewards (observed at 256 envs x 128 steps within 5 updates).
    The reference plant cannot reach this state (Bullet's LCP solver is
    unconditionally dissipative at contacts); the explicit compliant
    sampling path can, so the env terminates such rows and the autoreset
    wrapper re-initializes them."""
    bad = jnp.zeros(state.base_pos.shape[:-1], bool)
    for leaf in (state.base_pos, state.base_orn, state.base_lin_vel,
                 state.base_ang_vel, state.joint_pos, state.joint_vel):
        bad = bad | ~jnp.all(jnp.isfinite(leaf), axis=-1)
    for vel in (state.base_lin_vel, state.base_ang_vel, state.joint_vel):
        bad = bad | (jnp.max(jnp.abs(vel), axis=-1) > 1e3)
    return bad
