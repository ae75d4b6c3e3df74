"""Batched horizon rollouts of the quadruped dynamics under jit.

The workhorse of the MPC engine: roll a population of control sequences
through the physics (engine.control_step) for H control steps, accumulating
the tracking cost against the motion library at each step. Replaces the
reference's per-process PyBullet stepping (one env per actor,
reference run_pg_actor.py) with a single fused on-device computation over
(batch, horizon).
"""
from functools import partial

import jax
import jax.numpy as jnp

from lifelike_tpu.costs import tracking
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import dynamics, engine
from lifelike_tpu.physics.dynamics import RobotState


def ref_foot_positions(model, ref: motion_lib.FrameState):
    """Foot positions of the kinematic reference (FK on the ghost robot,
    reference compute_end_effector_info legged_robot.py:199-205)."""
    rs = RobotState(
        base_pos=ref.base_pos,
        base_orn=ref.base_orn,
        base_lin_vel=ref.base_lin_vel,
        base_ang_vel=ref.base_ang_vel,
        joint_pos=ref.joint_pos,
        joint_vel=ref.joint_vel,
    )
    return dynamics.forward_kinematics(model, rs).p_foot


def rollout_tracking(
    model,
    params: engine.PhysicsParams,
    clips: motion_lib.MotionClips,
    state: RobotState,
    clip_idx,
    t0,
    controls,
    terrain_fn=None,
    weights=tracking.TrackingWeights(),
):
    """Roll `controls` (..., H, 12) joint-target deltas from `state` at clip
    time t0; returns (total_cost (...,), final_state, per-step costs (..., H)).

    Controls are deltas on the *reference* joint positions at each step —
    warm-startable around the mocap and consistent with the reference action
    convention (Δq added to current joints, primitive_level_env.py:199-200).
    """
    policy_dt = params.dt * params.substeps

    def body(carry, u_t):
        s, t, step_i = carry
        ref = motion_lib.sample_frame(clips, clip_idx, t)
        target_q = ref.joint_pos + u_t
        s = engine.control_step(model, params, s, target_q, terrain_fn)
        t_next = t + policy_dt
        ref_next = motion_lib.sample_frame(clips, clip_idx, t_next)
        kin = dynamics.forward_kinematics(model, s)
        ref_feet = ref_foot_positions(model, ref_next)
        cost = tracking.tracking_cost(s, kin.p_foot, ref_next, ref_feet, weights)
        # falls / divergence are heavily penalized instead of branching
        bad = tracking.fall_terminated(s) | tracking.divergence_terminated(s, ref_next)
        cost = cost + 5.0 * bad.astype(cost.dtype)
        return (s, t_next, step_i + 1), cost

    H = controls.shape[-2]
    u_seq = jnp.moveaxis(controls, -2, 0)  # (H, ..., 12)
    (final_state, _, _), costs = jax.lax.scan(
        body, (state, t0, jnp.zeros((), jnp.int32)), u_seq
    )
    costs = jnp.moveaxis(costs, 0, -1)  # (..., H)
    return jnp.sum(costs, axis=-1), final_state, costs
