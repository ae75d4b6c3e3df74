"""EPMC terrain-traversal cost stack for the MPC solver.

The playground rewards (reference playground_env.py:479-539) negated into
stage costs, plus SDF-style obstacle clearance penalties so the solver avoids
box sides that the reference handles through hard contact. Used to run the
trajectory optimizer on the EPMC task (SURVEY.md section 7 layer 7).
"""
from typing import NamedTuple

import jax.numpy as jnp

from lifelike_tpu.costs import tracking
from lifelike_tpu.math import quat
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.scene import boxes


class TraversalWeights(NamedTuple):
    """fall/clearance are penalty weights; velocity/heading weight DENSE
    shaping terms (|speed - target| and 1 - heading alignment) that give the
    solver a nonzero gradient everywhere — the parity reward terms are
    near-flat over an MPC horizon (exp products saturate), so with shaping
    off (velocity=heading=0) the cost is exactly the negated env reward."""

    velocity: float = 0.3
    heading: float = 1.0
    clearance: float = 0.5
    fall: float = 5.0
    # Posture shaping: without it, "lie flat on the ground" is a local
    # optimum that beats risky stepping under the fall penalty (measured
    # closed-loop: the solver sinks the base to z~0.02 and crawls). The
    # reference never sees this because its low level is a mocap-prior
    # policy; the sampling MPC needs the stand prior in the cost.
    height: float = 4.0  # hinge below height_min on base z
    height_min: float = 0.26
    upright: float = 2.0  # 1 - body up-vector z
    pose: float = 0.05  # squared deviation from the stand pose
    # Crawl ceiling for the crouch skill: when ceiling > 0, a hinge
    # penalizes base height ABOVE it, pressing samples flat under hole
    # bars (the gait prior's z oscillation otherwise grazes the bar and
    # bounces the crawl back; measured in tools/debug_traversal.py).
    ceiling: float = 0.0
    ceiling_w: float = 8.0
    # Crawl gating for the crouch skill: boxes whose bottom face sits at
    # least crawl_gap above the ground (the playground hole bars,
    # bullet_static_entities.py:366-422: 0.25-0.3 m gaps) are CRAWLABLE —
    # the clearance hinge must not repel the very bar the crouch prior
    # exists to pass under. 0.0 (default) keeps every tall box blocking.
    crawl_gap: float = 0.0


# crouch-stand joint pose (STATES_INFO_12_RUN_0 family): the posture prior
STAND_POSE = (
    -0.0278, -0.7790, 1.6873, -0.0276, -0.7777, 1.6838,
    -0.0278, -0.7334, 1.5669, -0.0276, -0.7319, 1.5632,
)


def posture_cost(state: RobotState, weights=None):
    """Stand prior: height hinge + uprightness + stand-pose regularization.

    Batch-leading oracle; tile-layout twin in rollout_tasks.posture_cost_tl
    (parity pinned in tests/test_task_mpc.py)."""
    w = weights or TraversalWeights()
    z = state.base_pos[..., 2]
    up_z = 1.0 - 2.0 * (
        state.base_orn[..., 0] ** 2 + state.base_orn[..., 1] ** 2
    )
    stand = jnp.asarray(STAND_POSE, state.joint_pos.dtype)
    pose_err = jnp.mean((state.joint_pos - stand) ** 2, axis=-1)
    cost = (
        w.height * jnp.maximum(w.height_min - z, 0.0)
        + w.upright * (1.0 - up_z)
        + w.pose * pose_err
    )
    # getattr: the chase stage cost shares this posture prior through
    # ChaseWeights, which carries no ceiling field
    if getattr(w, "ceiling", 0.0) > 0.0:
        cost = cost + w.ceiling_w * jnp.maximum(z - w.ceiling, 0.0)
    return cost


def _dense_shaping(spd_signed, align, target_spd, weights):
    # SIGNED speed (see rollout_tasks._dense_shaping_tl): the parity
    # reward's |v . dir| must not leak into the shaping term, or backward
    # walking scores like forward.
    return (
        weights.velocity * jnp.abs(spd_signed - target_spd) / (1.0 + target_spd)
        + weights.heading * (1.0 - align)
    )


def joystick_cost(
    state: RobotState, target_pos, target_spd, weights=TraversalWeights()
):
    """1 - reward_vel * reward_rotation (joystick family, :479-502),
    plus dense shaping (see TraversalWeights)."""
    diff = (target_pos - state.base_pos)[..., :2]
    d = jnp.linalg.norm(diff, axis=-1).clip(1e-8)
    dir_w = diff / d[..., None]
    spd_sg = (
        state.base_lin_vel[..., 0] * dir_w[..., 0]
        + state.base_lin_vel[..., 1] * dir_w[..., 1]
    )
    r_vel = jnp.exp(-jnp.abs(jnp.abs(spd_sg) - target_spd))
    yaw = quat.yaw(state.base_orn)
    align = jnp.cos(yaw) * dir_w[..., 0] + jnp.sin(yaw) * dir_w[..., 1]
    r_rot = jnp.exp((align - 1.0) * 5.0)
    cost = 1.0 - r_vel * r_rot + _dense_shaping(spd_sg, align, target_spd, weights)
    cost = cost + posture_cost(state, weights)
    fall = tracking.fall_terminated(state)
    return cost + weights.fall * fall.astype(cost.dtype)


def progress_cost(state: RobotState, target_pos, last_dist, weights=TraversalWeights()):
    """Distance-progress cost (average_speed family, :504-539): positive when
    moving away from the target. Returns (cost, new_dist)."""
    d = jnp.linalg.norm((target_pos - state.base_pos)[..., :2], axis=-1)
    cost = d - last_dist + posture_cost(state, weights)
    fall = tracking.fall_terminated(state)
    return cost + weights.fall * fall.astype(cost.dtype), d


def clearance_cost(scene: boxes.BoxScene, state: RobotState, margin=0.15,
                   crawl_gap=0.0):
    """Penalize the base footprint approaching tall boxes (walls, hole bars):
    soft hinge on the horizontal distance to any box whose height range
    overlaps the body. Smooth stand-in for the reference's hard collisions.

    crawl_gap > 0 (a static float) exempts elevated boxes whose bottom face
    is at least crawl_gap above ground — the crouch skill's crawlable bars
    (see TraversalWeights.crawl_gap)."""
    p = state.base_pos
    d = jnp.abs(p[..., None, :2] - scene.center[..., :, :2])
    out = jnp.maximum(d - scene.half[..., :, :2], 0.0)
    horiz = jnp.linalg.norm(out, axis=-1)
    tall = (scene.center[..., :, 2] + scene.half[..., :, 2]) > 0.3
    blocking = tall & scene.active
    if crawl_gap > 0.0:
        bottom = scene.center[..., :, 2] - scene.half[..., :, 2]
        blocking = blocking & (bottom < crawl_gap)
    pen = jnp.maximum(margin - horiz, 0.0) * blocking
    return jnp.sum(pen**2, axis=-1)
