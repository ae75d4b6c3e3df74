"""Terrain-traversal (EPMC) and Chase-Tag (SEPMC) MPC rollouts, tile layout.

The trajectory-optimization counterparts of the playground and chase-tag
RL tasks: horizon rollouts through the tile-layout physics WITH box-scene
contact, scored by the negated task rewards —

  * traversal: joystick / average-speed families
    (reference max_game_elements/playground_env.py:479-539) plus a soft
    clearance hinge that keeps samples off walls the hard SDF contact would
    smash them into;
  * chase: chaser distance-progress, escapee flag-progress/evasion
    (reference max_game/chase_tag_game_env.py:640-697), with the opponent
    following a PRECOMPUTED plan trajectory — alternating best response
    between the two robots' solvers supplies the self-play coupling
    (SURVEY.md section 7 layer 10).

Like rollout_tl's reference hoisting, everything that depends only on
(scenario, step) — the opponent plan, the pruned contact scene — is computed
once per solve and broadcast over the (Bs, L) sample population.

The batch-leading cost oracles live in costs/traversal.py and costs/chase.py;
tests/test_task_mpc.py pins tile-vs-oracle cost equality.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.costs.chase import ChaseWeights
from lifelike_tpu.costs.traversal import TraversalWeights
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine_tl
from lifelike_tpu.solver.rollout_tl import fall_mask_tl, yaw_tl

# ------------------------------------------------------------- traversal


def clearance_cost_tl(ts: engine_tl.TLScene, base_pos, margin=0.15,
                      tall_threshold=0.3, crawl_gap=0.0):
    """Tile-layout costs.traversal.clearance_cost: squared hinge on the
    horizontal distance from the base to any tall active box.
    base_pos (3, Bs, L) -> (Bs, L). crawl_gap > 0 exempts elevated boxes
    whose bottom face clears crawl_gap (the crouch skill's crawlable hole
    bars; see TraversalWeights.crawl_gap)."""
    d = jnp.abs(base_pos[None, :2] - ts.center[:, :2])  # (N, 2, Bs, L)
    out = jnp.maximum(d - ts.half[:, :2], 0.0)
    horiz = jnp.sqrt(jnp.sum(out * out, axis=1))  # (N, Bs, L)
    tall = (ts.center[:, 2] + ts.half[:, 2]) > tall_threshold
    blocking = tall * ts.active
    if crawl_gap > 0.0:
        bottom = ts.center[:, 2] - ts.half[:, 2]
        blocking = blocking * (bottom < crawl_gap)
    pen = jnp.maximum(margin - horiz, 0.0) * blocking
    return jnp.sum(pen**2, axis=0)


def posture_cost_tl(s: B.TLState, w):
    """costs.traversal.posture_cost in tile layout: stand prior (height
    hinge + uprightness + stand-pose regularization) — shared by the
    traversal AND chase stage costs (both weight tuples carry the fields).
    """
    from lifelike_tpu.costs.traversal import STAND_POSE

    z = s.base_pos[2]
    up_z = 1.0 - 2.0 * (s.base_orn[0] ** 2 + s.base_orn[1] ** 2)
    stand = jnp.asarray(STAND_POSE, s.joint_pos.dtype).reshape(4, 3)
    pose_err = jnp.mean(
        (s.joint_pos - stand[..., None, None]) ** 2, axis=(0, 1)
    )
    cost = (
        w.height * jnp.maximum(w.height_min - z, 0.0)
        + w.upright * (1.0 - up_z)
        + w.pose * pose_err
    )
    if getattr(w, "ceiling", 0.0) > 0.0:
        cost = cost + w.ceiling_w * jnp.maximum(z - w.ceiling, 0.0)
    return cost


def _direction_terms(s: B.TLState, target_pos):
    """Shared joystick geometry: unit direction to target, speed along it
    (absolute, reference parity + SIGNED for shaping), heading-alignment
    dot. target_pos (3,[ Bs, L]) broadcastable."""
    diff = target_pos[:2] - s.base_pos[:2]  # (2, Bs, L)
    d = jnp.sqrt(jnp.sum(diff * diff, axis=0)).clip(1e-8)
    dir_w = diff / d[None]
    spd_signed = (
        s.base_lin_vel[0] * dir_w[0] + s.base_lin_vel[1] * dir_w[1]
    )
    yaw = yaw_tl(s.base_orn)
    align = jnp.cos(yaw) * dir_w[0] + jnp.sin(yaw) * dir_w[1]
    return d, jnp.abs(spd_signed), spd_signed, align


def _dense_shaping_tl(spd_signed, align, target_spd, w: TraversalWeights):
    """Dense speed/heading shaping — see costs.traversal.TraversalWeights:
    with velocity=heading=0 the stage cost is exactly the negated reward.
    SIGNED speed on purpose: the parity reward's |v . dir| scores backward
    motion like forward, and a bounced solver then walks away from the
    course (measured in tools/debug_traversal.py cubes run)."""
    return (
        w.velocity * jnp.abs(spd_signed - target_spd) / (1.0 + target_spd)
        + w.heading * (1.0 - align)
    )


def joystick_cost_tl(s: B.TLState, target_pos, target_spd,
                     w: TraversalWeights = TraversalWeights()):
    """1 - reward_vel * reward_rotation (playground_env.py:479-502)
    + dense shaping + fall."""
    _, spd, spd_sg, align = _direction_terms(s, target_pos)
    r_vel = jnp.exp(-jnp.abs(spd - target_spd))
    r_rot = jnp.exp((align - 1.0) * 5.0)
    cost = 1.0 - r_vel * r_rot + _dense_shaping_tl(spd_sg, align, target_spd, w)
    cost = cost + posture_cost_tl(s, w)
    return cost + w.fall * fall_mask_tl(s).astype(cost.dtype)


def avg_speed_cost_tl(s: B.TLState, target_pos, target_spd, last_dist,
                      init_dist, max_steps=1000,
                      w: TraversalWeights = TraversalWeights()):
    """Negated average_speed family stage reward (playground_env.py:504-539):
    0.1 * dist-progress - 0.2/max_steps * rotation, plus dense shaping.
    Returns (cost, new_dist)."""
    d, spd, spd_sg, align = _direction_terms(s, target_pos)
    r_rot = jnp.exp((align - 1.0) * 5.0)
    r_dist = (d - last_dist) / init_dist
    cost = 0.1 * r_dist - (0.2 / float(max_steps)) * r_rot
    cost = cost + _dense_shaping_tl(spd_sg, align, target_spd, w)
    cost = cost + posture_cost_tl(s, w)
    return cost + w.fall * fall_mask_tl(s).astype(cost.dtype), d


def rollout_traversal(
    c: B.TLConstants,
    params,
    state: B.TLState,
    controls,
    ts: engine_tl.TLScene,
    target_pos,
    target_spd,
    reward_type="joystick",
    max_steps=1000,
    weights: TraversalWeights = TraversalWeights(),
):
    """controls: (H, 4, 3, Bs, L) joint-target deltas on the INITIAL pose
    (the EPMC env's action is a delta on the current joints; over an
    open-loop horizon the initial pose is the stationary nominal).

    target_pos: (3,) or (3, Bs, L); target_spd scalar. Returns
    (total_cost (Bs, L), final TLState)."""
    q0 = state.joint_pos
    tp = target_pos if target_pos.ndim == 3 else target_pos[:, None, None]
    d0 = jnp.sqrt(
        jnp.sum((tp[:2] - state.base_pos[:2]) ** 2, axis=0)
    ).clip(1e-8)

    def body(carry, u_t):
        s, last_d = carry
        s = engine_tl.control_step(c, params, s, q0 + u_t, scene=ts)
        if reward_type == "joystick":
            cost = joystick_cost_tl(s, tp, target_spd, weights)
            new_d = last_d
        else:
            cost, new_d = avg_speed_cost_tl(
                s, tp, target_spd, last_d, d0, max_steps, weights
            )
        cost = cost + weights.clearance * clearance_cost_tl(
            ts, s.base_pos, crawl_gap=weights.crawl_gap
        )
        return (s, new_d), cost

    (final, _), costs = jax.lax.scan(body, (state, d0), controls)
    return jnp.sum(costs, axis=0), final


def rollout_traversal_gait(
    c: B.TLConstants,
    params,
    state: B.TLState,
    controls,
    ts: engine_tl.TLScene,
    ref,
    target_pos,
    target_spd,
    reward_type="joystick",
    max_steps=1000,
    weights: TraversalWeights = TraversalWeights(),
    gait_weight=1.0,
    gait_vel_weight=0.02,
):
    """Gait-prior traversal rollout: controls are deltas on a WALK-CLIP's
    joint trajectory (ref: rollout_tl.RefTraj), so u=0 replays the mocap
    gait and the task cost steers it — the solver-side mirror of the
    reference's LLC/MLC split (EPMC emits codebook indices that drive the
    frozen mocap-prior PMC decoder, epmc_net.py:166-174). Raw-delta
    sampling (rollout_traversal) cannot synthesize a gait de novo: measured
    closed-loop it creeps ~0.3 m and falls; with the clip prior the same
    MPPI walks (see EVAL.md).

    Stage cost = traversal task terms (joystick/avg_speed + clearance +
    posture) + gait_weight * joint-space clip tracking (base-free: only
    joints/joint velocities — heading stays task-driven).
    Returns (total_cost (Bs, L), final TLState)."""
    q0_ref = ref.target_joint  # (H, 4, 3, 1, 1)
    tp = target_pos if target_pos.ndim == 3 else target_pos[:, None, None]
    d0 = jnp.sqrt(
        jnp.sum((tp[:2] - state.base_pos[:2]) ** 2, axis=0)
    ).clip(1e-8)

    def body(carry, x):
        s, last_d = carry
        u_t, tj, rq, rqd = x
        s = engine_tl.control_step(c, params, s, tj + u_t, scene=ts)
        if reward_type == "joystick":
            cost = joystick_cost_tl(s, tp, target_spd, weights)
            new_d = last_d
        else:
            cost, new_d = avg_speed_cost_tl(
                s, tp, target_spd, last_d, d0, max_steps, weights
            )
        cost = cost + weights.clearance * clearance_cost_tl(
            ts, s.base_pos, crawl_gap=weights.crawl_gap
        )
        gait = jnp.mean((s.joint_pos - rq) ** 2, axis=(0, 1))
        gait = gait + gait_vel_weight * jnp.mean(
            (s.joint_vel - rqd) ** 2, axis=(0, 1)
        )
        cost = cost + gait_weight * gait
        return (s, new_d), cost

    (final, _), costs = jax.lax.scan(
        body, (state, d0),
        (controls, q0_ref, ref.joint_pos, ref.joint_vel),
    )
    return jnp.sum(costs, axis=0), final


# ----------------------------------------------------------------- chase


def chaser_cost_tl(s: B.TLState, opp_pos, w: ChaseWeights = ChaseWeights()):
    """costs.chase.chaser_cost in tile layout: close the distance + heading
    alignment (reference _compute_chaser_{reward,common_reward} :654-662,
    :683-705 — distance progress telescopes into the summed stage distance).
    opp_pos (3, Bs, L)-broadcastable."""
    diff = opp_pos[:2] - s.base_pos[:2]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=0))
    dir_w = diff / d[None].clip(1e-8)
    yaw = yaw_tl(s.base_orn)
    align = jnp.cos(yaw) * dir_w[0] + jnp.sin(yaw) * dir_w[1]
    r_rot = jnp.exp((align - 1.0) * 2.0)
    cost = w.distance * d + w.heading * (1.0 - r_rot)
    return cost + w.fall * fall_mask_tl(s).astype(cost.dtype)


def escapee_cost_tl(s: B.TLState, opp_pos, flag_pos, flag_visible=1.0,
                    w: ChaseWeights = ChaseWeights()):
    """costs.chase.escapee_cost in tile layout: evade the chaser while
    closing on the (visible) flag (reference _compute_escapee_reward
    :666-680)."""
    d_opp = jnp.sqrt(jnp.sum((opp_pos[:2] - s.base_pos[:2]) ** 2, axis=0))
    d_flag = jnp.sqrt(jnp.sum((flag_pos[:2] - s.base_pos[:2]) ** 2, axis=0))
    cost = -w.distance * d_opp + w.distance * flag_visible * d_flag
    return cost + w.fall * fall_mask_tl(s).astype(cost.dtype)


def rollout_chase(
    c: B.TLConstants,
    params,
    state: B.TLState,
    controls,
    ts: engine_tl.TLScene,
    opp_traj,
    flag_pos,
    is_chaser,
    weights: ChaseWeights = ChaseWeights(),
):
    """Chase-Tag horizon rollout for ONE robot against a fixed opponent plan.

    controls: (H, 4, 3, Bs, L) deltas on the initial pose; opp_traj:
    (H, 3, 1, 1) opponent base positions (precomputed once per solve);
    flag_pos (3,) or broadcastable; is_chaser: bool scalar/array — the cost
    switches per role as masked arithmetic so one compiled solve serves both.
    Returns (total_cost (Bs, L), final TLState)."""
    q0 = state.joint_pos
    fp = flag_pos if flag_pos.ndim == 3 else flag_pos[:, None, None]
    chaser_m = jnp.asarray(is_chaser, state.base_pos.dtype)

    def body(s, x):
        u_t, opp_t = x
        s = engine_tl.control_step(c, params, s, q0 + u_t, scene=ts)
        c_ch = chaser_cost_tl(s, opp_t, weights)
        c_es = escapee_cost_tl(s, opp_t, fp, 1.0, weights)
        cost = chaser_m * c_ch + (1.0 - chaser_m) * c_es
        cost = cost + posture_cost_tl(s, weights)
        cost = cost + 0.5 * clearance_cost_tl(ts, s.base_pos)
        return s, cost

    final, costs = jax.lax.scan(body, state, (controls, opp_traj))
    return jnp.sum(costs, axis=0), final


def rollout_chase_gait(
    c: B.TLConstants,
    params,
    state: B.TLState,
    controls,
    ts: engine_tl.TLScene,
    ref,
    opp_traj,
    flag_pos,
    is_chaser,
    weights: ChaseWeights = ChaseWeights(),
    gait_weight=1.0,
    gait_vel_weight=0.02,
):
    """Chase rollout with the walk-clip gait prior (see
    rollout_traversal_gait): controls are deltas on ref.target_joint."""
    fp = flag_pos if flag_pos.ndim == 3 else flag_pos[:, None, None]
    chaser_m = jnp.asarray(is_chaser, state.base_pos.dtype)

    def body(s, x):
        u_t, tj, rq, rqd, opp_t = x
        s = engine_tl.control_step(c, params, s, tj + u_t, scene=ts)
        c_ch = chaser_cost_tl(s, opp_t, weights)
        c_es = escapee_cost_tl(s, opp_t, fp, 1.0, weights)
        cost = chaser_m * c_ch + (1.0 - chaser_m) * c_es
        cost = cost + posture_cost_tl(s, weights)
        cost = cost + 0.5 * clearance_cost_tl(ts, s.base_pos)
        gait = jnp.mean((s.joint_pos - rq) ** 2, axis=(0, 1))
        gait = gait + gait_vel_weight * jnp.mean(
            (s.joint_vel - rqd) ** 2, axis=(0, 1)
        )
        cost = cost + gait_weight * gait
        return s, cost

    final, costs = jax.lax.scan(
        body, state,
        (controls, ref.target_joint, ref.joint_pos, ref.joint_vel, opp_traj),
    )
    return jnp.sum(costs, axis=0), final


def rollout_plan_gait(c: B.TLConstants, params, state: B.TLState, u_plan,
                      ts: engine_tl.TLScene, ref):
    """rollout_plan with the gait-prior control convention (deltas on the
    clip joints)."""
    def body(s, x):
        u_t, tj = x
        s = engine_tl.control_step(c, params, s, tj + u_t, scene=ts)
        return s, s.base_pos

    u_seq = u_plan[..., None, None] if u_plan.ndim == 3 else u_plan
    _, traj = jax.lax.scan(body, state, (u_seq, ref.target_joint))
    return traj


def rollout_plan(c: B.TLConstants, params, state: B.TLState, u_plan,
                 ts: engine_tl.TLScene):
    """Roll ONE control plan (H, 4, 3) for a single scenario (batch (1, 1))
    and return its base-position trajectory (H, 3, 1, 1) — the opponent's
    hoisted path for rollout_chase."""
    q0 = state.joint_pos

    def body(s, u_t):
        s = engine_tl.control_step(c, params, s, q0 + u_t[..., None, None],
                                   scene=ts)
        return s, s.base_pos

    _, traj = jax.lax.scan(body, state, u_plan)
    return traj
