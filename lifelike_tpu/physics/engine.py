"""Physics stepping for the MAX quadruped: PD control + dynamics + contact.

The jittable, batched replacement for the reference inner loop
(reference primitive_level_env.py:202-210): 10 PD substeps at 500 Hz per
50 Hz control step. The PD law matches reference legged_robot.py:119-148
exactly: targets clipped to +-3 rad, tau = kp (q* - q) + kd (0 - qd),
clipped to +-max_tau. URDF joint damping (0.1) and Coulomb joint friction
(0.5 N m, smoothed) act as additional passive torques, matching the URDF
<dynamics> tags Bullet honors.

Everything is functional: `step(model, params, state, target_q) -> state`,
vmap/pjit over leading batch axes.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.math import quat
from lifelike_tpu.physics import dynamics
from lifelike_tpu.physics.contact import ContactParams, sphere_ground_force
from lifelike_tpu.physics.dynamics import Kinematics, RobotState


class PhysicsParams(NamedTuple):
    """Per-episode physics configuration (broadcastable leaves for batching)."""

    kp: jnp.ndarray = 50.0  # reference example_pmc_train.sh:75
    kd: jnp.ndarray = 0.5
    max_tau: jnp.ndarray = 18.0
    foot_friction: jnp.ndarray = 0.5
    dt: float = 1.0 / 500.0
    substeps: int = 10
    # numpy on purpose: PhysicsParams is closed over by jitted code, and
    # closed-over *device* arrays force a slow dispatch path (see
    # batched.tl_constants docstring).
    ext_force: jnp.ndarray = np.zeros(3, np.float32)  # PushRandomizer base force
    contact: ContactParams = ContactParams()
    # Frozen-mass fast path (tile-layout engine only): refactor the mass
    # matrix / Schur Cholesky every `mass_freeze` substeps instead of every
    # substep. 1 = exact (default, matches the oracle engine); `substeps`
    # = once per 20 ms control step — the MPPI sampling setting, where the
    # O(1e-3 rad) per-control-step configuration drift makes the stale-mass
    # error far smaller than the exploration noise.
    mass_freeze: int = 1


_LIMIT_K = 300.0  # joint-limit spring (N m / rad)
_LIMIT_D = 2.0
_TGT_CLIP = 3.0  # reference legged_robot.py:126
# Trunk collision proxy vs boxes: SIX r=0.07 spheres in a 3x2 grid covering
# the ~0.36x0.22x0.12 trunk box (x span +-0.19, y +-0.12, z +-0.07 — close
# to the true half-extents (0.18, 0.11, 0.06) used for Chase-Tag catch
# detection, envs/chase_tag.py TRUNK_HALF). Corner-first wall approaches are
# repelled, AND the proxy is as THIN as the real trunk: a crouched robot
# (base ~0.19 m) fits under the 0.25-0.3 m hole bars, which the earlier
# r=0.11 spheres (0.22 m implied thickness) physically blocked.
_TRUNK_RADIUS = 0.07
_TRUNK_OFFSETS = np.array(
    [[-0.12, -0.05, 0.0], [-0.12, 0.05, 0.0],
     [0.0, -0.05, 0.0], [0.0, 0.05, 0.0],
     [0.12, -0.05, 0.0], [0.12, 0.05, 0.0]], np.float32
)
# Hard-plant (physics/impulse.py) trunk coverage: a DENSER 5x3 grid of the
# same r=0.07 spheres. Bullet collides the full trunk collision box
# (reference legged_robot.py:207-264 loads max.urdf collision geometry); the
# 3x2 proxy leaves ~3 cm-deep valleys between spheres where a hole bar's
# lower edge catches during a crawl-under and trips the robot (round-4
# EVAL.md: the imported hole model falls at the FIRST bar on the hard
# plant). At 0.06/0.05 m spacing the worst-case (diagonal) valley is
# ~1.1 cm — below the erp-recoverable penetration — so the effective top
# surface is flat to a bar sliding across it. The compliant sampling path
# keeps the cheaper 3x2 proxy (15 spheres would cost every MPPI rollout).
_TRUNK_OFFSETS_HARD = np.array(
    [[x, y, 0.0]
     for x in (-0.12, -0.06, 0.0, 0.06, 0.12)
     for y in (-0.05, 0.0, 0.05)], np.float32
)


def pd_torques(model, params: PhysicsParams, joint_pos, joint_vel, target_q):
    tgt = jnp.clip(target_q, -_TGT_CLIP, _TGT_CLIP)
    tau = params.kp * (tgt - joint_pos) + params.kd * (0.0 - joint_vel)
    tau = jnp.clip(tau, -params.max_tau, params.max_tau)
    return tau


def passive_torques(model, joint_pos, joint_vel):
    dtype = joint_pos.dtype
    damping = jnp.asarray(model.joint_damping, dtype).reshape(-1)
    friction = jnp.asarray(model.joint_friction, dtype).reshape(-1)
    # Coulomb friction smoothed over 0.5 rad/s: effective viscosity near zero
    # is friction/0.5 = 1 N m s/rad, inside the explicit stability budget for
    # ~3e-3 kg m^2 distal joint inertia at dt=2 ms.
    tau = -damping * joint_vel - friction * jnp.tanh(joint_vel / 0.5)
    lower = jnp.asarray(model.joint_lower_flat, dtype)
    upper = jnp.asarray(model.joint_upper_flat, dtype)
    below = jnp.minimum(joint_pos - lower, 0.0)
    above = jnp.maximum(joint_pos - upper, 0.0)
    tau = tau - _LIMIT_K * (below + above)
    tau = tau - _LIMIT_D * joint_vel * ((below < 0.0) | (above > 0.0))
    return tau


def _terrain_plane(p):
    """Default flat ground: height 0, normal +z. p: (..., 3)."""
    h = jnp.zeros(p.shape[:-1], dtype=p.dtype)
    n = jnp.zeros_like(p).at[..., 2].set(1.0)
    return h, n


def substep(model, params: PhysicsParams, state: RobotState, target_q, terrain_fn=None,
            scene=None):
    """One 500 Hz physics substep (semi-implicit Euler).

    scene: optional scene.boxes.BoxScene — contact then runs against the flat
    plane PLUS per-box SDF forces (tops and vertical faces alike), replacing
    Bullet's hard box collision (reference bullet_static_entities.py:243-256).
    """
    if scene is not None and terrain_fn is None:
        terrain_fn = _terrain_plane
    terrain_fn = terrain_fn or _terrain_plane
    kin = dynamics.forward_kinematics(model, state)
    origin = state.base_pos

    tau_act = pd_torques(model, params, state.joint_pos, state.joint_vel, target_q)
    tau_j = (tau_act + passive_torques(model, state.joint_pos, state.joint_vel)).reshape(
        state.joint_pos.shape[:-1] + (4, 3)
    )
    tau_b = jnp.zeros(state.base_pos.shape[:-1] + (6,), dtype=state.base_pos.dtype)

    # Foot contacts (sphere r=0.025 fixed to shank tips, link index 2).
    h, n = terrain_fn(kin.p_foot)
    f_foot = sphere_ground_force(
        kin.p_foot, kin.v_foot, model.foot_radius, h, n, params.contact,
        mu=params.foot_friction,
    )
    if scene is not None:
        from lifelike_tpu.physics.contact import sphere_boxes_force

        f_foot = f_foot + sphere_boxes_force(
            kin.p_foot, kin.v_foot, model.foot_radius, scene.center, scene.half,
            scene.active, params.contact, params.foot_friction,
        )
    tb, tj = dynamics.point_force_to_generalized(kin, origin, kin.p_foot, f_foot, 2)
    tau_b = tau_b + tb
    tau_j = tau_j + tj

    # Wheel contacts (fixed to thighs, link index 1) keep crouch/fall plausible.
    v_wheel = kin.v_link_origin[..., :, 1, :] + jnp.cross(
        kin.w_link[..., :, 1, :], kin.p_wheel - kin.p_joint[..., :, 1, :]
    )
    hw, nw = terrain_fn(kin.p_wheel)
    f_wheel = sphere_ground_force(
        kin.p_wheel, v_wheel, model.wheel_radius, hw, nw, params.contact,
        mu=params.foot_friction,
    )
    if scene is not None:
        f_wheel = f_wheel + sphere_boxes_force(
            kin.p_wheel, v_wheel, model.wheel_radius, scene.center, scene.half,
            scene.active, params.contact, params.foot_friction,
        )
    tb, tj = dynamics.point_force_to_generalized(kin, origin, kin.p_wheel, f_wheel, 1)
    tau_b = tau_b + tb
    tau_j = tau_j + tj

    if scene is not None:
        # Trunk collision proxy: six spheres (3x2 grid) fixed to the base vs boxes only
        # (the trunk never reaches the plane before a fall terminates).
        # Forces map to a base wrench about the base origin.
        offs_w = jnp.einsum(
            "...ij,pj->...pi", kin.R_base,
            jnp.asarray(_TRUNK_OFFSETS, state.base_pos.dtype),
        )  # (..., 6sph, 3)
        p_tr = state.base_pos[..., None, :] + offs_w
        v_tr = state.base_lin_vel[..., None, :] + jnp.cross(
            state.base_ang_vel[..., None, :], offs_w
        )
        f_tr = sphere_boxes_force(
            p_tr, v_tr, _TRUNK_RADIUS, scene.center, scene.half, scene.active,
            params.contact, params.foot_friction,
        )  # (..., 6sph, 3)
        tau_b = tau_b.at[..., :3].add(
            jnp.sum(jnp.cross(offs_w, f_tr), axis=-2)
        )
        tau_b = tau_b.at[..., 3:].add(jnp.sum(f_tr, axis=-2))

    # External disturbance force on the base (PushRandomizer parity,
    # reference push_randomizer.py:56-99): world-frame force at base origin.
    ext = jnp.broadcast_to(
        jnp.asarray(params.ext_force, state.base_pos.dtype), state.base_pos.shape
    )
    tau_b = tau_b + jnp.concatenate([jnp.zeros_like(ext), ext], axis=-1)

    # Subtract bias (C v + g), solve structured system.
    bias_b, bias_j = dynamics.bias_forces(model, kin, state, origin)
    Mb, F, Ml = dynamics.mass_matrix_blocks(model, kin, origin, state.base_pos)
    a_base, qdd = dynamics.forward_dynamics(Mb, F, Ml, tau_b - bias_b, tau_j - bias_j)

    # Spatial -> point acceleration of the base origin.
    w = state.base_ang_vel
    a_lin = a_base[..., 3:] + jnp.cross(w, state.base_lin_vel)
    a_ang = a_base[..., :3]

    dt = params.dt
    new_lin = state.base_lin_vel + a_lin * dt
    new_ang = w + a_ang * dt
    new_qd = state.joint_vel + qdd.reshape(state.joint_vel.shape) * dt
    return RobotState(
        base_pos=state.base_pos + new_lin * dt,
        base_orn=quat.integrate(state.base_orn, new_ang, dt),
        base_lin_vel=new_lin,
        base_ang_vel=new_ang,
        joint_pos=state.joint_pos + new_qd * dt,
        joint_vel=new_qd,
    )


def control_step(model, params: PhysicsParams, state: RobotState, target_q, terrain_fn=None,
                 scene=None):
    """One 50 Hz control step = `substeps` physics substeps with a held target.

    Mirrors reference primitive_level_env.py:202-210 (target held constant
    across the 10 inner PD steps).
    """

    def body(s, _):
        return substep(model, params, s, target_q, terrain_fn, scene=scene), None

    state, _ = jax.lax.scan(body, state, None, length=params.substeps)
    return state


def make_control_step(model, params: PhysicsParams, terrain_fn=None, scene=None):
    """Returns a jittable f(state, target_q) -> state closure."""
    return partial(control_step, model, params, terrain_fn=terrain_fn, scene=scene)
