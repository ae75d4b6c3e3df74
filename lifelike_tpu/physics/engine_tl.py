"""Tile-layout physics stepping: the TPU hot path.

Mirrors lifelike_tpu.physics.engine (the readable oracle) with all fields in
batch-trailing layout (see physics.batched). The PD law, passive torques,
contact model and semi-implicit Euler integration are mathematically
identical — tests/test_batched_layout.py asserts step-for-step equivalence
against the oracle implementation.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.math import quat_tl
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics.batched import TLConstants, TLKin, TLState
from lifelike_tpu.physics.contact import ContactParams
from lifelike_tpu.physics.engine import _LIMIT_D, _LIMIT_K, _TGT_CLIP, PhysicsParams


def _plane_terrain(p):
    """p: (4, 3, Bs, L) -> heights (4, Bs, L), normals (4, 3, Bs, L)."""
    h = jnp.zeros_like(p[:, 0])
    n = jnp.zeros_like(p).at[:, 2].set(1.0)
    return h, n


def sphere_ground_force(pos, vel, radius, h, n, cp: ContactParams, mu):
    """Tile-layout version of contact.sphere_ground_force.

    pos/vel/n: (4, 3, Bs, L); h: (4, Bs, L); mu broadcastable to (4, Bs, L).
    """
    gap = (pos[:, 2] - h) - radius
    pen = jnp.maximum(-gap, 0.0)
    in_contact = pen > 0.0
    vn = jnp.sum(vel * n, axis=1)
    fn = cp.kn * pen + cp.dn * jnp.maximum(-vn, 0.0) * in_contact
    fn = jnp.maximum(fn, 0.0) * in_contact
    vt = vel - vn[:, None] * n
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=1) + 1e-12)
    coef = jnp.minimum(
        mu * fn / jnp.sqrt(vt_norm**2 + cp.v_slip**2), cp.fric_visc_cap
    )
    return fn[:, None] * n - coef[:, None] * vt


class TLScene(NamedTuple):
    """Box scene in tile layout: one scenario broadcast over the population.

    center/half: (N, 3, 1, 1); active: (N, 1, 1) — trailing singleton axes
    broadcast against the (Bs, L) tile batch.
    """

    center: jnp.ndarray
    half: jnp.ndarray
    active: jnp.ndarray


def tl_scene(scene) -> TLScene:
    """Lift an unbatched scene.boxes.BoxScene into tile layout."""
    return TLScene(
        center=scene.center[..., None, None],
        half=scene.half[..., None, None],
        active=scene.active.astype(scene.center.dtype)[..., None, None],
    )


def sphere_boxes_force(pos, vel, radius, ts: TLScene, cp: ContactParams, mu):
    """Tile-layout contact.sphere_boxes_force: per-box SDF penalty forces.

    pos/vel: (P, 3, Bs, L) sphere centers; returns (P, 3, Bs, L) forces summed
    over the N boxes. mu: scalar or (Bs, L)-broadcastable.
    """
    r = pos[:, None] - ts.center[None]  # (P, N, 3, Bs, L)
    q = jnp.abs(r) - ts.half[None]
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.sqrt(jnp.sum(outside * outside, axis=2) + 1e-9)  # (P, N, Bs, L)
    d_in = jnp.max(q, axis=2)
    inside = d_in < 0.0
    dist = jnp.where(inside, d_in, d_out)
    sign = jnp.where(r >= 0.0, 1.0, -1.0)
    face = (q >= jnp.max(q, axis=2, keepdims=True)).astype(pos.dtype)
    face = face / jnp.sum(face, axis=2, keepdims=True).clip(1.0)
    normal = jnp.where(
        inside[:, :, None], sign * face, sign * outside / d_out[:, :, None]
    )

    pen = jnp.maximum(radius - dist, 0.0)
    in_contact = pen > 0.0
    v = vel[:, None]
    vn = jnp.sum(v * normal, axis=2)
    fn = cp.kn * pen + cp.dn * jnp.maximum(-vn, 0.0) * in_contact
    fn = jnp.maximum(fn, 0.0) * in_contact
    vt = v - vn[:, :, None] * normal
    vt_norm2 = jnp.sum(vt * vt, axis=2)
    coef = jnp.minimum(
        mu * fn / jnp.sqrt(vt_norm2 + 1e-12 + cp.v_slip**2), cp.fric_visc_cap
    )
    f = fn[:, :, None] * normal - coef[:, :, None] * vt
    return jnp.sum(f * ts.active[None, :, None], axis=1)


from lifelike_tpu.physics.engine import _TRUNK_OFFSETS, _TRUNK_RADIUS  # noqa: E402  shared trunk proxy


def pd_torques(c: TLConstants, params: PhysicsParams, joint_pos, joint_vel, target_q):
    """target_q: (4, 3, Bs, L) or broadcastable. Reference legged_robot.py:119-148."""
    tgt = jnp.clip(target_q, -_TGT_CLIP, _TGT_CLIP)
    tau = params.kp * (tgt - joint_pos) + params.kd * (0.0 - joint_vel)
    return jnp.clip(tau, -params.max_tau, params.max_tau)


def passive_torques(c: TLConstants, joint_pos, joint_vel):
    tau = -c.damping * joint_vel - c.friction * jnp.tanh(joint_vel / 0.5)
    below = jnp.minimum(joint_pos - c.lower, 0.0)
    above = jnp.maximum(joint_pos - c.upper, 0.0)
    tau = tau - _LIMIT_K * (below + above)
    tau = tau - _LIMIT_D * joint_vel * ((below < 0.0) | (above > 0.0))
    return tau


class Frozen(NamedTuple):
    """Mass-side quantities factored once per `mass_freeze` substeps.

    All of them are referenced about the world point `origin` (= base
    position at freeze time); substeps then keep every dynamics quantity
    referenced there and point-transfer velocities/accelerations."""

    origin: jnp.ndarray  # (3, Bs, L)
    terms: B.LegTerms
    fac: B.DynFactors


def freeze_mass(c: TLConstants, s: TLState) -> Frozen:
    kin = B.fk(c, s)
    origin = s.base_pos
    terms = B.leg_terms(c, kin, origin)
    Mb, F, Ml = B.mass_blocks(c, kin, origin, s.base_pos, terms=terms)
    return Frozen(origin=origin, terms=terms, fac=B.factor_dynamics(Mb, F, Ml))


def substep(c: TLConstants, params: PhysicsParams, s: TLState, target_q,
            terrain_fn=None, frozen: Frozen = None, scene: TLScene = None):
    """One 500 Hz step. `frozen`: optional freeze_mass output — the
    mass-matrix/Schur factorization and leg terms are then NOT rebuilt from
    the current configuration (PhysicsParams.mass_freeze fast path)."""
    terrain_fn = terrain_fn or _plane_terrain
    kin = B.fk(c, s)
    if frozen is None:
        origin = s.base_pos
        terms = B.leg_terms(c, kin, origin)  # shared by mass/bias/contact map
    else:
        # Frozen inertia distribution AND motion subspaces: stale geometry
        # is O(q_dot * dt * freeze) ~ 1e-2 rad; fine inside the robot's
        # envelope (tests/test_batched_layout.py::test_mass_freeze_fidelity)
        # but NOT for pathological states with deep contact penetration,
        # where the stiff contact forces amplify it — use mass_freeze=1 there.
        origin = frozen.origin
        terms = frozen.terms

    tau_j = pd_torques(c, params, s.joint_pos, s.joint_vel, target_q)
    tau_j = tau_j + passive_torques(c, s.joint_pos, s.joint_vel)
    tau_b = jnp.zeros_like(jnp.concatenate([s.base_ang_vel, s.base_lin_vel], axis=0))

    mu = params.foot_friction
    h, n = terrain_fn(kin.p_foot)
    f_foot = sphere_ground_force(
        kin.p_foot, kin.v_foot, c.foot_radius, h, n, params.contact, mu
    )
    if scene is not None:
        f_foot = f_foot + sphere_boxes_force(
            kin.p_foot, kin.v_foot, c.foot_radius, scene, params.contact, mu
        )
    tb, tj = B.point_forces_to_generalized(
        kin, origin, kin.p_foot, f_foot, 2, S=terms.S
    )
    tau_b = tau_b + tb
    tau_j = tau_j + tj

    hw, nw = terrain_fn(kin.p_wheel)
    f_wheel = sphere_ground_force(
        kin.p_wheel, kin.v_wheel, c.wheel_radius, hw, nw, params.contact, mu
    )
    if scene is not None:
        f_wheel = f_wheel + sphere_boxes_force(
            kin.p_wheel, kin.v_wheel, c.wheel_radius, scene, params.contact, mu
        )
    tb, tj = B.point_forces_to_generalized(
        kin, origin, kin.p_wheel, f_wheel, 1, S=terms.S
    )
    tau_b = tau_b + tb
    tau_j = tau_j + tj

    if scene is not None:
        # Trunk proxy: six spheres (3x2 grid over the body x/y plane) vs boxes (matches
        # engine._TRUNK_OFFSETS / the chase_tag catch trunk box) -> base
        # wrench about the base origin.
        dtype = s.base_pos.dtype
        offs = jnp.asarray(_TRUNK_OFFSETS, dtype)  # (P, 3)
        offs_w = [
            jnp.einsum("ij...,j->i...", kin.R_base, offs[p])
            for p in range(offs.shape[0])
        ]  # each (3, Bs, L)
        pos = jnp.stack([s.base_pos + o for o in offs_w])
        vel = jnp.stack([
            s.base_lin_vel + quat_tl.cross(s.base_ang_vel, o) for o in offs_w
        ])
        f_tr = sphere_boxes_force(
            pos, vel, _TRUNK_RADIUS, scene, params.contact, mu
        )  # (P, 3, Bs, L)
        tau_b = tau_b.at[3:].add(jnp.sum(f_tr, axis=0))
        tau_b = tau_b.at[:3].add(sum(
            quat_tl.cross(o, f_tr[p]) for p, o in enumerate(offs_w)
        ))

    ext = jnp.broadcast_to(
        jnp.reshape(jnp.asarray(params.ext_force, s.base_pos.dtype), (3, 1, 1)),
        s.base_pos.shape,
    )
    tau_b = tau_b.at[3:].add(ext)

    w = s.base_ang_vel
    if frozen is None:
        bias_b, bias_j = B.bias_forces(c, kin, s, origin, terms=terms)
        Mb, F, Ml = B.mass_blocks(c, kin, origin, s.base_pos, terms=terms)
        a_base, qdd = B.forward_dynamics(
            Mb, F, Ml, tau_b - bias_b, tau_j - bias_j
        )
        a_lin = a_base[3:] + quat_tl.cross(w, s.base_lin_vel)
    else:
        # Everything stays referenced at the frozen origin O: the base
        # spatial velocity there is [w; v + w x (O - p)], and the solved
        # linear acceleration transfers back with the alpha x (p - O) term
        # (both vanish when O == p, recovering the exact-path formulas).
        r = s.base_pos - origin
        v_at_o = jnp.concatenate(
            [w, s.base_lin_vel - quat_tl.cross(w, r)], axis=0
        )
        bias_b, bias_j = B.bias_forces(
            c, kin, s, origin, terms=terms, v_base=v_at_o
        )
        a_base, qdd = B.forward_dynamics_apply(
            frozen.fac, tau_b - bias_b, tau_j - bias_j
        )
        a_lin = (
            a_base[3:]
            + quat_tl.cross(a_base[:3], r)
            + quat_tl.cross(w, s.base_lin_vel)
        )
    a_ang = a_base[:3]

    dt = params.dt
    new_lin = s.base_lin_vel + a_lin * dt
    new_ang = w + a_ang * dt
    new_qd = s.joint_vel + qdd * dt
    return TLState(
        base_pos=s.base_pos + new_lin * dt,
        base_orn=quat_tl.integrate(s.base_orn, new_ang, dt),
        base_lin_vel=new_lin,
        base_ang_vel=new_ang,
        joint_pos=s.joint_pos + new_qd * dt,
        joint_vel=new_qd,
    )


def control_step(c: TLConstants, params: PhysicsParams, s: TLState, target_q,
                 terrain_fn=None, unroll=None, scene: TLScene = None):
    """One 50 Hz control step: `substeps` physics substeps with a held target.

    The substep scan is unrolled by default: each substep alone is ~2% of VPU
    peak because of per-kernel launch overhead; unrolling lets XLA fuse
    across substeps."""

    freeze = max(int(params.mass_freeze), 1)
    if freeze > 1:
        # Unrolled in Python: refactor the mass matrix every `freeze`
        # substeps, hold it (and the leg terms / Schur Cholesky) in between.
        frozen = None
        for i in range(params.substeps):
            if i % freeze == 0:
                frozen = freeze_mass(c, s)
            s = substep(c, params, s, target_q, terrain_fn, frozen=frozen,
                        scene=scene)
        return s

    def body(carry, _):
        return substep(c, params, carry, target_q, terrain_fn, scene=scene), None

    s, _ = jax.lax.scan(
        body, s, None, length=params.substeps,
        unroll=params.substeps if unroll is None else unroll,
    )
    return s
