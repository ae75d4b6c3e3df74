"""Batched rigid-body dynamics for the MAX quadruped, TPU-first.

Replaces the Bullet C++ engine the reference steps through
`bullet.stepSimulation()` (reference legged_robot.py:260-264,
primitive_level_env.py:202-210). Instead of a general articulated-body solver,
this exploits the fixed topology — a floating base with four independent
3-DoF legs — so that everything vectorizes over (batch, legs):

  * forward kinematics / velocities: closed-form chains, leg axis 4 in one shot
  * mass matrix: world-frame CRBA about the base origin; because the legs are
    independent given the base, the joint-joint block is block-diagonal with
    four 3x3 blocks, and forward dynamics reduces to four 3x3 solves plus one
    6x6 Schur-complement solve — no 18x18 factorization
  * bias forces: world-frame RNEA with the gravity-as-base-acceleration trick

All spatial vectors use [angular; linear] layout at a common origin (the base
position), in world axes. State follows the reference's universal schema
(reference legged_robot.py:98-105): base_pos, base_orn (xyzw), base_lin_vel,
base_ang_vel (world frame), joint_pos, joint_vel — arranged (..., 12) in
leg-major order FR,FL,HR,HL x (hip_x, hip_y, knee).
"""
from typing import NamedTuple

import jax.numpy as jnp

from lifelike_tpu.math import quat
from lifelike_tpu.math.spatial import (
    apply_inertia,
    cross_force,
    cross_motion,
    skew,
    spatial_inertia,
    transform_inertia,
)

GRAVITY = 9.80665  # matches reference legged_robot.py:260


class RobotState(NamedTuple):
    """Pytree state; every leaf has identical leading batch shape."""

    base_pos: jnp.ndarray  # (..., 3)
    base_orn: jnp.ndarray  # (..., 4) xyzw
    base_lin_vel: jnp.ndarray  # (..., 3) world
    base_ang_vel: jnp.ndarray  # (..., 3) world
    joint_pos: jnp.ndarray  # (..., 12)
    joint_vel: jnp.ndarray  # (..., 12)


class Kinematics(NamedTuple):
    """Forward-kinematics products reused by dynamics, contact and costs."""

    R_base: jnp.ndarray  # (..., 3, 3)
    R_link: jnp.ndarray  # (..., 4, 3, 3) world rotation per leg link
    p_joint: jnp.ndarray  # (..., 4, 3, 3) world joint positions [leg, link]
    axis_w: jnp.ndarray  # (..., 4, 3, 3) world joint axes
    p_foot: jnp.ndarray  # (..., 4, 3) world foot-sphere centers
    v_foot: jnp.ndarray  # (..., 4, 3) world foot-sphere velocities
    p_wheel: jnp.ndarray  # (..., 4, 3) world wheel centers
    w_link: jnp.ndarray  # (..., 4, 3, 3) world angular velocity per link
    v_link_origin: jnp.ndarray  # (..., 4, 3, 3) world velocity of link origins


def _axis_rotation(axis, angle):
    """Rotation matrix exp(skew(axis) * angle); axis is unit, static."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    K = skew(axis)
    KK = K @ K
    eye = jnp.eye(3, dtype=angle.dtype)
    return eye + s * K + (1.0 - c) * KK


def forward_kinematics(model, state: RobotState) -> Kinematics:
    dtype = state.base_pos.dtype
    q = state.joint_pos.reshape(state.joint_pos.shape[:-1] + (4, 3))
    qd = state.joint_vel.reshape(q.shape)
    R_base = quat.to_matrix(state.base_orn)

    offs = jnp.asarray(model.joint_offset, dtype)  # (4, 3, 3)
    axes = jnp.asarray(model.joint_axis, dtype)

    R_link, p_joint, axis_w = [], [], []
    w_link, v_origin = [], []
    R_parent = R_base[..., None, :, :]  # (..., 1->4, 3, 3)
    p_parent = state.base_pos[..., None, :]
    w_parent = state.base_ang_vel[..., None, :]
    v_parent = state.base_lin_vel[..., None, :]  # velocity of parent frame origin
    # origin of parent frame: base_pos initially
    for j in range(3):
        # joint origin in world
        p_j = p_parent + jnp.einsum("...lij,lj->...li", R_parent, offs[:, j])
        # velocity of the joint origin (fixed in parent)
        v_j = v_parent + jnp.cross(w_parent, p_j - p_parent)
        a_w = jnp.einsum("...lij,lj->...li", R_parent, axes[:, j])
        R_j = R_parent @ _axis_rotation(axes[:, j], q[..., j])
        w_j = w_parent + a_w * qd[..., j : j + 1]
        R_link.append(R_j)
        p_joint.append(p_j)
        axis_w.append(a_w)
        w_link.append(w_j)
        v_origin.append(v_j)
        R_parent, p_parent, w_parent, v_parent = R_j, p_j, w_j, v_j

    R_link = jnp.stack(R_link, axis=-3)  # (..., 4, 3links, 3, 3) -> axis order?
    # stack produced (..., link, leg, 3, 3)? each element is (..., 4legs, 3, 3)
    # stacking on axis=-3 gives (..., 4legs, 3links, 3, 3). Verify: element
    # shape (..., L, 3, 3); axis=-3 inserts before the (3,3) -> (..., L, J, 3, 3).
    p_joint = jnp.stack(p_joint, axis=-2)  # (..., 4, 3, 3)
    axis_w = jnp.stack(axis_w, axis=-2)
    w_link = jnp.stack(w_link, axis=-2)
    v_origin = jnp.stack(v_origin, axis=-2)

    foot_off = jnp.asarray(model.foot_offset, dtype)  # (4, 3)
    R3 = R_link[..., :, 2, :, :]
    p_foot = p_joint[..., :, 2, :] + jnp.einsum("...lij,lj->...li", R3, foot_off)
    v_foot = v_origin[..., :, 2, :] + jnp.cross(
        w_link[..., :, 2, :], p_foot - p_joint[..., :, 2, :]
    )
    wheel_off = jnp.asarray(model.wheel_offset, dtype)
    R2 = R_link[..., :, 1, :, :]
    p_wheel = p_joint[..., :, 1, :] + jnp.einsum("...lij,lj->...li", R2, wheel_off)

    return Kinematics(
        R_base=R_base,
        R_link=R_link,
        p_joint=p_joint,
        axis_w=axis_w,
        p_foot=p_foot,
        v_foot=v_foot,
        p_wheel=p_wheel,
        w_link=w_link,
        v_link_origin=v_origin,
    )


def _link_spatial_inertias(model, kin: Kinematics, origin):
    """Spatial inertia of each leg link about `origin`, world axes.

    Returns (..., 4, 3, 6, 6). Link inertia data is in the link frame about the
    link COM; rotate to world and shift to the common origin.
    """
    dtype = origin.dtype
    mass = jnp.asarray(model.link_mass, dtype)  # (4, 3)
    com = jnp.asarray(model.link_com, dtype)  # (4, 3, 3)
    Icom = jnp.asarray(model.link_inertia, dtype)  # (4, 3, 3, 3)
    R = kin.R_link  # (..., 4, 3, 3, 3)
    com_w = kin.p_joint + jnp.einsum("...lkij,lkj->...lki", R, com)
    I_world = R @ Icom @ jnp.swapaxes(R, -1, -2)
    # spatial inertia about origin: use com offset relative to origin
    d = com_w - origin[..., None, None, :]
    return spatial_inertia(mass[..., :, :, None, None], d, I_world)


def _base_spatial_inertia(model, kin: Kinematics, origin, base_pos):
    dtype = origin.dtype
    com_w = base_pos + jnp.einsum(
        "...ij,j->...i", kin.R_base, jnp.asarray(model.base_com, dtype)
    )
    I_world = (
        kin.R_base
        @ jnp.asarray(model.base_inertia, dtype)
        @ jnp.swapaxes(kin.R_base, -1, -2)
    )
    d = com_w - origin
    return spatial_inertia(model.base_mass, d, I_world)


def _motion_subspaces(kin: Kinematics, origin):
    """Revolute motion subspaces about the common origin: S = [a; a x (O - p)].

    Returns (..., 4, 3, 6).
    """
    a = kin.axis_w
    r = origin[..., None, None, :] - kin.p_joint
    return jnp.concatenate([a, jnp.cross(a, r)], axis=-1)


def mass_matrix_blocks(model, kin: Kinematics, origin, base_pos):
    """World-frame CRBA exploiting leg independence.

    Returns (Mb, F, Ml):
      Mb: (..., 6, 6) composite inertia of whole robot about origin
      F:  (..., 4, 3, 6) base-joint coupling rows (per leg, per joint)
      Ml: (..., 4, 3, 3) per-leg joint-space mass blocks
    """
    I_links = _link_spatial_inertias(model, kin, origin)  # (...,4,3,6,6)
    S = _motion_subspaces(kin, origin)  # (...,4,3,6)

    # Composite inertia per joint: sum over this link and its descendants.
    # Along a 3-link chain: Ic[j] = sum_{k>=j} I[k]. reverse cumsum on link axis.
    Ic = jnp.flip(jnp.cumsum(jnp.flip(I_links, axis=-3), axis=-3), axis=-3)

    # F[l, j] = Ic[l, j] @ S[l, j]  (6-vector): coupling with the base.
    F = jnp.einsum("...ljab,...ljb->...lja", Ic, S)

    # Ml[l, i, j] = S[l, min] . Ic[l, max] S[l, max] ; with chain structure,
    # Ml[i, j] = S_i . (Ic_max(i,j) S_j). Compute full 3x3 per leg.
    # H[l, i, j] = S_i^T Ic_j S_j for i <= j uses Ic_j; symmetric.
    SI = jnp.einsum("...lia,...ljab->...lijb", S, Ic)  # S_i^T Ic_j -> (l,i,j,6)
    H = jnp.einsum("...lijb,...ljb->...lij", SI, S)
    iu = jnp.triu(jnp.ones((3, 3), dtype=bool))
    Ml = jnp.where(iu, H, jnp.swapaxes(H, -1, -2))

    Mb = _base_spatial_inertia(model, kin, origin, base_pos) + jnp.sum(
        I_links, axis=(-4, -3)
    )
    return Mb, F, Ml


def bias_forces(model, kin: Kinematics, state: RobotState, origin):
    """World-frame RNEA with qdd = 0: returns (tau_base (...,6), tau_joint (...,4,3)).

    Gravity enters as a fictitious upward base acceleration (Featherstone
    trick), giving the generalized force C(q,v)v + g.
    """
    dtype = state.base_pos.dtype
    qd = state.joint_vel.reshape(state.joint_vel.shape[:-1] + (4, 3))
    S = _motion_subspaces(kin, origin)  # (...,4,3,6)

    # Spatial velocity of base at origin (= base point velocity since origin
    # is the base position).
    v_base = jnp.concatenate([state.base_ang_vel, state.base_lin_vel], axis=-1)
    a_grav = jnp.zeros_like(v_base).at[..., 5].set(GRAVITY)

    # Forward pass along each leg (3 steps, unrolled; vectorized over legs).
    v_parent = v_base[..., None, :]  # (...,1->4,6)
    a_parent = a_grav[..., None, :]
    v_links, a_links = [], []
    for j in range(3):
        Sj = S[..., :, j, :]
        vj = v_parent + Sj * qd[..., j : j + 1]
        aj = a_parent + cross_motion(v_parent, Sj) * qd[..., j : j + 1]
        v_links.append(vj)
        a_links.append(aj)
        v_parent, a_parent = vj, aj
    v_links = jnp.stack(v_links, axis=-2)  # (...,4,3,6)
    a_links = jnp.stack(a_links, axis=-2)

    I_links = _link_spatial_inertias(model, kin, origin)  # (...,4,3,6,6)
    f_links = apply_inertia(I_links, a_links) + cross_force(
        v_links, apply_inertia(I_links, v_links)
    )

    # Backward pass: tau_j = S_j . sum_{k>=j} f_k (cumsum along the link axis)
    f_acc = jnp.flip(jnp.cumsum(jnp.flip(f_links, axis=-2), axis=-2), axis=-2)
    tau_joint = jnp.einsum("...ljb,...ljb->...lj", S, f_acc)

    base_pos = state.base_pos
    I_base = _base_spatial_inertia(model, kin, origin, base_pos)
    f_base = apply_inertia(I_base, a_grav) + cross_force(
        v_base, apply_inertia(I_base, v_base)
    )
    tau_base = f_base + jnp.sum(f_links, axis=(-3, -2))
    return tau_base.astype(dtype), tau_joint.astype(dtype)


def point_force_to_generalized(kin: Kinematics, origin, points, forces, link_index):
    """Map world-frame point forces on leg links to generalized forces.

    points/forces: (..., 4, 3) one contact point per leg, acting on link
    `link_index` (0..2) of that leg. Returns (tau_base (...,6),
    tau_joint (...,4,3)).
    """
    n = jnp.cross(points - origin[..., None, :], forces)
    Fsp = jnp.concatenate([n, forces], axis=-1)  # (...,4,6) spatial force at origin
    tau_base = jnp.sum(Fsp, axis=-2)
    S = _motion_subspaces(kin, origin)  # (...,4,3,6)
    # joint j of leg l receives S[l,j] . Fsp[l] if j <= link_index
    tau_joint = jnp.einsum("...ljb,...lb->...lj", S, Fsp)
    mask = (jnp.arange(3) <= link_index).astype(tau_joint.dtype)
    return tau_base, tau_joint * mask


def _inv3_sym(A, reg=1e-9):
    """Closed-form inverse of symmetric 3x3 blocks (..., 3, 3) — LU-free
    (jnp.linalg.inv lowers to LU, which is dispatch-bound for tiny blocks
    on TPU; this is pure elementwise arithmetic)."""
    a = A[..., 0, 0] + reg
    b = A[..., 0, 1]
    c = A[..., 0, 2]
    d = A[..., 1, 1] + reg
    e = A[..., 1, 2]
    f = A[..., 2, 2] + reg
    A11 = d * f - e * e
    A12 = c * e - b * f
    A13 = b * e - c * d
    A22 = a * f - c * c
    A23 = b * c - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / det
    r0 = jnp.stack([A11, A12, A13], axis=-1)
    r1 = jnp.stack([A12, A22, A23], axis=-1)
    r2 = jnp.stack([A13, A23, A33], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2) * inv_det[..., None, None]


def _chol6(A, reg=1e-9):
    """Unrolled Cholesky of SPD (..., 6, 6) blocks -> packed lower factor
    list [(...)], row-major lower-triangle order (same scheme as the tile
    layout's batched.chol6)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j] + reg
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = Ljj
        inv_Ljj = 1.0 / Ljj
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_Ljj
    return L


def _chol6_solve(L, b):
    """Solve L L^T x = b for b (..., 6, n) given the factor from _chol6.
    Returns (..., 6, n)."""
    n = 6
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[i][k][..., None] * y[k]
        y[i] = s / L[i][i][..., None]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][..., None] * x[k]
        x[i] = s / L[i][i][..., None]
    return jnp.stack(x, axis=-2)


class DynFactorsBL(NamedTuple):
    """Factored structured mass matrix, batch-leading layout (the
    counterpart of batched.DynFactors): solve many right-hand sides without
    refactoring — forward dynamics AND the impulse mode's 60 constraint
    rows share one factorization per substep."""

    F: jnp.ndarray  # (..., 4, 3, 6)
    Ml_inv: jnp.ndarray  # (..., 4, 3, 3)
    FtMinv: jnp.ndarray  # (..., 4, 3, 6)
    chol: tuple  # packed 6x6 Schur Cholesky (nested list of (...))


def factor_dynamics(Mb, F, Ml, reg=1e-9) -> DynFactorsBL:
    Ml_inv = _inv3_sym(Ml, reg)  # (...,4,3,3)
    FtMinv = jnp.einsum("...lij,...lja->...lia", Ml_inv, F)  # (...,4,3,6)
    Schur = Mb - jnp.einsum("...lja,...ljb->...ab", F, FtMinv)
    return DynFactorsBL(F=F, Ml_inv=Ml_inv, FtMinv=FtMinv,
                        chol=_chol6(Schur, reg))


def forward_dynamics_apply(fac: DynFactorsBL, tau_base, tau_joint):
    """Solve the factored system for one rhs. tau_base (..., 6),
    tau_joint (..., 4, 3) -> (a_base (..., 6), qdd (..., 4, 3))."""
    rhs = tau_base - jnp.einsum("...lja,...lj->...a", fac.FtMinv, tau_joint)
    a_base = _chol6_solve(fac.chol, rhs[..., None])[..., 0]
    qdd = jnp.einsum(
        "...lij,...lj->...li", fac.Ml_inv,
        tau_joint - jnp.einsum("...lja,...a->...lj", fac.F, a_base),
    )
    return a_base, qdd


def minv_apply_rows(fac: DynFactorsBL, rows):
    """Apply M^{-1} to n stacked generalized-force rows (..., n, 18) using
    the shared factorization. Returns (..., n, 18)."""
    rhs_b = rows[..., :, :6]
    rhs_j = rows[..., :, 6:].reshape(rows.shape[:-1] + (4, 3))
    rhs = rhs_b - jnp.einsum("...lja,...nlj->...na", fac.FtMinv, rhs_j)
    a_b = _chol6_solve(fac.chol, jnp.swapaxes(rhs, -1, -2))  # (..., 6, n)
    a_b = jnp.swapaxes(a_b, -1, -2)
    qdd = jnp.einsum(
        "...lij,...nlj->...nli", fac.Ml_inv,
        rhs_j - jnp.einsum("...lja,...na->...nlj", fac.F, a_b),
    )
    return jnp.concatenate([a_b, qdd.reshape(qdd.shape[:-2] + (12,))], axis=-1)


def forward_dynamics(Mb, F, Ml, tau_base, tau_joint, reg=1e-9):
    """Solve the structured system for accelerations.

      [Mb   F^T] [a_b]   [tau_base ]
      [F    Ml ] [qdd] = [tau_joint]      (legs block-diagonal in Ml)

    via Schur complement on the 6x6 base block — closed-form 3x3 inverses
    and an unrolled 6x6 Cholesky (no LU dispatch). Returns
    (a_base (...,6) spatial, qdd (...,4,3)).
    """
    return forward_dynamics_apply(
        factor_dynamics(Mb, F, Ml, reg), tau_base, tau_joint
    )
