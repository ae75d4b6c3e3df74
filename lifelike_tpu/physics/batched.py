"""TPU-tile-layout physics core: batch-trailing rigid-body dynamics.

Same math as lifelike_tpu.physics.dynamics/engine (which remain the readable
reference implementation and test oracle), re-laid-out for the TPU memory
system: every field keeps its small structure axes (legs 4, links 3, spatial
3/6) LEADING and the scenario batch TRAILING as two axes (Bs, L). With
L = 128 the batch fills whole (8, 128) VPU tiles, so the hundreds of small
elementwise ops in FK/CRBA/RNEA run at full lane utilization instead of
padding 3-wide trailing axes to 128 lanes (~43x waste measured on v5e).

Linear solves are closed-form and elementwise over the batch: a cofactor
inverse for the per-leg 3x3 joint blocks and an unrolled Cholesky for the
6x6 base Schur complement — no batched LAPACK, no layout changes.

State schema (TLState) mirrors the reference universal state dict
(reference legged_robot.py:98-105), transposed:
  base_pos (3, Bs, L), base_orn (4, Bs, L) xyzw, base_lin_vel, base_ang_vel
  (3, Bs, L) world frame, joint_pos/joint_vel (4, 3, Bs, L) leg-major.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.math import quat_tl
from lifelike_tpu.physics.contact import ContactParams
from lifelike_tpu.physics.dynamics import GRAVITY, RobotState

# ---------------------------------------------------------------- state


class TLState(NamedTuple):
    base_pos: jnp.ndarray  # (3, Bs, L)
    base_orn: jnp.ndarray  # (4, Bs, L)
    base_lin_vel: jnp.ndarray  # (3, Bs, L)
    base_ang_vel: jnp.ndarray  # (3, Bs, L)
    joint_pos: jnp.ndarray  # (4, 3, Bs, L)
    joint_vel: jnp.ndarray  # (4, 3, Bs, L)


def tl_from_state(s: RobotState, batch2d=None) -> TLState:
    """Transpose a batch-leading RobotState (..., k) into tile layout.

    batch2d: optional (Bs, L) to reshape the flattened batch into; defaults
    to (B, 1) — callers should pick L=128-divisible batches for speed.
    """

    def t(x, k):
        b = x.shape[:-1] if k == (12,) else x.shape[: x.ndim - len(k)]
        nb = int(np.prod(b)) if b else 1
        shp = batch2d if batch2d is not None else (nb, 1)
        y = jnp.moveaxis(x.reshape((nb,) + x.shape[len(b):]), 0, -1)
        return y.reshape(y.shape[:-1] + shp)

    jp = s.joint_pos.reshape(s.joint_pos.shape[:-1] + (4, 3))
    jv = s.joint_vel.reshape(jp.shape)
    return TLState(
        base_pos=t(s.base_pos, (3,)),
        base_orn=t(s.base_orn, (4,)),
        base_lin_vel=t(s.base_lin_vel, (3,)),
        base_ang_vel=t(s.base_ang_vel, (3,)),
        joint_pos=t(jp, (4, 3)),
        joint_vel=t(jv, (4, 3)),
    )


def state_from_tl(tl: TLState, batch_shape=None) -> RobotState:
    def t(x, k):
        y = x.reshape(x.shape[: -2] + (-1,))
        y = jnp.moveaxis(y, -1, 0)  # (B, structure...)
        if batch_shape is not None:
            y = y.reshape(batch_shape + y.shape[1:])
        return y

    jp = t(tl.joint_pos, (4, 3))
    return RobotState(
        base_pos=t(tl.base_pos, (3,)),
        base_orn=t(tl.base_orn, (4,)),
        base_lin_vel=t(tl.base_lin_vel, (3,)),
        base_ang_vel=t(tl.base_ang_vel, (3,)),
        joint_pos=jp.reshape(jp.shape[:-2] + (12,)),
        joint_vel=t(tl.joint_vel, (4, 3)).reshape(jp.shape[:-2] + (12,)),
    )


# ---------------------------------------------------------------- constants


class TLConstants(NamedTuple):
    """Model constants with two trailing singleton batch axes."""

    joint_offset: jnp.ndarray  # (4, 3, 3, 1, 1) [leg, link, comp]
    axis_K: jnp.ndarray  # (4, 3, 3, 3, 1, 1) skew(axis)
    axis_KK: jnp.ndarray  # (4, 3, 3, 3, 1, 1)
    axis: jnp.ndarray  # (4, 3, 3, 1, 1)
    link_mass: jnp.ndarray  # (4, 3, 1, 1)
    link_com: jnp.ndarray  # (4, 3, 3, 1, 1)
    link_inertia: jnp.ndarray  # (4, 3, 3, 3, 1, 1)
    base_mass: float
    base_com: jnp.ndarray  # (3, 1, 1)
    base_inertia: jnp.ndarray  # (3, 3, 1, 1)
    foot_offset: jnp.ndarray  # (4, 3, 1, 1)
    foot_radius: float
    wheel_offset: jnp.ndarray  # (4, 3, 1, 1)
    wheel_radius: float
    damping: jnp.ndarray  # (4, 3, 1, 1)
    friction: jnp.ndarray  # (4, 3, 1, 1)
    lower: jnp.ndarray  # (4, 3, 1, 1)
    upper: jnp.ndarray  # (4, 3, 1, 1)
    link_mass_rc: jnp.ndarray  # (4, 3, 1, 1) reverse-cumulated chain masses
    total_mass: float


def _skew_np(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


_CONST_CACHE = {}


def tl_constants(model, dtype=jnp.float32) -> TLConstants:
    """Constants as HOST numpy arrays, deliberately.

    These are closed over by jitted hot-path functions; numpy closures embed
    as executable literals. Closing over *device* arrays instead puts every
    subsequent dispatch in this process on a slow captured-buffer path
    (~24 ms/call measured on the axon relay) — do not convert these to jnp.
    """
    key = (id(model), dtype)
    if key in _CONST_CACHE:
        return _CONST_CACHE[key]
    e2 = lambda a: np.asarray(a, np.dtype(dtype))[..., None, None]
    K = np.stack(
        [[_skew_np(model.joint_axis[l, j]) for j in range(3)] for l in range(4)]
    )
    c = TLConstants(
        joint_offset=e2(model.joint_offset),
        axis_K=e2(K),
        axis_KK=e2(K @ K),
        axis=e2(model.joint_axis),
        link_mass=e2(model.link_mass),
        link_com=e2(model.link_com),
        link_inertia=e2(model.link_inertia),
        base_mass=float(model.base_mass),
        base_com=e2(model.base_com),
        base_inertia=e2(model.base_inertia),
        foot_offset=e2(model.foot_offset),
        foot_radius=float(model.foot_radius),
        wheel_offset=e2(model.wheel_offset),
        wheel_radius=float(model.wheel_radius),
        damping=e2(model.joint_damping),
        friction=e2(model.joint_friction),
        lower=e2(model.joint_lower),
        upper=e2(model.joint_upper),
        link_mass_rc=e2(np.flip(np.cumsum(np.flip(model.link_mass, 1), 1), 1)),
        total_mass=float(model.total_mass),
    )
    _CONST_CACHE[key] = c
    return c


# ---------------------------------------------------------------- small ops


def _mv(M, v):
    """Matrix-vector over leading structure axes: (..., i, j, Bs, L) x (..., j, Bs, L)."""
    return jnp.sum(M * v[..., None, :, :, :], axis=-3)


def _mm(A, B):
    # (..., i, k, Bs, L) @ (..., k, j, Bs, L)
    return jnp.sum(A[..., :, :, None, :, :] * B[..., None, :, :, :, :], axis=-4)


def _dot(a, b):
    return jnp.sum(a * b, axis=-3)


def _cross(a, b):
    a0, a1, a2 = a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]
    b0, b1, b2 = b[..., 0, :, :], b[..., 1, :, :], b[..., 2, :, :]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-3
    )


def _skew(c):
    z = jnp.zeros_like(c[..., 0, :, :])
    c0, c1, c2 = c[..., 0, :, :], c[..., 1, :, :], c[..., 2, :, :]
    r0 = jnp.stack([z, -c2, c1], axis=-3)
    r1 = jnp.stack([c2, z, -c0], axis=-3)
    r2 = jnp.stack([-c1, c0, z], axis=-3)
    return jnp.stack([r0, r1, r2], axis=-4)


def _rev_cumsum3(x, axis):
    """Reverse cumulative sum over a length-3 axis, unrolled.

    jnp.cumsum lowers to a reduce-window that crashes the TPU fusion emitter
    (jellyfish Check failure window_bounds==strides) for tiny windows — and
    the unrolled adds are faster anyway.
    """
    a0, a1, a2 = jnp.moveaxis(x, axis, 0)
    return jnp.stack([a0 + a1 + a2, a1 + a2, a2], axis=axis)


def inv3_sym(A, reg=1e-9):
    """Closed-form inverse of symmetric 3x3 blocks, elementwise over batch.

    A: (..., 3, 3, Bs, L)."""
    a = A[..., 0, 0, :, :] + reg
    b = A[..., 0, 1, :, :]
    c = A[..., 0, 2, :, :]
    d = A[..., 1, 1, :, :] + reg
    e = A[..., 1, 2, :, :]
    f = A[..., 2, 2, :, :] + reg
    A11 = d * f - e * e
    A12 = c * e - b * f
    A13 = b * e - c * d
    A22 = a * f - c * c
    A23 = b * c - a * e
    A33 = a * d - b * b
    det = a * A11 + b * A12 + c * A13
    inv_det = 1.0 / det
    r0 = jnp.stack([A11, A12, A13], axis=-3)
    r1 = jnp.stack([A12, A22, A23], axis=-3)
    r2 = jnp.stack([A13, A23, A33], axis=-3)
    return jnp.stack([r0, r1, r2], axis=-4) * inv_det[..., None, None, :, :]


def chol6(A, reg=1e-9):
    """Unrolled Cholesky factorization of SPD 6x6 blocks over batch.

    A: (6, 6, Bs, L) -> packed lower factor as a (21, Bs, L) stack in
    row-major lower-triangle order (L00, L10, L11, L20, ...)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j] + reg
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = Ljj
        inv_Ljj = 1.0 / Ljj
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_Ljj
    return jnp.stack([L[i][k] for i in range(n) for k in range(i + 1)])


def chol6_solve(Lp, b):
    """Solve L L^T x = b given the packed factor from chol6. b: (6, Bs, L)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    idx = 0
    for i in range(n):
        for k in range(i + 1):
            L[i][k] = Lp[idx]
            idx += 1
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def solve_spd6(A, b, reg=1e-9):
    """Unrolled Cholesky solve for SPD 6x6 systems, elementwise over batch.

    A: (6, 6, Bs, L), b: (6, Bs, L) -> x: (6, Bs, L)."""
    return chol6_solve(chol6(A, reg), b)


# ---------------------------------------------------------------- kinematics


class TLKin(NamedTuple):
    R_base: jnp.ndarray  # (3, 3, Bs, L)
    R_link: jnp.ndarray  # (4, 3, 3, 3, Bs, L)
    p_joint: jnp.ndarray  # (4, 3, 3, Bs, L) joint origins, world
    axis_w: jnp.ndarray  # (4, 3, 3, Bs, L)
    w_link: jnp.ndarray  # (4, 3, 3, Bs, L)
    v_origin: jnp.ndarray  # (4, 3, 3, Bs, L)
    p_foot: jnp.ndarray  # (4, 3, Bs, L)
    v_foot: jnp.ndarray  # (4, 3, Bs, L)
    p_wheel: jnp.ndarray  # (4, 3, Bs, L)
    v_wheel: jnp.ndarray  # (4, 3, Bs, L)


def fk(c: TLConstants, s: TLState) -> TLKin:
    R_base = quat_tl.to_matrix(s.base_orn)  # (3,3,Bs,L)
    q = s.joint_pos  # (4,3,Bs,L)
    qd = s.joint_vel

    R_parent = jnp.broadcast_to(
        R_base[None], (4,) + R_base.shape
    )  # (4,3,3,Bs,L)
    p_parent = jnp.broadcast_to(s.base_pos[None], (4,) + s.base_pos.shape)
    w_parent = jnp.broadcast_to(s.base_ang_vel[None], (4,) + s.base_ang_vel.shape)
    v_parent = jnp.broadcast_to(s.base_lin_vel[None], (4,) + s.base_lin_vel.shape)

    eye = jnp.eye(3, dtype=q.dtype)[:, :, None, None]
    Rl, Pj, Aw, Wl, Vo = [], [], [], [], []
    for j in range(3):
        off = c.joint_offset[:, j]  # (4,3,1,1)
        p_j = p_parent + _mv(R_parent, off)
        v_j = v_parent + _cross(w_parent, p_j - p_parent)
        a_w = _mv(R_parent, c.axis[:, j])
        ang = q[:, j]  # (4,Bs,L)
        sn = jnp.sin(ang)[:, None, None]
        cs = jnp.cos(ang)[:, None, None]
        R_joint = eye + sn * c.axis_K[:, j] + (1.0 - cs) * c.axis_KK[:, j]
        R_j = _mm(R_parent, R_joint)
        w_j = w_parent + a_w * qd[:, j][:, None]
        Rl.append(R_j)
        Pj.append(p_j)
        Aw.append(a_w)
        Wl.append(w_j)
        Vo.append(v_j)
        R_parent, p_parent, w_parent, v_parent = R_j, p_j, w_j, v_j

    R_link = jnp.stack(Rl, axis=1)  # (4,3links,3,3,Bs,L)
    p_joint = jnp.stack(Pj, axis=1)  # (4,3,3,Bs,L)
    axis_w = jnp.stack(Aw, axis=1)
    w_link = jnp.stack(Wl, axis=1)
    v_origin = jnp.stack(Vo, axis=1)

    R3 = R_link[:, 2]
    p_foot = p_joint[:, 2] + _mv(R3, c.foot_offset)
    v_foot = v_origin[:, 2] + _cross(w_link[:, 2], p_foot - p_joint[:, 2])
    R2 = R_link[:, 1]
    p_wheel = p_joint[:, 1] + _mv(R2, c.wheel_offset)
    v_wheel = v_origin[:, 1] + _cross(w_link[:, 1], p_wheel - p_joint[:, 1])
    return TLKin(
        R_base=R_base,
        R_link=R_link,
        p_joint=p_joint,
        axis_w=axis_w,
        w_link=w_link,
        v_origin=v_origin,
        p_foot=p_foot,
        v_foot=v_foot,
        p_wheel=p_wheel,
        v_wheel=v_wheel,
    )


# ------------------------------------------------------------ inertias/CRBA


# Inertias are kept in their 10-parameter form (mass m — static, first
# moment h = m*c (3), rotational inertia about the origin I_o (3x3)) and
# applied to 6-vectors directly. Never materializing (..., 6, 6) spatial
# matrices cuts the HBM traffic of the CRBA/RNEA intermediates by ~4x —
# the measured bottleneck of the batched solve.


def _sym_from_upper(u00, u01, u02, u11, u12, u22):
    """Assemble a symmetric (..., 3, 3, Bs, L) matrix from 6 upper comps."""
    r0 = jnp.stack([u00, u01, u02], axis=-3)
    r1 = jnp.stack([u01, u11, u12], axis=-3)
    r2 = jnp.stack([u02, u12, u22], axis=-3)
    return jnp.stack([r0, r1, r2], axis=-4)


def _rotate_sym(R, I):
    """R @ I @ R^T for symmetric I, computing only the 6 unique entries.

    R: (..., 3, 3, Bs, L); I broadcastable likewise. Saves the lower
    triangle of the second product (9 -> 6 dot products)."""
    A = _mm(R, I)  # (..., 3, 3, Bs, L)

    def row(i):
        return A[..., i, :, :, :]  # (..., 3, Bs, L)

    def rrow(i):
        return R[..., i, :, :, :]

    u00 = _dot(row(0), rrow(0))
    u01 = _dot(row(0), rrow(1))
    u02 = _dot(row(0), rrow(2))
    u11 = _dot(row(1), rrow(1))
    u12 = _dot(row(1), rrow(2))
    u22 = _dot(row(2), rrow(2))
    return _sym_from_upper(u00, u01, u02, u11, u12, u22)


def _shift_sym(m, d):
    """Parallel-axis term m*(d.d*eye - d d^T) built directly from 6 comps."""
    d0, d1, d2 = d[..., 0, :, :], d[..., 1, :, :], d[..., 2, :, :]
    dd = d0 * d0 + d1 * d1 + d2 * d2
    return _sym_from_upper(
        m * (dd - d0 * d0),
        -m * (d0 * d1),
        -m * (d0 * d2),
        m * (dd - d1 * d1),
        -m * (d1 * d2),
        m * (dd - d2 * d2),
    )


def _inertia_params_links(c: TLConstants, kin: TLKin, origin):
    """Per-link (h, I_o) about `origin` in world axes.

    h: (4, 3links, 3, Bs, L); I_o: (4, 3links, 3, 3, Bs, L)."""
    R = kin.R_link
    com_w = kin.p_joint + _mv(R, c.link_com)
    d = com_w - origin[None, None]
    I_cw = _rotate_sym(R, c.link_inertia)
    h = c.link_mass[..., None, :, :] * d
    I_o = I_cw + _shift_sym(c.link_mass, d)
    return h, I_o


def _inertia_params_base(c: TLConstants, kin: TLKin, origin, base_pos):
    com_w = base_pos + _mv(kin.R_base, c.base_com)
    d = com_w - origin
    I_cw = _rotate_sym(kin.R_base, c.base_inertia)
    h = c.base_mass * d
    I_o = I_cw + _shift_sym(c.base_mass, d)
    return h, I_o


def _inertia_apply(m, h, I_o, vec6):
    """[I_o w + h x v ; m v + w x h] for motion vec6 = [w; v]."""
    w = vec6[..., :3, :, :]
    v = vec6[..., 3:, :, :]
    ang = _mv(I_o, w) + _cross(h, v)
    lin = m * v + _cross(w, h)
    return jnp.concatenate([ang, lin], axis=-3)


def motion_subspaces(kin: TLKin, origin):
    """S = [a; a x (O - p)]: (4, 3, 6, Bs, L)."""
    a = kin.axis_w
    r = origin[None, None] - kin.p_joint
    return jnp.concatenate([a, _cross(a, r)], axis=-3)


class LegTerms(NamedTuple):
    """Per-substep shared terms: motion subspaces + link inertia params.

    Consumed by mass_blocks, bias_forces and point_forces_to_generalized —
    computed ONCE per substep in engine_tl.substep instead of relying on
    XLA CSE across the three call sites."""

    S: jnp.ndarray  # (4, 3, 6, Bs, L)
    h_l: jnp.ndarray  # (4, 3, 3, Bs, L)
    Io_l: jnp.ndarray  # (4, 3, 3, 3, Bs, L)


def leg_terms(c: TLConstants, kin: TLKin, origin) -> LegTerms:
    h_l, Io_l = _inertia_params_links(c, kin, origin)
    return LegTerms(S=motion_subspaces(kin, origin), h_l=h_l, Io_l=Io_l)


def mass_blocks(c: TLConstants, kin: TLKin, origin, base_pos, terms=None):
    if terms is None:
        terms = leg_terms(c, kin, origin)
    h_l, Io_l, S = terms.h_l, terms.Io_l, terms.S
    # composite params by reverse cumsum (composite masses are static)
    h_c = _rev_cumsum3(h_l, axis=1)
    Io_c = _rev_cumsum3(Io_l, axis=1)
    m_c = c.link_mass_rc[..., None, :, :]  # (4,3,1,1,1)
    F = _inertia_apply(m_c, h_c, Io_c, S)  # (4,3,6,Bs,L)
    # Ml[l,i,j] = S_i . Ic_max(i,j) S_j = S_i . F_j for i <= j (Ic symmetric)
    H = jnp.sum(S[:, :, None] * F[:, None, :], axis=-3)  # (4,i,j,Bs,L)
    iu = jnp.triu(jnp.ones((3, 3), dtype=bool))[None, :, :, None, None]
    Ml = jnp.where(iu, H, jnp.swapaxes(H, 1, 2))
    # total robot composite -> expand the single 6x6 Mb for the Schur solve
    h_b, Io_b = _inertia_params_base(c, kin, origin, base_pos)
    h_tot = h_b + jnp.sum(h_l, axis=(0, 1))
    Io_tot = Io_b + jnp.sum(Io_l, axis=(0, 1))
    m_tot = c.total_mass
    hx = _skew(h_tot)
    eye = jnp.eye(3, dtype=h_tot.dtype)[:, :, None, None]
    m_eye = jnp.broadcast_to(m_tot * eye, hx.shape)
    top = jnp.concatenate([Io_tot, hx], axis=-3)
    bot = jnp.concatenate([-hx, m_eye], axis=-3)
    Mb = jnp.concatenate([top, bot], axis=-4)
    return Mb, F, Ml


# ---------------------------------------------------------------- RNEA bias


def _cross_motion(v, m):
    w, vl = v[..., :3, :, :], v[..., 3:, :, :]
    mw, ml = m[..., :3, :, :], m[..., 3:, :, :]
    return jnp.concatenate([_cross(w, mw), _cross(w, ml) + _cross(vl, mw)], axis=-3)


def _cross_force(v, f):
    w, vl = v[..., :3, :, :], v[..., 3:, :, :]
    fw, fl = f[..., :3, :, :], f[..., 3:, :, :]
    return jnp.concatenate([_cross(w, fw) + _cross(vl, fl), _cross(w, fl)], axis=-3)


def bias_forces(c: TLConstants, kin: TLKin, s: TLState, origin, terms=None,
                v_base=None):
    if terms is None:
        terms = leg_terms(c, kin, origin)
    qd = s.joint_vel  # (4,3,Bs,L)
    S = terms.S
    if v_base is None:
        v_base = jnp.concatenate([s.base_ang_vel, s.base_lin_vel], axis=0)
    a_grav = jnp.zeros_like(v_base).at[5].set(GRAVITY)

    v_parent = jnp.broadcast_to(v_base[None], (4,) + v_base.shape)
    a_parent = jnp.broadcast_to(a_grav[None], (4,) + a_grav.shape)
    vs, accs = [], []
    for j in range(3):
        Sj = S[:, j]
        vj = v_parent + Sj * qd[:, j][:, None]
        aj = a_parent + _cross_motion(v_parent, Sj) * qd[:, j][:, None]
        vs.append(vj)
        accs.append(aj)
        v_parent, a_parent = vj, aj
    v_links = jnp.stack(vs, axis=1)  # (4,3,6,Bs,L)
    a_links = jnp.stack(accs, axis=1)

    h_l, Io_l = terms.h_l, terms.Io_l
    m_l = c.link_mass[..., None, :, :]
    f_links = _inertia_apply(m_l, h_l, Io_l, a_links) + _cross_force(
        v_links, _inertia_apply(m_l, h_l, Io_l, v_links)
    )
    f_acc = _rev_cumsum3(f_links, axis=1)
    tau_joint = _dot(S, f_acc)  # (4,3,Bs,L)

    h_b, Io_b = _inertia_params_base(c, kin, origin, s.base_pos)
    f_base = _inertia_apply(c.base_mass, h_b, Io_b, a_grav) + _cross_force(
        v_base, _inertia_apply(c.base_mass, h_b, Io_b, v_base)
    )
    tau_base = f_base + jnp.sum(f_links, axis=(0, 1))
    return tau_base, tau_joint


def point_forces_to_generalized(kin: TLKin, origin, points, forces, link_index,
                                S=None):
    """points/forces (4, 3, Bs, L) acting on link `link_index` of each leg."""
    n = _cross(points - origin[None], forces)
    Fsp = jnp.concatenate([n, forces], axis=-3)  # (4,6,Bs,L)
    tau_base = jnp.sum(Fsp, axis=0)
    if S is None:
        S = motion_subspaces(kin, origin)  # (4,3,6,Bs,L)
    tau_joint = _dot(S, Fsp[:, None])  # (4,3,Bs,L)
    mask = (jnp.arange(3) <= link_index).astype(tau_joint.dtype)[None, :, None, None]
    return tau_base, tau_joint * mask


class DynFactors(NamedTuple):
    """Configuration-dependent pieces of the leg-structured Schur solve.

    Factoring once and applying per-substep (forward_dynamics_apply) is the
    frozen-mass fast path: the factor cost (inv3_sym + Schur build + chol6)
    amortizes over PhysicsParams.mass_freeze substeps."""

    F: jnp.ndarray  # (4, 3, 6, Bs, L)
    Ml_inv: jnp.ndarray  # (4, 3, 3, Bs, L)
    FtMinv: jnp.ndarray  # (4, 3, 6, Bs, L)
    chol: jnp.ndarray  # (21, Bs, L) packed Cholesky of the Schur complement


def factor_dynamics(Mb, F, Ml, reg=1e-9) -> DynFactors:
    eye = jnp.eye(3, dtype=Ml.dtype)[None, :, :, None, None] * reg
    Ml_inv = inv3_sym(Ml + eye)  # (4,3,3,Bs,L)
    # FtMinv[l, i, a] = sum_j Ml_inv[l,i,j] F[l,j,a]
    FtMinv = jnp.sum(
        Ml_inv[..., :, :, None, :, :] * F[:, None, :, :, :, :], axis=2
    )  # (4,3,6,Bs,L)
    Schur = Mb - jnp.sum(
        F[:, :, :, None, :, :] * FtMinv[:, :, None, :, :, :], axis=(0, 1)
    )  # (6,6,Bs,L)
    return DynFactors(F=F, Ml_inv=Ml_inv, FtMinv=FtMinv, chol=chol6(Schur, reg))


def forward_dynamics_apply(fac: DynFactors, tau_base, tau_joint):
    rhs = tau_base - jnp.sum(fac.FtMinv * tau_joint[..., None, :, :], axis=(0, 1))
    a_base = chol6_solve(fac.chol, rhs)
    resid = tau_joint - jnp.sum(fac.F * a_base[None, None], axis=2)  # (4,3,Bs,L)
    qdd = jnp.sum(fac.Ml_inv * resid[:, None, :, :, :], axis=2)
    return a_base, qdd


def forward_dynamics(Mb, F, Ml, tau_base, tau_joint, reg=1e-9):
    """Leg-structured Schur solve in tile layout.

    Mb (6,6,Bs,L), F (4,3,6,Bs,L), Ml (4,3,3,Bs,L), tau_base (6,Bs,L),
    tau_joint (4,3,Bs,L) -> a_base (6,Bs,L), qdd (4,3,Bs,L)."""
    return forward_dynamics_apply(factor_dynamics(Mb, F, Ml, reg), tau_base, tau_joint)
