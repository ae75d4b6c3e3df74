"""Scalar-constant MAX dynamics: the Pallas-kernel physics.

Same math as physics.engine_tl/batched (the tile-layout oracle), re-expressed
so every model constant is a PYTHON FLOAT and every batched quantity is a
plain 2D tile (Bs, L). Structure axes (legs, links, vector components) are
Python-level tuples unrolled at trace time. Why:

  * Pallas kernels cannot capture array constants — floats fold into the
    instruction stream.
  * Constant folding exploits the MAX robot's sparsity that generic (4, 3,
    3, ...) array math cannot: all four legs share axis-aligned joint axes
    (hip roll +x, hip/knee pitch -y, reference max.urdf), so link rotations
    are Givens updates, the two pitch axes are the SAME world vector, and
    zero offsets/inertia products disappear entirely at trace time.
  * No broadcast waste: generic layouts multiply (.., 1, 1)-shaped constants
    over full tiles; here a constant-zero term never becomes an op.

Semantics parity: one `substep` here == engine_tl.substep (PD + passive
torques, compliant foot/wheel-plane contact, frozen-origin mass option,
semi-implicit Euler) — asserted in tests/test_scalar_phys.py.

Values are either Python floats (compile-time constants) or broadcast-
compatible jnp arrays (tiles). Vectors are length-3 tuples, matrices
3-tuples of row 3-tuples, quaternions length-4 tuples (x, y, z, w).
"""
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.physics.dynamics import GRAVITY
from lifelike_tpu.physics.engine import _LIMIT_D, _LIMIT_K, _TGT_CLIP

# ------------------------------------------------------------ scalar algebra


def _const(v):
    return isinstance(v, (int, float))


def add(a, b):
    if _const(a) and a == 0.0:
        return b
    if _const(b) and b == 0.0:
        return a
    if _const(a) and _const(b):
        return a + b
    return a + b


def sub(a, b):
    if _const(b) and b == 0.0:
        return a
    if _const(a) and _const(b):
        return a - b
    if _const(a) and a == 0.0:
        return -b
    return a - b


def mul(a, b):
    if (_const(a) and a == 0.0) or (_const(b) and b == 0.0):
        return 0.0
    if _const(a) and a == 1.0:
        return b
    if _const(b) and b == 1.0:
        return a
    if _const(a) and _const(b):
        return a * b
    return a * b


def neg(a):
    if _const(a):
        return -a
    return -a


def fma(a, b, c):
    """a*b + c with folding."""
    return add(mul(a, b), c)


# vectors: tuples of 3


def vadd(a, b):
    return tuple(add(x, y) for x, y in zip(a, b))


def vsub(a, b):
    return tuple(sub(x, y) for x, y in zip(a, b))


def vscale(k, a):
    return tuple(mul(k, x) for x in a)


def vdot(a, b):
    return add(add(mul(a[0], b[0]), mul(a[1], b[1])), mul(a[2], b[2]))


def vcross(a, b):
    return (
        sub(mul(a[1], b[2]), mul(a[2], b[1])),
        sub(mul(a[2], b[0]), mul(a[0], b[2])),
        sub(mul(a[0], b[1]), mul(a[1], b[0])),
    )


VZERO = (0.0, 0.0, 0.0)


def mat_vec(M, v):
    return tuple(vdot(row, v) for row in M)


def mat_tvec(M, v):
    """M^T v."""
    return tuple(
        add(add(mul(M[0][j], v[0]), mul(M[1][j], v[1])), mul(M[2][j], v[2]))
        for j in range(3)
    )


def mat_mul(A, B):
    return tuple(
        tuple(
            add(add(mul(A[i][0], B[0][j]), mul(A[i][1], B[1][j])),
                mul(A[i][2], B[2][j]))
            for j in range(3)
        )
        for i in range(3)
    )


def mat_col(M, j):
    return (M[0][j], M[1][j], M[2][j])


# symmetric 3x3 as 6-tuple (xx, xy, xz, yy, yz, zz)


def sym_vec(S, v):
    xx, xy, xz, yy, yz, zz = S
    return (
        add(add(mul(xx, v[0]), mul(xy, v[1])), mul(xz, v[2])),
        add(add(mul(xy, v[0]), mul(yy, v[1])), mul(yz, v[2])),
        add(add(mul(xz, v[0]), mul(yz, v[1])), mul(zz, v[2])),
    )


def sym_add(a, b):
    return tuple(add(x, y) for x, y in zip(a, b))


def rotate_sym(R, S):
    """R S R^T -> 6-tuple, for symmetric S (6-tuple)."""
    # A = R S (rows of R times symmetric S)
    A = tuple(sym_vec(S, R[i]) for i in range(3))  # row i of (S R_i^T)^T == R_i S
    return (
        vdot(A[0], R[0]),
        vdot(A[0], R[1]),
        vdot(A[0], R[2]),
        vdot(A[1], R[1]),
        vdot(A[1], R[2]),
        vdot(A[2], R[2]),
    )


def shift_sym(m, d):
    """m * (d.d * eye - d d^T) -> 6-tuple."""
    d0, d1, d2 = d
    s00 = add(mul(d1, d1), mul(d2, d2))
    s11 = add(mul(d0, d0), mul(d2, d2))
    s22 = add(mul(d0, d0), mul(d1, d1))
    return (
        mul(m, s00),
        neg(mul(m, mul(d0, d1))),
        neg(mul(m, mul(d0, d2))),
        mul(m, s11),
        neg(mul(m, mul(d1, d2))),
        mul(m, s22),
    )


# ---------------------------------------------------------------- model data


class ScalarModel(NamedTuple):
    """MAX constants as nested tuples of Python floats (4 legs x 3 links)."""

    o1: tuple  # per-leg joint-1 offset (x, y) — z is 0
    o2y: tuple  # per-leg joint-2 y offset
    o3z: float  # joint-3 z offset (thigh length, shared)
    foot_z: float  # foot offset along link-3 z
    wheel: tuple  # per-leg wheel offset (y, z) in link-2 frame
    com: tuple  # per-leg per-link COM (3,) floats
    inertia: tuple  # per-leg per-link symmetric 6-tuple about COM
    mass: tuple  # per-leg per-link mass
    mass_rc: tuple  # per-leg per-link reverse-cumulative chain mass
    base_com: tuple
    base_inertia: tuple  # symmetric 6
    base_mass: float
    total_mass: float
    foot_radius: float
    wheel_radius: float
    damping: float
    friction: float
    lower: tuple  # per-leg per-link
    upper: tuple


def build_scalar_model(model) -> ScalarModel:
    f = float
    sym6 = lambda I: (f(I[0, 0]), f(I[0, 1]), f(I[0, 2]), f(I[1, 1]),
                      f(I[1, 2]), f(I[2, 2]))
    # sanity: the specialization below hard-codes the MAX axis layout
    assert np.allclose(model.joint_axis[:, 0], [1, 0, 0])
    assert np.allclose(model.joint_axis[:, 1], [0, -1, 0])
    assert np.allclose(model.joint_axis[:, 2], [0, -1, 0])
    assert np.allclose(model.joint_offset[:, 0, 2], 0.0)
    assert np.allclose(model.joint_offset[:, 1, 0], 0.0)
    assert np.allclose(model.joint_offset[:, 1, 2], 0.0)
    assert np.allclose(model.joint_offset[:, 2, :2], 0.0)
    assert np.allclose(model.foot_offset[:, :2], 0.0)
    assert np.allclose(model.wheel_offset[:, 0], 0.0)
    rc = np.flip(np.cumsum(np.flip(model.link_mass, 1), 1), 1)
    return ScalarModel(
        o1=tuple((f(model.joint_offset[l, 0, 0]), f(model.joint_offset[l, 0, 1]))
                 for l in range(4)),
        o2y=tuple(f(model.joint_offset[l, 1, 1]) for l in range(4)),
        o3z=f(model.joint_offset[0, 2, 2]),
        foot_z=f(model.foot_offset[0, 2]),
        wheel=tuple((f(model.wheel_offset[l, 1]), f(model.wheel_offset[l, 2]))
                    for l in range(4)),
        com=tuple(tuple(tuple(f(x) for x in model.link_com[l, j])
                        for j in range(3)) for l in range(4)),
        inertia=tuple(tuple(sym6(model.link_inertia[l, j]) for j in range(3))
                      for l in range(4)),
        mass=tuple(tuple(f(model.link_mass[l, j]) for j in range(3))
                   for l in range(4)),
        mass_rc=tuple(tuple(f(rc[l, j]) for j in range(3)) for l in range(4)),
        base_com=tuple(f(x) for x in model.base_com),
        base_inertia=sym6(model.base_inertia),
        base_mass=f(model.base_mass),
        total_mass=f(model.total_mass),
        foot_radius=f(model.foot_radius),
        wheel_radius=f(model.wheel_radius),
        damping=f(model.joint_damping[0, 0]),
        friction=f(model.joint_friction[0, 0]),
        lower=tuple(tuple(f(model.joint_lower[l, j]) for j in range(3))
                    for l in range(4)),
        upper=tuple(tuple(f(model.joint_upper[l, j]) for j in range(3))
                    for l in range(4)),
    )


# ------------------------------------------------------------------ FK


class LegKin(NamedTuple):
    a1: tuple  # world hip-roll axis (= R_base col 0)
    a23: tuple  # world pitch axis, shared by joints 2 and 3 (= -R1 col 1)
    p1: tuple
    p2: tuple
    p3: tuple
    p_foot: tuple
    p_wheel: tuple
    w1: tuple
    w2: tuple
    w3: tuple
    v1: tuple  # classic velocity of each joint origin
    v2: tuple
    v3: tuple
    v_foot: tuple
    v_wheel: tuple
    R1: tuple
    R2: tuple
    R3: tuple


def quat_to_mat(q):
    x, y, z, w = q
    xx, yy, zz = mul(x, x), mul(y, y), mul(z, z)
    xy, xz, yz = mul(x, y), mul(x, z), mul(y, z)
    wx, wy, wz = mul(w, x), mul(w, y), mul(w, z)
    two = 2.0
    return (
        (1.0 - mul(two, add(yy, zz)), mul(two, sub(xy, wz)), mul(two, add(xz, wy))),
        (mul(two, add(xy, wz)), 1.0 - mul(two, add(xx, zz)), mul(two, sub(yz, wx))),
        (mul(two, sub(xz, wy)), mul(two, add(yz, wx)), 1.0 - mul(two, add(xx, yy))),
    )


def leg_fk(sm: ScalarModel, leg, Rb, pb, wb, vb, q, qd):
    """q, qd: 3-tuples of tiles for this leg."""
    s1, c1 = jnp.sin(q[0]), jnp.cos(q[0])
    s2, c2 = jnp.sin(q[1]), jnp.cos(q[1])
    q23 = q[1] + q[2]
    s23, c23 = jnp.sin(q23), jnp.cos(q23)

    Rbc0, Rbc1, Rbc2 = mat_col(Rb, 0), mat_col(Rb, 1), mat_col(Rb, 2)
    # R1 = Rb @ Rx(q1): col0 = Rbc0, col1 = c1*Rbc1 + s1*Rbc2,
    # col2 = -s1*Rbc1 + c1*Rbc2
    R1c1 = vadd(vscale(c1, Rbc1), vscale(s1, Rbc2))
    R1c2 = vsub(vscale(c1, Rbc2), vscale(s1, Rbc1))
    # R2 = R1 @ Ry(-q2): Ry(t) = [[c,0,s],[0,1,0],[-s,0,c]], t = -q2
    # col0 = c2*R1c0 + s2*R1c2 ; col1 = R1c1 ; col2 = -s2*R1c0 + c2*R1c2
    R2c0 = vadd(vscale(c2, Rbc0), vscale(s2, R1c2))
    R2c2 = vsub(vscale(c2, R1c2), vscale(s2, Rbc0))
    # R3 = R1 @ Ry(-(q2+q3))
    R3c0 = vadd(vscale(c23, Rbc0), vscale(s23, R1c2))
    R3c2 = vsub(vscale(c23, R1c2), vscale(s23, Rbc0))

    def cols_to_mat(c0, c1_, c2_):
        return tuple((c0[i], c1_[i], c2_[i]) for i in range(3))

    R1 = cols_to_mat(Rbc0, R1c1, R1c2)
    R2 = cols_to_mat(R2c0, R1c1, R2c2)
    R3 = cols_to_mat(R3c0, R1c1, R3c2)

    o1x, o1y = sm.o1[leg]
    p1 = vadd(pb, vadd(vscale(o1x, Rbc0), vscale(o1y, Rbc1)))
    p2 = vadd(p1, vscale(sm.o2y[leg], R1c1))
    p3 = vadd(p2, vscale(sm.o3z, R2c2))
    p_foot = vadd(p3, vscale(sm.foot_z, R3c2))
    wy, wz = sm.wheel[leg]
    p_wheel = vadd(p2, vadd(vscale(wy, R1c1), vscale(wz, R2c2)))

    a1 = Rbc0
    a23 = vscale(-1.0, R1c1)  # -R1 col 1 (pitch axes parallel down the chain)

    w1 = vadd(wb, vscale(qd[0], a1))
    w2 = vadd(w1, vscale(qd[1], a23))
    w3 = vadd(w2, vscale(qd[2], a23))

    v1 = vadd(vb, vcross(wb, vsub(p1, pb)))
    v2 = vadd(v1, vcross(w1, vsub(p2, p1)))
    v3 = vadd(v2, vcross(w2, vsub(p3, p2)))
    v_foot = vadd(v3, vcross(w3, vsub(p_foot, p3)))
    v_wheel = vadd(v2, vcross(w2, vsub(p_wheel, p2)))
    return LegKin(a1, a23, p1, p2, p3, p_foot, p_wheel,
                  w1, w2, w3, v1, v2, v3, v_foot, v_wheel, R1, R2, R3)


# ------------------------------------------------------ inertia / mass terms


class LegMass(NamedTuple):
    S: tuple  # 3 x spatial (ang 3-tuple, lin 3-tuple) motion subspaces
    h: tuple  # per-link first moment about origin (3 x vec3)
    Io: tuple  # per-link rotational inertia about origin (3 x sym6)


def leg_mass_terms(sm: ScalarModel, leg, kin: LegKin, origin):
    Rs = (kin.R1, kin.R2, kin.R3)
    ps = (kin.p1, kin.p2, kin.p3)
    axes = (kin.a1, kin.a23, kin.a23)
    h, Io, S = [], [], []
    for j in range(3):
        com_w = vadd(ps[j], mat_vec(Rs[j], sm.com[leg][j]))
        d = vsub(com_w, origin)
        m = sm.mass[leg][j]
        I_cw = rotate_sym(Rs[j], sm.inertia[leg][j])
        h.append(vscale(m, d))
        Io.append(sym_add(I_cw, shift_sym(m, d)))
        S.append((axes[j], vcross(axes[j], vsub(origin, ps[j]))))
    return LegMass(S=tuple(S), h=tuple(h), Io=tuple(Io))


def spatial_dot(Sa, f):
    """<[a; b], [n; f]> for spatial motion x force pairs."""
    return add(vdot(Sa[0], f[0]), vdot(Sa[1], f[1]))


def inertia_apply(m, h, Io, mot):
    """[Io w + h x v ; m v + w x h] for motion [w; v]."""
    w, v = mot
    return (vadd(sym_vec(Io, w), vcross(h, v)),
            vadd(vscale(m, v), vcross(w, h)))


def cross_motion(a, b):
    """spatial motion cross product a x b, a=[w;v], b=[wb;vb]."""
    return (vcross(a[0], b[0]), vadd(vcross(a[0], b[1]), vcross(a[1], b[0])))


def cross_force(a, f):
    """spatial force cross product a x* f."""
    return (vadd(vcross(a[0], f[0]), vcross(a[1], f[1])), vcross(a[0], f[1]))

# ------------------------------------------------------------ state plumbing


class State(NamedTuple):
    """Tile-state: tuples of (Bs, L) tiles (or broadcastable)."""

    pb: tuple  # base position (3,)
    q: tuple  # base quaternion (x, y, z, w)
    vb: tuple  # base linear velocity, world
    wb: tuple  # base angular velocity, world
    jq: tuple  # 4 legs x 3 joints
    jqd: tuple


def from_tl(tl) -> State:
    """physics.batched.TLState -> State (zero-copy component views)."""
    return State(
        pb=tuple(tl.base_pos[i] for i in range(3)),
        q=tuple(tl.base_orn[i] for i in range(4)),
        vb=tuple(tl.base_lin_vel[i] for i in range(3)),
        wb=tuple(tl.base_ang_vel[i] for i in range(3)),
        jq=tuple(tuple(tl.joint_pos[l, j] for j in range(3)) for l in range(4)),
        jqd=tuple(tuple(tl.joint_vel[l, j] for j in range(3)) for l in range(4)),
    )


def to_tl(s: State):
    from lifelike_tpu.physics.batched import TLState

    shape = jnp.shape(s.jq[0][0])
    dtype = jnp.result_type(s.jq[0][0])
    b = lambda x: (
        jnp.broadcast_to(jnp.asarray(x, dtype), shape) if _const(x) else x
    )
    stk = lambda xs: jnp.stack([b(x) for x in xs])
    return TLState(
        base_pos=stk(s.pb),
        base_orn=stk(s.q),
        base_lin_vel=stk(s.vb),
        base_ang_vel=stk(s.wb),
        joint_pos=jnp.stack([stk(row) for row in s.jq]),
        joint_vel=jnp.stack([stk(row) for row in s.jqd]),
    )


# -------------------------------------------------------------- mass factors


class Factors(NamedTuple):
    origin: tuple  # vec3: world point all spatial quantities reference
    legs: tuple  # 4 x LegMass (frozen geometry for bias/contact mapping)
    F: tuple  # 4 x 3 spatial forces (composite inertia x subspace)
    Mlinv: tuple  # 4 x sym6-as-3x3-tuples inverse of the 3x3 joint block
    FtMinv: tuple  # 4 x 3 spatial: Mlinv @ F
    chol: tuple  # packed lower Cholesky of the 6x6 Schur complement


def _sym3_inv(M, reg=1e-9):
    """M: ((m00,m01,m02),(m01,m11,m12),(m02,m12,m22)) tiles -> inverse rows."""
    a = add(M[0][0], reg)
    b, c = M[0][1], M[0][2]
    d = add(M[1][1], reg)
    e = M[1][2]
    f = add(M[2][2], reg)
    A11 = sub(mul(d, f), mul(e, e))
    A12 = sub(mul(c, e), mul(b, f))
    A13 = sub(mul(b, e), mul(c, d))
    A22 = sub(mul(a, f), mul(c, c))
    A23 = sub(mul(b, c), mul(a, e))
    A33 = sub(mul(a, d), mul(b, b))
    det = add(add(mul(a, A11), mul(b, A12)), mul(c, A13))
    inv = 1.0 / det
    return (
        (mul(A11, inv), mul(A12, inv), mul(A13, inv)),
        (mul(A12, inv), mul(A22, inv), mul(A23, inv)),
        (mul(A13, inv), mul(A23, inv), mul(A33, inv)),
    )


def _chol6(A, reg=1e-9):
    """A: 6x6 nested tuples (symmetric) -> packed lower factor (21 entries)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = add(A[j][j], reg)
        for k in range(j):
            s = sub(s, mul(L[j][k], L[j][k]))
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = sub(s, mul(L[i][k], L[j][k]))
            L[i][j] = mul(s, inv)
    return tuple(L[i][k] for i in range(n) for k in range(i + 1))


def _chol6_solve(Lp, b):
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
            s = sub(s, mul(L[i][k], y[k]))
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = sub(s, mul(L[k][i], x[k]))
        x[i] = s / L[i][i]
    return tuple(x)


def _skew_rows(h):
    return ((0.0, neg(h[2]), h[1]), (h[2], 0.0, neg(h[0])), (neg(h[1]), h[0], 0.0))


def freeze_mass(sm: ScalarModel, s: State) -> Factors:
    """Mass matrix + Schur factorization about origin = current base pos."""
    Rb = quat_to_mat(s.q)
    origin = s.pb
    legs, F_all, Mlinv_all, FtMinv_all = [], [], [], []
    # totals for the 6x6 base block
    h_tot = list(vscale(sm.base_mass,
                        vsub(vadd(s.pb, mat_vec(Rb, sm.base_com)), origin)))
    d_b = vsub(vadd(s.pb, mat_vec(Rb, sm.base_com)), origin)
    Io_tot = list(sym_add(rotate_sym(Rb, sm.base_inertia),
                          shift_sym(sm.base_mass, d_b)))
    schur_corr = [[0.0] * 6 for _ in range(6)]  # sum F Mlinv F^T
    for leg in range(4):
        kin = leg_fk(sm, leg, Rb, s.pb, s.wb, s.vb, s.jq[leg], s.jqd[leg])
        lm = leg_mass_terms(sm, leg, kin, origin)
        legs.append(lm)
        for j in range(3):
            h_tot = [add(a, b) for a, b in zip(h_tot, lm.h[j])]
            Io_tot = [add(a, b) for a, b in zip(Io_tot, lm.Io[j])]
        # composite params (reverse cumsum over the chain)
        h_c = [lm.h[2]] * 3
        Io_c = [lm.Io[2]] * 3
        h_c[1] = vadd(lm.h[1], lm.h[2])
        Io_c[1] = sym_add(lm.Io[1], lm.Io[2])
        h_c[0] = vadd(lm.h[0], h_c[1])
        Io_c[0] = sym_add(lm.Io[0], Io_c[1])
        F = tuple(
            inertia_apply(sm.mass_rc[leg][j], h_c[j], Io_c[j], lm.S[j])
            for j in range(3)
        )
        # 3x3 joint block Ml[i][j] = S_i . F_max(i,j)
        Ml = tuple(
            tuple(spatial_dot(lm.S[i], F[max(i, j)]) for j in range(3))
            for i in range(3)
        )
        Mlinv = _sym3_inv(Ml)
        # FtMinv[i] = sum_j Mlinv[i][j] F[j] (spatial)
        FtMinv = tuple(
            (
                tuple(add(add(mul(Mlinv[i][0], F[0][0][k]),
                              mul(Mlinv[i][1], F[1][0][k])),
                          mul(Mlinv[i][2], F[2][0][k])) for k in range(3)),
                tuple(add(add(mul(Mlinv[i][0], F[0][1][k]),
                              mul(Mlinv[i][1], F[1][1][k])),
                          mul(Mlinv[i][2], F[2][1][k])) for k in range(3)),
            )
            for i in range(3)
        )
        F_all.append(F)
        Mlinv_all.append(Mlinv)
        FtMinv_all.append(FtMinv)
        for i in range(3):
            Fi = F[i][0] + F[i][1]  # 6 components (ang then lin)
            Mi = FtMinv[i][0] + FtMinv[i][1]
            for r in range(6):
                for cc in range(r + 1):
                    schur_corr[r][cc] = add(schur_corr[r][cc],
                                            mul(Fi[r], Mi[cc]))
    # assemble 6x6 Mb = [[Io, hx], [-hx, m eye]] and Schur = Mb - corr
    hx = _skew_rows(h_tot)
    Io_m = (
        (Io_tot[0], Io_tot[1], Io_tot[2]),
        (Io_tot[1], Io_tot[3], Io_tot[4]),
        (Io_tot[2], Io_tot[4], Io_tot[5]),
    )
    Mb = [[0.0] * 6 for _ in range(6)]
    for r in range(3):
        for cc in range(3):
            Mb[r][cc] = Io_m[r][cc]
            Mb[r][3 + cc] = hx[r][cc]
            Mb[3 + r][cc] = neg(hx[r][cc])
            Mb[3 + r][3 + cc] = sm.total_mass if r == cc else 0.0
    Schur = tuple(
        tuple(sub(Mb[r][cc], schur_corr[max(r, cc)][min(r, cc)])
              for cc in range(6))
        for r in range(6)
    )
    return Factors(
        origin=origin,
        legs=tuple(legs),
        F=tuple(F_all),
        Mlinv=tuple(Mlinv_all),
        FtMinv=tuple(FtMinv_all),
        chol=_chol6(Schur),
    )

# --------------------------------------------------------------- bias forces


def _sp_add(a, b):
    return (vadd(a[0], b[0]), vadd(a[1], b[1]))


def _sp_scale(k, a):
    return (vscale(k, a[0]), vscale(k, a[1]))


def leg_bias(sm: ScalarModel, leg, lm: LegMass, v_sp_base, a_grav_sp, qd):
    """RNEA bias torques for one leg about the shared origin.

    Returns (tau (3 tiles), f_total spatial force = sum of link forces)."""
    vp, ap = v_sp_base, a_grav_sp
    v, a = [], []
    for j in range(3):
        Sj = lm.S[j]
        v.append(_sp_add(vp, _sp_scale(qd[j], Sj)))
        a.append(_sp_add(ap, _sp_scale(qd[j], cross_motion(vp, Sj))))
        vp, ap = v[j], a[j]
    f = []
    for j in range(3):
        m, h, Io = sm.mass[leg][j], lm.h[j], lm.Io[j]
        f.append(_sp_add(inertia_apply(m, h, Io, a[j]),
                         cross_force(v[j], inertia_apply(m, h, Io, v[j]))))
    f_acc2 = f[2]
    f_acc1 = _sp_add(f[1], f_acc2)
    f_acc0 = _sp_add(f[0], f_acc1)
    tau = (
        spatial_dot(lm.S[0], f_acc0),
        spatial_dot(lm.S[1], f_acc1),
        spatial_dot(lm.S[2], f_acc2),
    )
    return tau, f_acc0


def base_bias(sm: ScalarModel, Rb, pb, origin, v_sp_base, a_grav_sp):
    d = vsub(vadd(pb, mat_vec(Rb, sm.base_com)), origin)
    h = vscale(sm.base_mass, d)
    Io = sym_add(rotate_sym(Rb, sm.base_inertia), shift_sym(sm.base_mass, d))
    return _sp_add(
        inertia_apply(sm.base_mass, h, Io, a_grav_sp),
        cross_force(v_sp_base, inertia_apply(sm.base_mass, h, Io, v_sp_base)),
    )


# ------------------------------------------------------------------- contact


def plane_contact_force(p, v, radius, cp, mu):
    """engine_tl.sphere_ground_force specialized to the z=0 plane (n = z)."""
    gap = p[2] - radius
    pen = jnp.maximum(-gap, 0.0)
    in_contact = pen > 0.0
    vn = v[2]
    fn = cp.kn * pen + cp.dn * jnp.maximum(-vn, 0.0) * in_contact
    fn = jnp.maximum(fn, 0.0) * in_contact
    vt2 = v[0] * v[0] + v[1] * v[1] + 1e-12
    coef = jnp.minimum(
        mul(mu, fn) * jax.lax.rsqrt(vt2 + cp.v_slip**2), cp.fric_visc_cap
    )
    return (neg(mul(coef, v[0])), neg(mul(coef, v[1])), fn)


def box_forces(p, v, radius, bx, cp, mu):
    """engine_tl.sphere_boxes_force for ONE sphere, vectorized over K boxes.

    bx: 7-tuple of (K, 1, 1) arrays (cx, cy, cz, hx, hy, hz, active) —
    broadcast against the (Bs, L) tiles of p/v (3-tuples). The per-box
    tensors are (K, Bs, L); the K axis reduces at the end, so the kernel
    pays K-vectorized VPU ops instead of K-unrolled scalar instructions.
    Returns a 3-tuple of (Bs, L) forces (summed over boxes)."""
    cx, cy, cz, hx, hy, hz, act = bx
    r = (p[0] - cx, p[1] - cy, p[2] - cz)  # (K, Bs, L)
    q = (jnp.abs(r[0]) - hx, jnp.abs(r[1]) - hy, jnp.abs(r[2]) - hz)
    o = tuple(jnp.maximum(qi, 0.0) for qi in q)
    d2 = o[0] * o[0] + o[1] * o[1] + o[2] * o[2] + 1e-9
    d_out = jnp.sqrt(d2)
    inv_dout = jax.lax.rsqrt(d2)  # divides are multi-cycle on the VPU;
    d_in = jnp.maximum(jnp.maximum(q[0], q[1]), q[2])
    inside = d_in < 0.0
    dist = jnp.where(inside, d_in, d_out)
    sign = tuple(jnp.where(ri >= 0.0, 1.0, -1.0) for ri in r)
    face = tuple((qi >= d_in).astype(d_out.dtype) for qi in q)
    # reciprocal-multiply in place of the 6 per-component divides
    inv_fsum = 1.0 / jnp.maximum(face[0] + face[1] + face[2], 1.0)
    n = tuple(
        jnp.where(inside, sign[i] * face[i] * inv_fsum,
                  sign[i] * o[i] * inv_dout)
        for i in range(3)
    )
    pen = jnp.maximum(radius - dist, 0.0)
    in_contact = pen > 0.0
    vn = v[0] * n[0] + v[1] * n[1] + v[2] * n[2]
    fn = cp.kn * pen + cp.dn * jnp.maximum(-vn, 0.0) * in_contact
    fn = jnp.maximum(fn, 0.0) * in_contact
    vt = tuple(v[i] - vn * n[i] for i in range(3))
    vt2 = vt[0] * vt[0] + vt[1] * vt[1] + vt[2] * vt[2]
    coef = jnp.minimum(
        mul(mu, fn) * jax.lax.rsqrt(vt2 + 1e-12 + cp.v_slip**2),
        cp.fric_visc_cap,
    )
    return tuple(
        jnp.sum((fn * n[i] - coef * vt[i]) * act, axis=0) for i in range(3)
    )


# trunk collision proxy (engine._TRUNK_OFFSETS parity): six spheres on a
# 3x2 grid in the body x/y plane, as static floats
from lifelike_tpu.physics.engine import _TRUNK_OFFSETS, _TRUNK_RADIUS  # noqa: E402

_TRUNK_OFFS = tuple(tuple(float(x) for x in row) for row in _TRUNK_OFFSETS)


# ------------------------------------------------------------------- substep


def pd_passive(sm: ScalarModel, params, leg, q, qd, target):
    taus = []
    for j in range(3):
        tgt = jnp.clip(target[j], -_TGT_CLIP, _TGT_CLIP)
        tau = jnp.clip(
            params.kp * (tgt - q[j]) - params.kd * qd[j],
            -params.max_tau, params.max_tau,
        )
        tau = tau - sm.damping * qd[j] - sm.friction * jnp.tanh(qd[j] / 0.5)
        below = jnp.minimum(q[j] - sm.lower[leg][j], 0.0)
        above = jnp.maximum(q[j] - sm.upper[leg][j], 0.0)
        tau = tau - _LIMIT_K * (below + above)
        tau = tau - _LIMIT_D * qd[j] * ((below < 0.0) | (above > 0.0))
        taus.append(tau)
    return tuple(taus)


def _quat_integrate(q, w, dt):
    rv = vscale(dt, w)
    ang2 = vdot(rv, rv)
    angle = jnp.sqrt(ang2)
    half = 0.5 * angle
    k = 0.5 * jnp.sinc(half / math.pi)
    dq = (mul(k, rv[0]), mul(k, rv[1]), mul(k, rv[2]), jnp.cos(half))
    x1, y1, z1, w1 = dq
    x2, y2, z2, w2 = q
    out = (
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    )
    inv_n = 1.0 / jnp.sqrt(
        jnp.maximum(sum(c * c for c in out), 1e-16)
    )
    return tuple(c * inv_n for c in out)


def substep(sm: ScalarModel, params, s: State, target, frozen: Factors,
            boxes=None) -> State:
    """One 500 Hz step against frozen mass factors (engine_tl parity).

    target: 4x3 tuples of joint position targets (absolute).
    boxes: optional 7-tuple of (K, 1, 1) arrays (see box_forces) — adds the
    engine_tl box-scene contact path (feet/wheels/trunk vs boxes)."""
    Rb = quat_to_mat(s.q)
    O = frozen.origin
    r = vsub(s.pb, O)
    v_at_o = vsub(s.vb, vcross(s.wb, r))
    v_sp = (s.wb, v_at_o)
    a_grav = (VZERO, (0.0, 0.0, GRAVITY))

    tau_b = (list(VZERO), list(VZERO))  # spatial force accumulator (ang, lin)
    tau_j = [[0.0] * 3 for _ in range(4)]

    for leg in range(4):
        kin = leg_fk(sm, leg, Rb, s.pb, s.wb, s.vb, s.jq[leg], s.jqd[leg])
        lm = frozen.legs[leg]

        pd = pd_passive(sm, params, leg, s.jq[leg], s.jqd[leg],
                        target[leg])
        for j in range(3):
            tau_j[leg][j] = pd[j]

        # foot contact (acts through all 3 joints)
        f_foot = plane_contact_force(
            kin.p_foot, kin.v_foot, sm.foot_radius, params.contact,
            params.foot_friction,
        )
        if boxes is not None:
            fb = box_forces(kin.p_foot, kin.v_foot, sm.foot_radius, boxes,
                            params.contact, params.foot_friction)
            f_foot = vadd(f_foot, fb)
        n_foot = vcross(vsub(kin.p_foot, O), f_foot)
        sp_foot = (n_foot, f_foot)
        # wheel contact (link 2: joints 1 and 2 only)
        f_wheel = plane_contact_force(
            kin.p_wheel, kin.v_wheel, sm.wheel_radius, params.contact,
            params.foot_friction,
        )
        if boxes is not None:
            fb = box_forces(kin.p_wheel, kin.v_wheel, sm.wheel_radius, boxes,
                            params.contact, params.foot_friction)
            f_wheel = vadd(f_wheel, fb)
        n_wheel = vcross(vsub(kin.p_wheel, O), f_wheel)
        sp_wheel = (n_wheel, f_wheel)

        tau_b = (
            [add(a, add(b, c)) for a, b, c in zip(tau_b[0], n_foot, n_wheel)],
            [add(a, add(b, c)) for a, b, c in zip(tau_b[1], f_foot, f_wheel)],
        )
        for j in range(3):
            tau_j[leg][j] = add(tau_j[leg][j], spatial_dot(lm.S[j], sp_foot))
        for j in range(2):
            tau_j[leg][j] = add(tau_j[leg][j], spatial_dot(lm.S[j], sp_wheel))

        # bias
        bias_j, f_leg = leg_bias(sm, leg, lm, v_sp, a_grav, s.jqd[leg])
        for j in range(3):
            tau_j[leg][j] = sub(tau_j[leg][j], bias_j[j])
        tau_b = (
            [sub(a, b) for a, b in zip(tau_b[0], f_leg[0])],
            [sub(a, b) for a, b in zip(tau_b[1], f_leg[1])],
        )

    if boxes is not None:
        # Trunk proxy vs boxes: wrench about the BASE position (engine_tl
        # substep parity — the trunk moment arm is offs_w, not p - O).
        for off in _TRUNK_OFFS:
            off_w = mat_vec(Rb, off)
            p_tr = vadd(s.pb, off_w)
            v_tr = vadd(s.vb, vcross(s.wb, off_w))
            f_tr = box_forces(p_tr, v_tr, _TRUNK_RADIUS, boxes,
                              params.contact, params.foot_friction)
            n_tr = vcross(off_w, f_tr)
            tau_b = (
                [add(a, b) for a, b in zip(tau_b[0], n_tr)],
                [add(a, b) for a, b in zip(tau_b[1], f_tr)],
            )

    # external pushes + base bias
    ext = tuple(float(x) for x in np.asarray(params.ext_force).reshape(3))
    tau_b = (tau_b[0], [add(a, e) for a, e in zip(tau_b[1], ext)])
    f_base = base_bias(sm, Rb, s.pb, O, v_sp, a_grav)
    tau_b = (
        [sub(a, b) for a, b in zip(tau_b[0], f_base[0])],
        [sub(a, b) for a, b in zip(tau_b[1], f_base[1])],
    )

    # Schur solve against frozen factors
    rhs = list(tau_b[0]) + list(tau_b[1])
    for leg in range(4):
        for i in range(3):
            Mi = frozen.FtMinv[leg][i][0] + frozen.FtMinv[leg][i][1]
            for k in range(6):
                rhs[k] = sub(rhs[k], mul(Mi[k], tau_j[leg][i]))
    a6 = _chol6_solve(frozen.chol, rhs)
    alpha = (a6[0], a6[1], a6[2])
    a_o = (a6[3], a6[4], a6[5])

    qdd = [[None] * 3 for _ in range(4)]
    for leg in range(4):
        resid = [
            sub(tau_j[leg][j],
                add(vdot(frozen.F[leg][j][0], alpha),
                    vdot(frozen.F[leg][j][1], a_o)))
            for j in range(3)
        ]
        Mli = frozen.Mlinv[leg]
        for i in range(3):
            qdd[leg][i] = add(add(mul(Mli[i][0], resid[0]),
                                  mul(Mli[i][1], resid[1])),
                              mul(Mli[i][2], resid[2]))

    # integrate (semi-implicit Euler; acceleration point transfer from O)
    a_lin = vadd(vadd(a_o, vcross(alpha, r)), vcross(s.wb, s.vb))
    dt = params.dt
    new_v = vadd(s.vb, vscale(dt, a_lin))
    new_w = vadd(s.wb, vscale(dt, alpha))
    new_qd = tuple(
        tuple(fma(dt, qdd[l][j], s.jqd[l][j]) for j in range(3))
        for l in range(4)
    )
    return State(
        pb=vadd(s.pb, vscale(dt, new_v)),
        q=_quat_integrate(s.q, new_w, dt),
        vb=new_v,
        wb=new_w,
        jq=tuple(
            tuple(fma(dt, new_qd[l][j], s.jq[l][j]) for j in range(3))
            for l in range(4)
        ),
        jqd=new_qd,
    )


def control_step(sm: ScalarModel, params, s: State, target,
                 boxes=None) -> State:
    """One 50 Hz control step: engine_tl.control_step parity (incl.
    mass_freeze refactor cadence). boxes: see substep."""
    freeze = max(int(params.mass_freeze), 1)
    frozen = None
    for i in range(params.substeps):
        if i % freeze == 0:
            frozen = freeze_mass(sm, s)
        s = substep(sm, params, s, target, frozen, boxes=boxes)
    return s
