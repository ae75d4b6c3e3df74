"""Hard-contact mode: velocity-level projected Gauss-Seidel impulses, in JAX.

The compliant penalty model in physics/contact.py is the fast MPPI sampling
path, but it diverges from Bullet's hard sequential-impulse contact over long
horizons (walk ~0.33 rad, run ~1.0 rad max error over H=50 in round 2). This
module is the fidelity mode: the exact solver discipline of Bullet's
btSequentialImpulseConstraintSolver (reference legged_robot.py:260-264 —
10 solver iterations, 1 substep, g=9.80665), implemented as a fixed-structure
batched JAX program so it jits, vmaps and shards like the rest of the engine:

  * unconstrained velocity step via the leg-structured CRBA/RNEA in
    physics/dynamics.py (PD torque per reference legged_robot.py:119-148 plus
    URDF joint damping; Coulomb joint friction and joint limits are impulse
    rows, matching how Bullet treats URDF <dynamics> tags),
  * a STATIC 60-row constraint system — 8 contact spheres (4 feet, 4 wheels)
    x (normal + 2 tangent) + per-joint (friction, lower-limit, upper-limit)
    rows — where inactive rows are clamped to zero impulse, which makes the
    Gauss-Seidel sweep bit-equivalent to iterating only the active rows in
    the same order (tools/bullet_oracle.py builds the compacted row list),
  * Baumgarte stabilization erp=0.2, box friction clamped to mu*lambda_n,
    impulse warm starting carried across substeps in the solver state.

Cross-validated to float precision against tools/bullet_oracle.py (an
independent dense-mass-matrix implementation) in tests/test_impulse_contact.py;
measured against the committed hard-contact golden traces it closes the
BASELINE.md north-star criterion (<1e-2 rad over H=50) that the compliant
mode cannot meet.

Scenes: the flat-ground system (60 rows) is the PMC fidelity setting; passing
a scene.boxes.BoxScene adds one deepest-box contact row-triple per sphere —
feet, wheels, AND the dense 5x3 trunk proxy grid — covering the EPMC/SEPMC box
worlds (hurdle/hole-bar/cube faces, corridor walls; reference
bullet_static_entities.py:310-500 geometry, resolved by the same Bullet hard
solver per legged_robot.py:260-264). tools/bullet_oracle.py builds the
identical rows in the identical order.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.math import quat
from lifelike_tpu.math.spatial import skew
from lifelike_tpu.physics import dynamics
from lifelike_tpu.physics.dynamics import RobotState

NV = 18  # 3 ang + 3 lin + 12 joints (generalized velocity [w, v_origin, qd])
N_SPHERES = 8  # 4 feet (link 2) + 4 wheels (link 1)
# trunk proxy spheres, box contact only: the hard plant uses the DENSE 5x3
# grid (engine._TRUNK_OFFSETS_HARD) — Bullet collides the full trunk box and
# the sparse 3x2 proxy's inter-sphere valleys caught hole-bar edges
N_TRUNK = 15
N_BOX_SPHERES = N_SPHERES + N_TRUNK  # feet + wheels + trunk vs boxes
N_CONTACT_ROWS = 3 * N_SPHERES  # normal, tangent-x, tangent-y per sphere
N_JOINT_ROWS = 3 * 12  # friction, lower-limit, upper-limit per joint
N_ROWS = N_CONTACT_ROWS + N_JOINT_ROWS  # 60 (flat-ground system)
# box-scene system: plane rows, then one deepest-box contact per sphere
# (Bullet's sphere-box manifold is a single point), then joint rows
N_ROWS_BOX = N_CONTACT_ROWS + 3 * N_BOX_SPHERES + N_JOINT_ROWS  # 129


def _mu_idx(with_boxes: bool) -> np.ndarray:
    """Static friction-coupling map: row -> index of its normal row (-1)."""
    n_sph = N_SPHERES + (N_BOX_SPHERES if with_boxes else 0)
    n = 3 * n_sph + N_JOINT_ROWS
    idx = np.full(n, -1, np.int32)
    for s in range(n_sph):
        idx[3 * s + 1] = 3 * s
        idx[3 * s + 2] = 3 * s
    return idx


# Row index of the normal row each friction/tangent row couples to (-1: none).
_MU_IDX = _mu_idx(False)
_MU_IDX_BOX = _mu_idx(True)


class ImpulseParams(NamedTuple):
    """Hard-contact stepping configuration (reference legged_robot.py:240-264
    values; broadcastable leaves for per-episode randomization)."""

    kp: jnp.ndarray = 50.0
    kd: jnp.ndarray = 0.5
    max_tau: jnp.ndarray = 18.0
    mu: jnp.ndarray = 0.5  # contact friction (reference foot friction 0.5)
    dt: float = 1.0 / 500.0
    substeps: int = 10
    iterations: int = 10  # Bullet numSolverIterations
    erp: float = 0.2
    slop: float = 0.0
    ext_force: jnp.ndarray = np.zeros(3, np.float32)  # PushRandomizer parity
    # VMEM-resident Pallas sweep (ops/pgs_pallas.py) instead of the XLA
    # row-update chain; requires a single batch axis divisible by 128 and a
    # scalar mu (falls back to XLA otherwise). Same math, same row order.
    use_pallas_pgs: bool = False


def init_lam(batch_shape=(), dtype=jnp.float32, scene=None):
    """Zero warm-start impulses; carry through control_step calls.
    Box scenes carry the larger N_ROWS_BOX system."""
    n = N_ROWS if scene is None else N_ROWS_BOX
    return jnp.zeros(batch_shape + (n,), dtype)


def _tangent_basis(n):
    """Deterministic orthonormal tangents for a unit normal (..., 3).

    t1 = n x z unless n is (anti)parallel to z, then n x x — the SAME
    branch/threshold as tools/bullet_oracle.py (row parity requires it)."""
    ez = jnp.zeros_like(n).at[..., 2].set(1.0)
    ex = jnp.zeros_like(n).at[..., 0].set(1.0)
    t1a = jnp.cross(n, ez)
    t1b = jnp.cross(n, ex)
    use_b = jnp.sum(t1a * t1a, axis=-1, keepdims=True) < 1e-6
    t1 = jnp.where(use_b, t1b, t1a)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True).clip(1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _box_sdf(p, center, half):
    """Signed distance + outward unit normal of a point vs one AABB.

    p (..., 3) vs center/half (..., K, 3) -> (dist (..., K), n (..., K, 3)).
    Same face convention as physics.contact.sphere_boxes_force."""
    r = p[..., None, :] - center
    q = jnp.abs(r) - half
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.sqrt(jnp.sum(outside * outside, axis=-1) + 1e-12)
    d_in = jnp.max(q, axis=-1)
    inside = d_in < 0.0
    dist = jnp.where(inside, d_in, d_out)
    sign = jnp.where(r >= 0.0, 1.0, -1.0)
    face = (q >= d_in[..., None]).astype(p.dtype)
    face = face / jnp.sum(face, axis=-1, keepdims=True).clip(1.0)
    n = jnp.where(inside[..., None], sign * face, sign * outside / d_out[..., None])
    return dist, n


# M^{-1} application now lives in dynamics.minv_apply_rows, sharing one
# factorization per substep with the unconstrained forward-dynamics solve.


def _point_rows(kin, base_pos, p, leg_link_mask):
    """Point-velocity Jacobian rows (..., 3, 18) of world points fixed to leg
    links: v_p = v_origin + w x (p - base) + sum_{i<=link} qd_i a_i x (p - p_i).

    p: (..., 4, 3) one point per leg; leg_link_mask: (3,) 1.0 for joints at or
    above the attachment link. Returns (..., 4, 3rows, 18) with rows = the
    x/y/z components of the point velocity.
    """
    dtype = p.dtype
    eye = jnp.eye(3, dtype=dtype)
    J_ang = -skew(p - base_pos[..., None, :])  # (..., 4, 3, 3)
    J_lin = jnp.broadcast_to(eye, J_ang.shape)
    # joint columns: (..., 4legs, 3joints, 3comp)
    Jq = jnp.cross(kin.axis_w, p[..., :, None, :] - kin.p_joint)
    Jq = Jq * leg_link_mask[:, None]
    # assemble (..., 4, 3comp, 18): per leg only its own 3 joint columns are
    # nonzero; scatter into the 12-joint block with a static one-hot.
    leg_sel = jnp.asarray(np.eye(4), dtype)  # (4 legs, 4 slots)
    Jq_full = jnp.einsum("...ljc,lm->...lcmj", Jq, leg_sel)  # (...,4,3,4,3)
    Jq_full = Jq_full.reshape(Jq_full.shape[:-2] + (12,))
    return jnp.concatenate([J_ang, J_lin, Jq_full], axis=-1)


def _box_rows(model, p: ImpulseParams, state: RobotState, kin, Jf, Jw, scene):
    """One deepest-box contact row-triple per sphere (feet, wheels, trunk).

    Bullet's sphere-box collision emits a single manifold point; the deepest
    active box per sphere reproduces that. Returns (J (..., 42, 18), b, lo,
    hi (..., 69)) in the fixed order feet 0-3, wheels 0-3, trunk 0-14 — the
    SAME order tools/bullet_oracle.py appends its box rows.
    """
    from lifelike_tpu.physics.engine import _TRUNK_OFFSETS_HARD, _TRUNK_RADIUS

    dtype = state.base_pos.dtype
    dt = p.dt
    inf = jnp.asarray(jnp.inf, dtype)
    batch = state.base_pos.shape[:-1]

    # trunk spheres: world positions + base-attached point Jacobians
    R = quat.to_matrix(state.base_orn)  # (..., 3, 3)
    offs = jnp.asarray(_TRUNK_OFFSETS_HARD, dtype)  # (15, 3)
    offs_w = jnp.einsum("...ij,pj->...pi", R, offs)  # (..., 6, 3)
    p_tr = state.base_pos[..., None, :] + offs_w
    J_ang = -skew(offs_w)  # p - base == offs_w
    J_lin = jnp.broadcast_to(jnp.eye(3, dtype=dtype), J_ang.shape)
    J_tr = jnp.concatenate(
        [J_ang, J_lin, jnp.zeros(batch + (N_TRUNK, 3, 12), dtype)], axis=-1
    )  # (..., 6, 3, 18)

    pts = jnp.concatenate([kin.p_foot, kin.p_wheel, p_tr], axis=-2)
    Jp = jnp.concatenate([Jf, Jw, J_tr], axis=-3)  # (..., 14, 3, 18)
    radii = jnp.concatenate([
        jnp.full((4,), model.foot_radius, dtype),
        jnp.full((4,), model.wheel_radius, dtype),
        jnp.full((N_TRUNK,), _TRUNK_RADIUS, dtype),
    ])

    dist, n = _box_sdf(pts, scene.center, scene.half)  # (...,14,K), (...,14,K,3)
    dist = jnp.where(scene.active, dist, inf)
    pen = radii[:, None] - dist  # (..., 14, K)
    k_best = jnp.argmax(pen, axis=-1)  # (..., 14)
    pen_b = jnp.take_along_axis(pen, k_best[..., None], axis=-1)[..., 0]
    n_b = jnp.take_along_axis(n, k_best[..., None, None], axis=-2)[..., 0, :]
    active = pen_b > 0.0

    t1, t2 = _tangent_basis(n_b)
    J_n = jnp.einsum("...sc,...scv->...sv", n_b, Jp)
    J_t1 = jnp.einsum("...sc,...scv->...sv", t1, Jp)
    J_t2 = jnp.einsum("...sc,...scv->...sv", t2, Jp)
    Jrows = jnp.stack([J_n, J_t1, J_t2], axis=-2)  # (..., 14, 3, 18)

    b_n = p.erp * jnp.maximum(pen_b - p.slop, 0.0) / dt * active
    zero = jnp.zeros_like(b_n)
    b = jnp.stack([b_n, zero, zero], axis=-1)
    lo = jnp.zeros_like(b)
    hi = jnp.stack([jnp.where(active, inf, 0.0), zero, zero], axis=-1)
    nb = 3 * N_BOX_SPHERES
    return (
        Jrows.reshape(batch + (nb, NV)),
        b.reshape(batch + (nb,)),
        lo.reshape(batch + (nb,)),
        hi.reshape(batch + (nb,)),
    )


def _build_rows(model, p: ImpulseParams, state: RobotState, kin, scene=None):
    """Assemble the static row system: J (..., N, 18), b, lo, hi (..., N).

    Row order matches tools/bullet_oracle.py's compacted active list exactly
    (feet then wheels, each n/t1/t2; then — box scenes — one deepest-box
    contact per foot/wheel/trunk sphere; then per joint friction, lower,
    upper), with inactive rows clamped lo=hi=0 so their Gauss-Seidel updates
    are no-ops — bit-equivalent to skipping them.
    """
    dtype = state.base_pos.dtype
    dt = p.dt
    inf = jnp.asarray(jnp.inf, dtype)

    mask_foot = jnp.asarray([1.0, 1.0, 1.0], dtype)  # link 2: all 3 joints
    mask_wheel = jnp.asarray([1.0, 1.0, 0.0], dtype)  # link 1: joints 0,1
    Jf = _point_rows(kin, state.base_pos, kin.p_foot, mask_foot)  # (...,4,3,18)
    Jw = _point_rows(kin, state.base_pos, kin.p_wheel, mask_wheel)

    def sphere_rows(Jp, pts, radius):
        pen = radius - pts[..., 2]  # (..., 4)
        active = pen > 0.0
        b_n = p.erp * jnp.maximum(pen - p.slop, 0.0) / dt * active
        # rows per sphere: [z (normal), x, y]
        Jrows = jnp.stack(
            [Jp[..., :, 2, :], Jp[..., :, 0, :], Jp[..., :, 1, :]], axis=-2
        )  # (..., 4, 3, 18)
        zero = jnp.zeros_like(b_n)
        b = jnp.stack([b_n, zero, zero], axis=-1)  # (..., 4, 3)
        lo = jnp.zeros_like(b)  # tangent bounds come from mu*lam_n in the sweep
        hi = jnp.stack([jnp.where(active, inf, 0.0), zero, zero], axis=-1)
        return Jrows, b, lo, hi

    Jf_r, bf, lof, hif = sphere_rows(Jf, kin.p_foot, model.foot_radius)
    Jw_r, bw, lo_w, hi_w = sphere_rows(Jw, kin.p_wheel, model.wheel_radius)

    # joint rows: friction (bilateral box +-fric*dt), lower limit, upper limit
    q = state.joint_pos
    fric = jnp.asarray(model.joint_friction, dtype).reshape(-1)
    lower = jnp.asarray(model.joint_lower_flat, dtype)
    upper = jnp.asarray(model.joint_upper_flat, dtype)
    eyeNV = jnp.eye(NV, dtype=dtype)
    e_j = eyeNV[6:]  # (12, 18)
    batch = q.shape[:-1]
    e_j = jnp.broadcast_to(e_j, batch + (12, NV))

    lim = fric * dt
    zero12 = jnp.zeros(batch + (12,), dtype)
    J_fric, b_fric = e_j, zero12
    lo_fric = jnp.broadcast_to(-lim, batch + (12,))
    hi_fric = jnp.broadcast_to(lim, batch + (12,))

    low_act = q < lower
    J_low, b_low = e_j, p.erp * (lower - q) / dt * low_act
    lo_low = zero12
    hi_low = jnp.where(low_act, inf, 0.0)

    up_act = q > upper
    J_up, b_up = -e_j, p.erp * (q - upper) / dt * up_act
    lo_up = zero12
    hi_up = jnp.where(up_act, inf, 0.0)

    J_joint = jnp.stack([J_fric, J_low, J_up], axis=-2)  # (..., 12, 3, 18)
    b_joint = jnp.stack([b_fric, b_low, b_up], axis=-1)  # (..., 12, 3)
    lo_joint = jnp.stack([lo_fric, lo_low, lo_up], axis=-1)
    hi_joint = jnp.stack([hi_fric, hi_low, hi_up], axis=-1)

    def flat(x, tail):
        return x.reshape(x.shape[: len(batch)] + tail)

    if scene is not None:
        Jb_r, bb, lob, hib = _box_rows(model, p, state, kin, Jf, Jw, scene)
        box_J = [Jb_r]
        box_b, box_lo, box_hi = [bb], [lob], [hib]
    else:
        box_J = box_b = box_lo = box_hi = []

    J = jnp.concatenate(
        [flat(Jf_r, (12, NV)), flat(Jw_r, (12, NV))]
        + box_J + [flat(J_joint, (36, NV))],
        axis=-2,
    )
    b = jnp.concatenate(
        [flat(bf, (12,)), flat(bw, (12,))] + box_b + [flat(b_joint, (36,))],
        axis=-1,
    )
    lo = jnp.concatenate(
        [flat(lof, (12,)), flat(lo_w, (12,))] + box_lo
        + [flat(lo_joint, (36,))],
        axis=-1,
    )
    hi = jnp.concatenate(
        [flat(hif, (12,)), flat(hi_w, (12,))] + box_hi
        + [flat(hi_joint, (36,))],
        axis=-1,
    )
    return J, b, lo, hi


def _pgs(p: ImpulseParams, v, lam0, J, MinvJT, d, b, lo, hi,
         mu_idx=_MU_IDX):
    """Projected Gauss-Seidel, rows unrolled (static order = oracle order).

    v: (..., 18) free velocity AFTER warm-start impulses were applied.
    Returns (v, lam).
    """
    mu = jnp.asarray(p.mu, v.dtype)
    n_rows = J.shape[-2]

    def sweep(carry, _):
        v, lam = carry
        for i in range(n_rows):
            dv = b[..., i] - jnp.einsum("...k,...k->...", J[..., i, :], v)
            dl = dv / jnp.maximum(d[..., i], 1e-12)
            if mu_idx[i] >= 0:
                bound = mu * jnp.maximum(lam[..., mu_idx[i]], 0.0)
                lo_i, hi_i = -bound, bound
            else:
                lo_i, hi_i = lo[..., i], hi[..., i]
            new = jnp.clip(lam[..., i] + dl, lo_i, hi_i)
            delta = new - lam[..., i]
            lam = lam.at[..., i].set(new)
            v = v + MinvJT[..., i, :] * delta[..., None]
        return (v, lam), None

    (v, lam), _ = jax.lax.scan(sweep, (v, lam0), None, length=p.iterations)
    return v, lam


def init_comp(batch_shape=(), dtype=jnp.float32):
    """Zero Kahan compensation carry for the compensated integrator:
    (base_pos comp (..., 3), joint_pos comp (..., 12))."""
    return (jnp.zeros(batch_shape + (3,), dtype),
            jnp.zeros(batch_shape + (12,), dtype))


def _kahan_add(x, inc, comp):
    """Compensated x + inc with carry `comp` (Kahan-Neumaier step)."""
    y = inc - comp
    t = x + y
    comp_new = (t - x) - y
    return t, comp_new


def substep(model, p: ImpulseParams, state: RobotState, lam, target_q,
            scene=None, comp=None):
    """One 500 Hz hard-contact substep. lam: (..., N_ROWS[_BOX]) warm-start
    impulses from the previous substep. scene: optional scene.boxes.BoxScene
    — adds the deepest-box contact rows (hurdle/hole-bar/cube faces,
    corridor walls) to the PGS system.

    comp: optional init_comp carry — Kahan-compensated position integration
    (the f32 north-star criterion: 500 substeps of pos += v*dt accumulate
    the rounding that marginal contact then amplifies; compensation removes
    the accumulation term at f32 execution dtype). Returns (state, lam) or
    (state, lam, comp')."""
    dtype = state.base_pos.dtype
    dt = p.dt
    kin = dynamics.forward_kinematics(model, state)
    origin = state.base_pos

    # PD + joint damping only; Coulomb friction / limits are impulse rows
    # (reference legged_robot.py:126-141; Bullet treats URDF joint friction as
    # a zero-velocity motor with force limit).
    tgt = jnp.clip(target_q, -3.0, 3.0)
    tau_j = p.kp * (tgt - state.joint_pos) + p.kd * (0.0 - state.joint_vel)
    tau_j = jnp.clip(tau_j, -p.max_tau, p.max_tau)
    tau_j = tau_j - jnp.asarray(model.joint_damping, dtype).reshape(-1) * state.joint_vel
    tau_j = tau_j.reshape(state.joint_pos.shape[:-1] + (4, 3))

    ext = jnp.broadcast_to(jnp.asarray(p.ext_force, dtype), state.base_pos.shape)
    tau_b = jnp.concatenate([jnp.zeros_like(ext), ext], axis=-1)

    bias_b, bias_j = dynamics.bias_forces(model, kin, state, origin)
    Mb, F, Ml = dynamics.mass_matrix_blocks(model, kin, origin, state.base_pos)
    fac = dynamics.factor_dynamics(Mb, F, Ml)
    a_base, qdd = dynamics.forward_dynamics_apply(
        fac, tau_b - bias_b, tau_j - bias_j
    )

    # spatial -> point acceleration of the base origin, then explicit step of
    # the generalized velocity [w, v_origin, qd]
    w = state.base_ang_vel
    a_lin = a_base[..., 3:] + jnp.cross(w, state.base_lin_vel)
    v_free = jnp.concatenate(
        [
            w + a_base[..., :3] * dt,
            state.base_lin_vel + a_lin * dt,
            state.joint_vel + qdd.reshape(state.joint_vel.shape) * dt,
        ],
        axis=-1,
    )

    mu_idx = _MU_IDX if scene is None else _MU_IDX_BOX
    J, b, lo, hi = _build_rows(model, p, state, kin, scene=scene)
    MinvJT = dynamics.minv_apply_rows(fac, J)  # (..., n_rows, 18)
    d = jnp.einsum("...ni,...ni->...n", J, MinvJT)

    # warm start: rows inactive now contribute nothing and re-clamp to 0
    # (hi==lo==0 for them), mirroring the oracle's per-substep key rebuild.
    lam0 = jnp.where((hi > 0.0) | (lo < 0.0) | (mu_idx >= 0), lam, 0.0)
    # tangent warm impulses only when their sphere is active this substep
    normal_hi = hi[..., np.maximum(mu_idx, 0)]
    lam0 = jnp.where((mu_idx >= 0) & (normal_hi <= 0.0), 0.0, lam0)
    v = v_free + jnp.einsum("...nk,...n->...k", MinvJT, lam0)

    pallas_ok = (
        p.use_pallas_pgs
        and scene is None
        and v.ndim == 2
        and v.shape[0] % 128 == 0
        and jnp.ndim(p.mu) == 0
    )
    if pallas_ok:
        from lifelike_tpu.ops import pgs_pallas

        v, lam = pgs_pallas.pgs_sweep(
            v, lam0, J, MinvJT, d, b, lo, hi, p.mu, iterations=p.iterations,
        )
    else:
        v, lam = _pgs(p, v, lam0, J, MinvJT, d, b, lo, hi, mu_idx=mu_idx)

    w_new = v[..., 0:3]
    lin_new = v[..., 3:6]
    qd_new = v[..., 6:]
    if comp is None:
        new_pos = state.base_pos + lin_new * dt
        new_q = state.joint_pos + qd_new * dt
    else:
        cp, cq = comp
        new_pos, cp = _kahan_add(state.base_pos, lin_new * dt, cp)
        new_q, cq = _kahan_add(state.joint_pos, qd_new * dt, cq)
        comp = (cp, cq)
    out = RobotState(
        base_pos=new_pos,
        base_orn=quat.integrate(state.base_orn, w_new, dt),
        base_lin_vel=lin_new,
        base_ang_vel=w_new,
        joint_pos=new_q,
        joint_vel=qd_new,
    )
    if comp is None:
        return out, lam
    return out, lam, comp


def control_step(model, p: ImpulseParams, state: RobotState, lam, target_q,
                 scene=None, comp=None):
    """One 50 Hz control step: `substeps` hard-contact substeps with a held
    target (reference primitive_level_env.py:202-210). Returns (state, lam)
    — or (state, lam, comp') when a compensation carry is passed."""

    if comp is None:
        def body(carry, _):
            s, l = carry
            s, l = substep(model, p, s, l, target_q, scene=scene)
            return (s, l), None

        (state, lam), _ = jax.lax.scan(
            body, (state, lam), None, length=p.substeps
        )
        return state, lam

    def body(carry, _):
        s, l, cm = carry
        s, l, cm = substep(model, p, s, l, target_q, scene=scene, comp=cm)
        return (s, l, cm), None

    (state, lam, comp), _ = jax.lax.scan(
        body, (state, lam, comp), None, length=p.substeps
    )
    return state, lam, comp


def make_control_step(model, p: ImpulseParams, scene=None, compensated=False):
    """Jittable f((state, lam[, comp]), target_q) -> same-shape carry."""

    def step(carry, target_q):
        return control_step(model, p, carry[0], carry[1], target_q,
                            scene=scene)

    def step_comp(carry, target_q):
        return control_step(model, p, carry[0], carry[1], target_q,
                            scene=scene, comp=carry[2])

    return step_comp if compensated else step
