"""Independent rigid-contact oracle for fidelity testing (numpy, no JAX).

PyBullet is not installable in this image (no network egress), so the
north-star fidelity criterion — control-sequence error vs a PyBullet-stepped
reference (BASELINE.md; reference legged_robot.py:260-264: 10 solver
iterations, 1 substep, g=9.80665) — is evidenced against THIS simulator: an
independent implementation of the same algorithm family Bullet's
btMultiBodyDynamicsWorld uses,

  * exact articulated-tree dynamics (dense CRBA mass matrix via body
    Jacobians + recursive Newton-Euler bias — same equations of motion, a
    completely separate formulation/implementation from
    lifelike_tpu.physics.dynamics' leg-structured Schur solve), and
  * HARD contact via velocity-level sequential impulses (projected
    Gauss-Seidel over normal/friction rows, Baumgarte stabilization
    erp=0.2, friction cone clamped to the normal impulse, warm starting,
    10 iterations) — Bullet's solver discipline, versus the product
    engine's compliant penalty model.

tools/make_oracle_traces.py uses real PyBullet when importable and falls
back to this oracle; the committed traces record which backend produced
them. tests/test_fidelity_oracle.py measures the product engine against the
traces.

State/convention notes (matching the product engine so traces compare
directly): base velocity is the world-frame velocity of the base origin;
angular velocity is world frame; quaternions xyzw; joints leg-major
(FR, FL, HR, HL) x (hip_x, hip_y, knee). PD law per
reference legged_robot.py:119-148. Joint damping (0.1) as explicit torque;
joint Coulomb friction (0.5 N m) as a velocity-level impulse row clamped to
+-f*dt (Bullet treats URDF joint friction as a zero-velocity motor with
force limit). Joint limits as unilateral velocity rows.
"""
from dataclasses import dataclass, field

import numpy as np

NV = 18  # 3 ang + 3 lin + 12 joints
GRAVITY = np.array([0.0, 0.0, -9.80665])


def _rot_quat(q):
    """xyzw quaternion -> rotation matrix."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _rot_axis(axis, angle):
    a = np.asarray(axis, float)
    a = a / np.linalg.norm(a)
    c, s = np.cos(angle), np.sin(angle)
    K = _skew(a)
    return c * np.eye(3) + s * K + (1 - c) * np.outer(a, a)


def _skew(v):
    return np.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


def _quat_integrate(q, omega, dt):
    """World-frame angular velocity, xyzw quaternion."""
    th = np.linalg.norm(omega) * dt
    if th < 1e-12:
        dq = np.array([0.0, 0.0, 0.0, 1.0])
    else:
        ax = omega / np.linalg.norm(omega)
        dq = np.concatenate([ax * np.sin(th / 2.0), [np.cos(th / 2.0)]])
    x1, y1, z1, w1 = dq
    x2, y2, z2, w2 = q
    out = np.array([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])
    return out / np.linalg.norm(out)


@dataclass
class OracleState:
    base_pos: np.ndarray
    base_orn: np.ndarray  # xyzw
    base_lin_vel: np.ndarray  # world, velocity of base origin
    base_ang_vel: np.ndarray  # world
    joint_pos: np.ndarray  # (12,) leg-major
    joint_vel: np.ndarray


@dataclass
class Kin:
    """World-frame kinematics of the 13-body tree."""

    R_base: np.ndarray
    p_joint: np.ndarray  # (4, 3, 3)
    R_link: np.ndarray  # (4, 3, 3, 3)
    axis_w: np.ndarray  # (4, 3, 3)
    com: np.ndarray  # (13, 3)  base + 12 links, base first
    p_foot: np.ndarray  # (4, 3)
    p_wheel: np.ndarray  # (4, 3)


class BulletOracle:
    """Maximal-clarity numpy simulator for the MAX quadruped on flat ground.

    Parameters mirror reference legged_robot.py / primitive_level_env.py:
    dt 1/500, 10 PD substeps per control step, kp/kd/max_tau from configs,
    10 PGS iterations, erp 0.2.
    """

    def __init__(self, model, kp=50.0, kd=0.5, max_tau=18.0, mu=0.5,
                 dt=1.0 / 500.0, substeps=10, iterations=10, erp=0.2,
                 slop=0.0, warm_start=True, scene=None):
        self.m = model
        self.kp, self.kd, self.max_tau, self.mu = kp, kd, max_tau, mu
        self.dt, self.substeps = dt, substeps
        self.iterations, self.erp, self.slop = iterations, erp, slop
        self.warm_start = warm_start
        self._warm = {}
        # optional box scene: (centers (K, 3), half-extents (K, 3)) of ACTIVE
        # axis-aligned boxes (hurdles / hole bars / cubes / walls)
        if scene is not None:
            self.boxes = (np.asarray(scene[0], float),
                          np.asarray(scene[1], float))
        else:
            self.boxes = None

    @staticmethod
    def _box_sdf(p, center, half):
        """Signed distance + outward unit normal of a point vs one AABB
        (same face convention as the JAX impulse module)."""
        r = p - center
        q = np.abs(r) - half
        outside = np.maximum(q, 0.0)
        d_out = np.sqrt(np.sum(outside * outside) + 1e-12)
        d_in = np.max(q)
        sign = np.where(r >= 0.0, 1.0, -1.0)
        if d_in < 0.0:
            face = (q >= d_in).astype(float)
            n = sign * face / max(face.sum(), 1.0)
            return d_in, n
        return d_out, sign * outside / d_out

    @staticmethod
    def _tangent_basis(n):
        """Deterministic tangents: t1 = n x z unless near-parallel, then
        n x x (same branch/threshold as physics.impulse._tangent_basis)."""
        t1 = np.cross(n, np.array([0.0, 0.0, 1.0]))
        if float(t1 @ t1) < 1e-6:
            t1 = np.cross(n, np.array([1.0, 0.0, 0.0]))
        t1 = t1 / max(np.linalg.norm(t1), 1e-12)
        return t1, np.cross(n, t1)

    # ------------------------------------------------------------ kinematics

    def kinematics(self, s: OracleState) -> Kin:
        m = self.m
        Rb = _rot_quat(s.base_orn)
        p_joint = np.zeros((4, 3, 3))
        R_link = np.zeros((4, 3, 3, 3))
        axis_w = np.zeros((4, 3, 3))
        com = np.zeros((13, 3))
        com[0] = s.base_pos + Rb @ m.base_com
        q = s.joint_pos.reshape(4, 3)
        p_foot = np.zeros((4, 3))
        p_wheel = np.zeros((4, 3))
        for l in range(4):
            Rp, pp = Rb, s.base_pos
            for j in range(3):
                pj = pp + Rp @ m.joint_offset[l, j]
                Rj = Rp @ _rot_axis(m.joint_axis[l, j], q[l, j])
                p_joint[l, j] = pj
                R_link[l, j] = Rj
                axis_w[l, j] = Rp @ (
                    np.asarray(m.joint_axis[l, j], float)
                    / np.linalg.norm(m.joint_axis[l, j])
                )
                com[1 + l * 3 + j] = pj + Rj @ m.link_com[l, j]
                Rp, pp = Rj, pj
            p_foot[l] = p_joint[l, 2] + R_link[l, 2] @ m.foot_offset[l]
            p_wheel[l] = p_joint[l, 1] + R_link[l, 1] @ m.wheel_offset[l]
        return Kin(Rb, p_joint, R_link, axis_w, com, p_foot, p_wheel)

    def _body_jacobians(self, s: OracleState, kin: Kin):
        """Angular/linear COM Jacobians (13, 3, NV) w.r.t.
        v = [w_base, v_base_origin, qdot]."""
        Jw = np.zeros((13, 3, NV))
        Jv = np.zeros((13, 3, NV))
        for b in range(13):
            Jw[b, :, 0:3] = np.eye(3)
            Jv[b, :, 3:6] = np.eye(3)
            Jv[b, :, 0:3] = -_skew(kin.com[b] - s.base_pos)
        for l in range(4):
            for j in range(3):
                b = 1 + l * 3 + j
                for i in range(j + 1):
                    dof = 6 + l * 3 + i
                    a = kin.axis_w[l, i]
                    Jw[b, :, dof] = a
                    Jv[b, :, dof] = np.cross(
                        a, kin.com[b] - kin.p_joint[l, i]
                    )
        return Jw, Jv

    def _point_jacobian(self, s: OracleState, kin: Kin, point, leg, link):
        """Linear velocity Jacobian (3, NV) of a world point fixed to a leg
        link."""
        J = np.zeros((3, NV))
        J[:, 3:6] = np.eye(3)
        J[:, 0:3] = -_skew(point - s.base_pos)
        for i in range(link + 1):
            dof = 6 + leg * 3 + i
            a = kin.axis_w[leg, i]
            J[:, dof] = np.cross(a, point - kin.p_joint[leg, i])
        return J

    def _mass_matrix(self, kin: Kin, Jw, Jv):
        m = self.m
        masses = np.concatenate([[m.base_mass], m.link_mass.reshape(-1)])
        M = np.zeros((NV, NV))
        Rb = kin.R_base
        I_w = [Rb @ m.base_inertia @ Rb.T]
        for l in range(4):
            for j in range(3):
                R = kin.R_link[l, j]
                I_w.append(R @ m.link_inertia[l, j] @ R.T)
        for b in range(13):
            M += masses[b] * Jv[b].T @ Jv[b] + Jw[b].T @ I_w[b] @ Jw[b]
        return M, masses, I_w

    def _bias(self, s: OracleState, kin: Kin, Jw, Jv, masses, I_w):
        """Generalized bias forces (Coriolis/centrifugal + gravity): recursive
        zero-qdd Newton-Euler, projected through the body Jacobians."""
        m = self.m
        w_b = s.base_ang_vel
        # body angular velocities and zero-qdd accelerations
        omegas = np.zeros((13, 3))
        omega_dots = np.zeros((13, 3))
        a_com = np.zeros((13, 3))
        omegas[0] = w_b
        # base origin acceleration is the unknown solved for; bias pass is
        # about velocity products only: a(origin)=0, wdot(base)=0.
        a_com[0] = np.cross(w_b, np.cross(w_b, kin.com[0] - s.base_pos))
        qd = s.joint_vel.reshape(4, 3)
        for l in range(4):
            w_p, wd_p = w_b, np.zeros(3)
            p_p = s.base_pos
            a_p = np.zeros(3)  # acceleration of parent ref point
            for j in range(3):
                r = kin.p_joint[l, j] - p_p
                a_j = a_p + np.cross(wd_p, r) + np.cross(w_p, np.cross(w_p, r))
                a_w = kin.axis_w[l, j]
                w_c = w_p + a_w * qd[l, j]
                wd_c = wd_p + np.cross(w_p, a_w) * qd[l, j]
                b = 1 + l * 3 + j
                rc = kin.com[b] - kin.p_joint[l, j]
                omegas[b] = w_c
                omega_dots[b] = wd_c
                a_com[b] = (
                    a_j + np.cross(wd_c, rc) + np.cross(w_c, np.cross(w_c, rc))
                )
                w_p, wd_p, p_p, a_p = w_c, wd_c, kin.p_joint[l, j], a_j
        tau = np.zeros(NV)
        for b in range(13):
            f = masses[b] * (a_com[b] - GRAVITY)
            n = I_w[b] @ omega_dots[b] + np.cross(
                omegas[b], I_w[b] @ omegas[b]
            )
            tau += Jv[b].T @ f + Jw[b].T @ n
        return tau

    # --------------------------------------------------------------- solver

    def _pgs(self, Minv, v, rows, key_ids):
        """Projected Gauss-Seidel over constraint rows.

        rows: list of dicts {J (NV,), b target velocity, lo, hi, mu_link
        (index of the normal row this friction row is coupled to, or -1)}.
        Returns corrected v. Impulse warm starting keyed by key_ids.
        """
        n = len(rows)
        if n == 0:
            return v
        J = np.stack([r["J"] for r in rows])
        MinvJT = Minv @ J.T  # (NV, n)
        d = np.einsum("ij,ji->i", J, MinvJT)
        lam = np.zeros(n)
        if self.warm_start:
            for i, kid in enumerate(key_ids):
                lam0 = self._warm.get(kid, 0.0)
                if lam0 != 0.0:
                    lam[i] = lam0
                    v = v + MinvJT[:, i] * lam0
        for _ in range(self.iterations):
            for i, r in enumerate(rows):
                hi = r["hi"]
                lo = r["lo"]
                if r["mu_link"] >= 0:  # friction cone bound from normal row
                    bound = self.mu * max(lam[r["mu_link"]], 0.0)
                    lo, hi = -bound, bound
                dv = r["b"] - J[i] @ v
                dl = dv / max(d[i], 1e-12)
                new = np.clip(lam[i] + dl, lo, hi)
                dl = new - lam[i]
                lam[i] = new
                v = v + MinvJT[:, i] * dl
        if self.warm_start:
            self._warm = {kid: lam[i] for i, kid in enumerate(key_ids)}
        return v

    def substep(self, s: OracleState, target_q) -> OracleState:
        m, dt = self.m, self.dt
        kin = self.kinematics(s)
        Jw, Jv = self._body_jacobians(s, kin)
        M, masses, I_w = self._mass_matrix(kin, Jw, Jv)
        bias = self._bias(s, kin, Jw, Jv, masses, I_w)

        # PD torques (reference legged_robot.py:126-141) + joint damping
        tgt = np.clip(np.asarray(target_q, float), -3.0, 3.0)
        tau_j = self.kp * (tgt - s.joint_pos) + self.kd * (0.0 - s.joint_vel)
        tau_j = np.clip(tau_j, -self.max_tau, self.max_tau)
        tau_j = tau_j - m.joint_damping.reshape(-1) * s.joint_vel
        tau = np.zeros(NV)
        tau[6:] = tau_j

        Minv = np.linalg.inv(M)
        v = np.concatenate([s.base_ang_vel, s.base_lin_vel, s.joint_vel])
        v_free = v + dt * (Minv @ (tau - bias))

        # contact + joint-friction + joint-limit rows
        rows, key_ids = [], []
        spheres = (
            [("f", l, 2, kin.p_foot[l], m.foot_radius) for l in range(4)]
            + [("w", l, 1, kin.p_wheel[l], m.wheel_radius) for l in range(4)]
        )
        for tag, l, link, p, radius in spheres:
            pen = radius - p[2]
            if pen <= 0.0:
                continue
            Jp = self._point_jacobian(s, kin, p, l, link)
            b_n = self.erp * max(pen - self.slop, 0.0) / dt
            rows.append({"J": Jp[2], "b": b_n, "lo": 0.0, "hi": np.inf,
                         "mu_link": -1})
            key_ids.append((tag, l, "n"))
            n_idx = len(rows) - 1
            for t, tdir in (("t1", 0), ("t2", 1)):
                rows.append({"J": Jp[tdir], "b": 0.0, "lo": 0.0, "hi": 0.0,
                             "mu_link": n_idx})
                key_ids.append((tag, l, t))
        if self.boxes is not None:
            # deepest-box contact per sphere (Bullet's sphere-box manifold is
            # a single point): feet 0-3, wheels 0-3, then the trunk proxy
            # spheres (DENSE 5x3 grid, r=0.07 — the hard plant's trunk
            # collision spec, engine._TRUNK_OFFSETS_HARD; re-typed here
            # because the oracle stays import-independent of the engine)
            # — SAME row order as physics.impulse._box_rows.
            Rb = kin.R_base
            trunk_offs = np.array(
                [[x, y, 0.0]
                 for x in (-0.12, -0.06, 0.0, 0.06, 0.12)
                 for y in (-0.05, 0.0, 0.05)]
            )
            box_spheres = (
                [("bf", l, ("leg", l, 2), kin.p_foot[l], m.foot_radius)
                 for l in range(4)]
                + [("bw", l, ("leg", l, 1), kin.p_wheel[l], m.wheel_radius)
                   for l in range(4)]
                + [("bt", i, ("base",), s.base_pos + Rb @ trunk_offs[i], 0.07)
                   for i in range(len(trunk_offs))]
            )
            centers, halves = self.boxes
            for tag, idx, attach, pt, radius in box_spheres:
                best = None
                for k in range(len(centers)):
                    dist, n = self._box_sdf(pt, centers[k], halves[k])
                    pen = radius - dist
                    if best is None or pen > best[0]:
                        best = (pen, n)
                pen, n = best
                if pen <= 0.0:
                    continue
                if attach[0] == "leg":
                    Jp = self._point_jacobian(s, kin, pt, attach[1], attach[2])
                else:
                    Jp = np.zeros((3, NV))
                    Jp[:, 3:6] = np.eye(3)
                    Jp[:, 0:3] = -_skew(pt - s.base_pos)
                t1, t2 = self._tangent_basis(n)
                b_n = self.erp * max(pen - self.slop, 0.0) / self.dt
                rows.append({"J": n @ Jp, "b": b_n, "lo": 0.0, "hi": np.inf,
                             "mu_link": -1})
                key_ids.append((tag, idx, "n"))
                n_idx = len(rows) - 1
                for tname, tvec in (("t1", t1), ("t2", t2)):
                    rows.append({"J": tvec @ Jp, "b": 0.0, "lo": 0.0,
                                 "hi": 0.0, "mu_link": n_idx})
                    key_ids.append((tag, idx, tname))

        fric = m.joint_friction.reshape(-1)
        lower = m.joint_lower.reshape(-1)
        upper = m.joint_upper.reshape(-1)
        for jdof in range(12):
            e = np.zeros(NV)
            e[6 + jdof] = 1.0
            if fric[jdof] > 0.0:
                lim = fric[jdof] * dt
                rows.append({"J": e, "b": 0.0, "lo": -lim, "hi": lim,
                             "mu_link": -1})
                key_ids.append(("jf", jdof, 0))
            qj = s.joint_pos[jdof]
            if qj < lower[jdof]:
                b_l = self.erp * (lower[jdof] - qj) / dt
                rows.append({"J": e, "b": b_l, "lo": 0.0, "hi": np.inf,
                             "mu_link": -1})
                key_ids.append(("jl", jdof, 0))
            elif qj > upper[jdof]:
                # J = -e so the row velocity is -qdot; Baumgarte pushback
                # requires qdot <= -erp*(q-upper)/dt, i.e. -qdot >= b with
                # b = erp*(q-upper)/dt > 0 while violated.
                b_u = self.erp * (qj - upper[jdof]) / dt
                rows.append({"J": -e, "b": b_u, "lo": 0.0, "hi": np.inf,
                             "mu_link": -1})
                key_ids.append(("ju", jdof, 0))

        v_new = self._pgs(Minv, v_free, rows, key_ids)

        w_new = v_new[0:3]
        return OracleState(
            base_pos=s.base_pos + v_new[3:6] * dt,
            base_orn=_quat_integrate(s.base_orn, w_new, dt),
            base_lin_vel=v_new[3:6],
            base_ang_vel=w_new,
            joint_pos=s.joint_pos + v_new[6:] * dt,
            joint_vel=v_new[6:],
        )

    def control_step(self, s: OracleState, target_q) -> OracleState:
        for _ in range(self.substeps):
            s = self.substep(s, target_q)
        return s
