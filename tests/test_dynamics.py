"""Dynamics invariants: FK geometry, mass-matrix structure, gravity bias,
free-fall, energy conservation, and Lagrangian cross-checks by finite
differences (no PyBullet in this image, so checks are analytic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.physics import dynamics
from lifelike_tpu.physics.dynamics import GRAVITY, RobotState
from lifelike_tpu.robot.model import build_max_model

MODEL = build_max_model()
rng = np.random.default_rng(1)


def rand_state(batch=()):
    q = rng.normal(size=batch + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return RobotState(
        base_pos=jnp.asarray(rng.normal(size=batch + (3,))),
        base_orn=jnp.asarray(q),
        base_lin_vel=jnp.asarray(rng.normal(size=batch + (3,))),
        base_ang_vel=jnp.asarray(rng.normal(size=batch + (3,))),
        joint_pos=jnp.asarray(rng.uniform(-1.0, 1.0, size=batch + (12,))),
        joint_vel=jnp.asarray(rng.normal(size=batch + (12,))),
    )


def neutral_state():
    return RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.6]),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        joint_pos=jnp.zeros(12),
        joint_vel=jnp.zeros(12),
    )


def test_fk_zero_pose_geometry():
    s = neutral_state()
    kin = dynamics.forward_kinematics(MODEL, s)
    # hip (joint1) world positions: base + (+-0.195, +-0.06, 0)
    np.testing.assert_allclose(
        np.asarray(kin.p_joint[:, 0]),
        np.array([[0.195, -0.06, 0.6], [0.195, 0.06, 0.6],
                  [-0.195, -0.06, 0.6], [-0.195, 0.06, 0.6]]),
        atol=1e-12,
    )
    # straight legs: foot = hip + (0, -+0.09, 0) + (0,0,-0.2115) + (0,0,-0.24)
    feet = np.asarray(kin.p_foot)
    np.testing.assert_allclose(feet[0], [0.195, -0.15, 0.6 - 0.4515], atol=1e-12)
    np.testing.assert_allclose(feet[1], [0.195, 0.15, 0.6 - 0.4515], atol=1e-12)


def test_fk_knee_bend():
    # bend FR knee (joint3, axis -y) by +pi/2: the shank (and its foot tip at
    # (0,0,-0.24)) rotates about -y; rotvec -y * pi/2 maps (0,0,-z) -> (0,0,-z) x?
    s = neutral_state()
    jp = jnp.zeros(12).at[2].set(np.pi / 2)
    s = s._replace(joint_pos=jp)
    kin = dynamics.forward_kinematics(MODEL, s)
    knee = np.asarray(kin.p_joint[0, 2])
    foot = np.asarray(kin.p_foot[0])
    # rotation about -y by +pi/2 maps (0, 0, -0.24) to (+0.24, 0, 0)
    expect = knee + np.array([0.24, 0.0, 0.0])
    np.testing.assert_allclose(foot, expect, atol=1e-12)


def test_foot_velocity_finite_difference():
    s = rand_state()
    dt = 1e-7
    kin = dynamics.forward_kinematics(MODEL, s)
    from lifelike_tpu.math import quat

    s2 = RobotState(
        base_pos=s.base_pos + s.base_lin_vel * dt,
        base_orn=quat.integrate(s.base_orn, s.base_ang_vel, dt),
        base_lin_vel=s.base_lin_vel,
        base_ang_vel=s.base_ang_vel,
        joint_pos=s.joint_pos + s.joint_vel * dt,
        joint_vel=s.joint_vel,
    )
    kin2 = dynamics.forward_kinematics(MODEL, s2)
    v_fd = (kin2.p_foot - kin.p_foot) / dt
    np.testing.assert_allclose(np.asarray(kin.v_foot), np.asarray(v_fd), atol=1e-5)


def _mass_matrix_full(s):
    kin = dynamics.forward_kinematics(MODEL, s)
    Mb, F, Ml = dynamics.mass_matrix_blocks(MODEL, kin, s.base_pos, s.base_pos)
    M = np.zeros((18, 18))
    M[:6, :6] = np.asarray(Mb)
    Fn = np.asarray(F)  # (4,3,6)
    Mln = np.asarray(Ml)
    for l in range(4):
        for j in range(3):
            idx = 6 + 3 * l + j
            M[idx, :6] = Fn[l, j]
            M[:6, idx] = Fn[l, j]
        M[6 + 3 * l : 9 + 3 * l, 6 + 3 * l : 9 + 3 * l] = Mln[l]
    return M


def test_mass_matrix_spd_and_total_mass():
    s = rand_state()
    M = _mass_matrix_full(s)
    np.testing.assert_allclose(M, M.T, atol=1e-9)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0, w
    # Linear-linear block of the composite inertia = total mass * I
    np.testing.assert_allclose(M[3:6, 3:6], np.eye(3) * MODEL.total_mass, atol=1e-9)


def test_kinetic_energy_matches_pointwise_sum():
    """x^T M x / 2 must equal the sum over bodies of their kinetic energy."""
    s = rand_state()
    M = _mass_matrix_full(s)
    v = np.concatenate(
        [np.asarray(s.base_ang_vel), np.asarray(s.base_lin_vel),
         np.asarray(s.joint_vel)]
    )
    ke_matrix = 0.5 * v @ M @ v

    # independent computation: per-body KE from FK velocities
    kin = dynamics.forward_kinematics(MODEL, s)
    ke = 0.0
    # base
    from lifelike_tpu.math import quat

    Rb = np.asarray(kin.R_base)
    com_w = np.asarray(s.base_pos) + Rb @ MODEL.base_com
    v_com = np.asarray(s.base_lin_vel) + np.cross(
        np.asarray(s.base_ang_vel), com_w - np.asarray(s.base_pos)
    )
    I_w = Rb @ MODEL.base_inertia @ Rb.T
    w = np.asarray(s.base_ang_vel)
    ke += 0.5 * MODEL.base_mass * v_com @ v_com + 0.5 * w @ I_w @ w
    for l in range(4):
        for j in range(3):
            Rl = np.asarray(kin.R_link[l, j])
            pj = np.asarray(kin.p_joint[l, j])
            wl = np.asarray(kin.w_link[l, j])
            vo = np.asarray(kin.v_link_origin[l, j])
            com_w = pj + Rl @ MODEL.link_com[l, j]
            v_com = vo + np.cross(wl, com_w - pj)
            I_w = Rl @ MODEL.link_inertia[l, j] @ Rl.T
            m = MODEL.link_mass[l, j]
            ke += 0.5 * m * v_com @ v_com + 0.5 * wl @ I_w @ wl
    np.testing.assert_allclose(ke_matrix, ke, rtol=1e-9)


def test_gravity_bias_at_rest():
    s = neutral_state()
    kin = dynamics.forward_kinematics(MODEL, s)
    bias_b, bias_j = dynamics.bias_forces(MODEL, kin, s, s.base_pos)
    np.testing.assert_allclose(
        np.asarray(bias_b)[3:6], [0.0, 0.0, GRAVITY * MODEL.total_mass], atol=1e-9
    )


def test_free_fall():
    s = rand_state()
    kin = dynamics.forward_kinematics(MODEL, s)
    origin = s.base_pos
    bias_b, bias_j = dynamics.bias_forces(MODEL, kin, s, origin)
    Mb, F, Ml = dynamics.mass_matrix_blocks(MODEL, kin, origin, s.base_pos)
    # zero applied torques, zero velocity -> free fall: com accel = -g z
    s0 = s._replace(
        base_lin_vel=jnp.zeros(3), base_ang_vel=jnp.zeros(3), joint_vel=jnp.zeros(12)
    )
    kin0 = dynamics.forward_kinematics(MODEL, s0)
    bias_b0, bias_j0 = dynamics.bias_forces(MODEL, kin0, s0, origin)
    Mb0, F0, Ml0 = dynamics.mass_matrix_blocks(MODEL, kin0, origin, s0.base_pos)
    a_base, qdd = dynamics.forward_dynamics(Mb0, F0, Ml0, -bias_b0, -bias_j0)
    np.testing.assert_allclose(np.asarray(a_base)[:3], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_base)[3:], [0, 0, -GRAVITY], atol=1e-6)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=1e-6)


def test_energy_conservation_passive_swing():
    """No actuation, no contact (robot high up), no joint damping/friction:
    total energy must be conserved over a short passive swing."""
    from lifelike_tpu.physics import engine

    model = MODEL
    # zero-damping variant of the model for a clean Hamiltonian test
    import dataclasses

    model0 = dataclasses.replace(
        model,
        joint_damping=np.zeros_like(model.joint_damping),
        joint_friction=np.zeros_like(model.joint_friction),
    )
    params = engine.PhysicsParams(kp=0.0, kd=0.0, dt=1e-4, substeps=1)
    s = RobotState(
        base_pos=jnp.array([0.0, 0.0, 100.0]),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.array([0.2, -0.1, 0.0]),
        base_ang_vel=jnp.array([0.5, 0.3, -0.2]),
        joint_pos=jnp.asarray(rng.uniform(-0.3, 0.3, size=12)),
        joint_vel=jnp.asarray(rng.uniform(-1.0, 1.0, size=12)),
    )

    def energy(s):
        M = _mass_matrix_full(s)
        v = np.concatenate(
            [np.asarray(s.base_ang_vel), np.asarray(s.base_lin_vel), np.asarray(s.joint_vel)]
        )
        ke = 0.5 * v @ M @ v
        kin = dynamics.forward_kinematics(MODEL, s)
        pe = MODEL.base_mass * GRAVITY * float(
            (np.asarray(s.base_pos) + np.asarray(kin.R_base) @ MODEL.base_com)[2]
        )
        for l in range(4):
            for j in range(3):
                com_w = np.asarray(kin.p_joint[l, j]) + np.asarray(
                    kin.R_link[l, j]
                ) @ MODEL.link_com[l, j]
                pe += MODEL.link_mass[l, j] * GRAVITY * com_w[2]
        return ke + pe

    e0 = energy(s)
    step = jax.jit(lambda s: engine.substep(model0, params, s, jnp.zeros(12)))
    for _ in range(2000):  # 0.2 s
        s = step(s)
    e1 = energy(s)
    assert abs(e1 - e0) / abs(e0) < 2e-3, (e0, e1)


def test_batched_consistency():
    """vmapped batch of identical states matches single-state results."""
    s = rand_state()
    sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (5,) + x.shape), s)
    kin = dynamics.forward_kinematics(MODEL, s)
    kinb = dynamics.forward_kinematics(MODEL, sb)
    np.testing.assert_allclose(
        np.asarray(kinb.p_foot[2]), np.asarray(kin.p_foot), atol=1e-12
    )
    Mb, F, Ml = dynamics.mass_matrix_blocks(MODEL, kin, s.base_pos, s.base_pos)
    Mbb, Fb, Mlb = dynamics.mass_matrix_blocks(MODEL, kinb, sb.base_pos, sb.base_pos)
    np.testing.assert_allclose(np.asarray(Mbb[3]), np.asarray(Mb), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Fb[0]), np.asarray(F), atol=1e-12)
