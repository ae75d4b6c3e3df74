"""Quaternion ops vs scipy.spatial.transform.Rotation (the reference's math)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp

from lifelike_tpu.math import quat

rng = np.random.default_rng(0)


def rand_quat(n=16):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_mul_matches_scipy():
    q1, q2 = rand_quat(), rand_quat()
    got = np.asarray(quat.mul(q1, q2))
    want = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-12)


def test_rotate_matches_scipy():
    q = rand_quat()
    v = rng.normal(size=(16, 3))
    np.testing.assert_allclose(
        np.asarray(quat.rotate(q, v)), R.from_quat(q).apply(v), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(quat.rotate_inv(q, v)), R.from_quat(q).inv().apply(v), atol=1e-12
    )


def test_matrix_matches_scipy():
    q = rand_quat()
    np.testing.assert_allclose(
        np.asarray(quat.to_matrix(q)), R.from_quat(q).as_matrix(), atol=1e-12
    )


def test_rotvec_roundtrip_matches_scipy():
    q = rand_quat()
    rv = R.from_quat(q).as_rotvec()
    np.testing.assert_allclose(np.asarray(quat.to_rotvec(q)), rv, atol=1e-10)
    q2 = np.asarray(quat.from_rotvec(rv))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-10)


def test_from_rotvec_small_angle():
    rv = np.array([[1e-12, 0, 0], [0.0, 0, 0]])
    q = np.asarray(quat.from_rotvec(rv))
    np.testing.assert_allclose(q[:, 3], 1.0, atol=1e-12)


def test_slerp_matches_scipy():
    q = rand_quat(2)
    s = Slerp([0, 1], R.from_quat(q))
    for t in [0.0, 0.25, 0.7, 1.0]:
        want = s(t).as_quat()
        got = np.asarray(quat.slerp(q[0], q[1], t))
        sign = np.sign(np.sum(got * want))
        np.testing.assert_allclose(got * sign, want, atol=1e-9)


def test_integrate_constant_omega():
    q0 = np.array([0.0, 0.0, 0.0, 1.0])
    omega = np.array([0.0, 0.0, np.pi / 2])  # 90 deg/s about z
    q = q0
    dt = 1e-3
    for _ in range(1000):
        q = np.asarray(quat.integrate(q, omega, dt))
    want = R.from_euler("z", 90, degrees=True).as_quat()
    sign = np.sign(np.sum(q * want))
    np.testing.assert_allclose(q * sign, want, atol=1e-6)


def test_diff_rotvec_matches_reference_formula():
    qa, qb = rand_quat(), rand_quat()
    # reference motion_lib.py:144: (R(n) * R(c).inv()).as_rotvec()
    want = (R.from_quat(qa) * R.from_quat(qb).inv()).as_rotvec()
    np.testing.assert_allclose(np.asarray(quat.diff_rotvec(qa, qb)), want, atol=1e-10)


def test_yaw():
    ang = rng.uniform(-np.pi, np.pi, size=8)
    q = R.from_euler("z", ang[:, None]).as_quat()
    np.testing.assert_allclose(np.asarray(quat.yaw(q)), ang, atol=1e-10)
