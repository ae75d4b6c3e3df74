"""Quaternion and SO(3) utilities (xyzw order, scipy convention).

The reference stack uses `scipy.spatial.transform.Rotation` with xyzw
quaternions throughout (e.g. reference legged_robot.py:170,
primitive_level_env.py:19-23, motion_lib.py:126-149). All functions here are
elementwise-broadcastable and jit/vmap friendly: quaternions are arrays whose
last axis is 4 (x, y, z, w), vectors last axis 3.
"""
import jax.numpy as jnp

_EPS = 1e-8


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def mul(q1, q2):
    """Hamilton product: rotation q1∘q2 (apply q2 first, then q1)."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def inv(q):
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def rotate_inv(q, v):
    """Rotate v by the inverse of q: R(q)^T @ v."""
    return rotate(inv(q), v)


def to_matrix(q):
    """Quaternion -> 3x3 rotation matrix (scipy as_matrix convention)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def from_rotvec(rv):
    """Axis-angle rotation vector -> quaternion. Small-angle safe."""
    angle = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc formulation is exact at angle=0.
    k = 0.5 * jnp.sinc(half / jnp.pi)
    return normalize(jnp.concatenate([rv * k, jnp.cos(half)], axis=-1))


def to_rotvec(q):
    """Quaternion -> axis-angle rotation vector (scipy as_rotvec convention)."""
    q = jnp.where(q[..., 3:4] < 0.0, -q, q)  # shortest arc
    sin_half = jnp.linalg.norm(q[..., :3], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], q[..., 3])[..., None]
    scale = jnp.where(sin_half > _EPS, angle / sin_half.clip(_EPS), 2.0)
    return q[..., :3] * scale


def slerp(q0, q1, t):
    """Spherical linear interpolation, t in [0, 1] (scalar or batched,
    broadcast against the quaternion batch). Matches scipy Slerp."""
    t = jnp.asarray(t)[..., None]
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0.0, -q1, q1)
    d = jnp.abs(d).clip(max=1.0 - 1e-7)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    w0 = jnp.sin((1.0 - t) * theta) / sin_theta
    w1 = jnp.sin(t * theta) / sin_theta
    # fall back to lerp for nearly-parallel quaternions
    close = sin_theta < 1e-5
    w0 = jnp.where(close, 1.0 - t, w0)
    w1 = jnp.where(close, t, w1)
    return normalize(w0 * q0 + w1 * q1)


def integrate(q, omega_world, dt):
    """Integrate orientation by world-frame angular velocity over dt.

    q' = exp(omega*dt) ∘ q — matches how Bullet advances base orientation.
    """
    return normalize(mul(from_rotvec(omega_world * dt), q))


def diff_rotvec(q_to, q_from):
    """Rotation vector of q_to ∘ q_from^{-1} (world-frame relative rotation).

    Matches reference motion_lib.py:144 `(R(n) * R(c).inv()).as_rotvec()`.
    """
    return to_rotvec(mul(q_to, inv(q_from)))


def yaw(q):
    """Extract heading yaw of the body x-axis projected to the ground plane."""
    fwd = rotate(q, jnp.array([1.0, 0.0, 0.0]))
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])


def from_yaw(yaw_angle):
    half = 0.5 * yaw_angle
    zeros = jnp.zeros_like(half)
    return jnp.stack([zeros, zeros, jnp.sin(half), jnp.cos(half)], axis=-1)
