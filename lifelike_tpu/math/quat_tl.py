"""Quaternion ops in TPU-tile layout: component axis LEADING, batch TRAILING.

Counterpart of lifelike_tpu.math.quat for the hot path. A quaternion is
(4, *B) with components (x, y, z, w); vectors are (3, *B). With the batch in
the minor-most axes, every operation is elementwise over full (8, 128) VPU
tiles instead of padding 3/4-wide trailing axes to 128 lanes.
"""
import jax.numpy as jnp

_EPS = 1e-8


def normalize(q):
    return q / jnp.sqrt(jnp.sum(q * q, axis=0)).clip(_EPS)


def mul(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def inv(q):
    x, y, z, w = q
    return jnp.stack([-x, -y, -z, w])


def cross(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0])


def rotate(q, v):
    qv = q[:3]
    qw = q[3]
    t = 2.0 * cross(qv, v)
    return v + qw * t + cross(qv, t)


def rotate_inv(q, v):
    return rotate(inv(q), v)


def to_matrix(q):
    """(4, *B) -> (3, 3, *B) rotation matrix."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)])
    r1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)])
    r2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)])
    return jnp.stack([r0, r1, r2])


def from_rotvec(rv):
    angle = jnp.sqrt(jnp.sum(rv * rv, axis=0))
    half = 0.5 * angle
    k = 0.5 * jnp.sinc(half / jnp.pi)
    return normalize(jnp.concatenate([rv * k, jnp.cos(half)[None]], axis=0))


def integrate(q, omega_world, dt):
    """q' = exp(omega*dt) o q, omega (3, *B) world frame."""
    return normalize(mul(from_rotvec(omega_world * dt), q))


def rel_angle(q_a, q_b):
    """|rotation angle| of q_a o q_b^{-1} — the root-pose error metric
    (reference primitive_level_env.py:319-335, 404-414)."""
    d = mul(q_a, inv(q_b))
    s = jnp.sqrt(jnp.sum(d[:3] * d[:3], axis=0))
    return 2.0 * jnp.arctan2(s, jnp.abs(d[3]))
