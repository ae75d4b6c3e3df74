"""6D spatial-vector algebra (Featherstone convention, [angular; linear]).

Building blocks for the rigid-body dynamics in lifelike_tpu.physics.dynamics.
All ops broadcast over leading batch axes; shapes use trailing (6,), (3, 3),
or (6, 6) axes. Everything is jit/vmap/grad friendly.
"""
import jax.numpy as jnp


def skew(v):
    """3-vector -> 3x3 skew-symmetric cross-product matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def spatial_inertia(mass, com, inertia_com):
    """Spatial inertia (6x6) of a body about a frame origin.

    mass: scalar, com: (3,) COM offset from frame origin, inertia_com: (3,3)
    rotational inertia about the COM (all in the same frame).
    Layout: [[I_o, m*cx], [m*cx^T, m*1]] with I_o = I_com + m*cx*cx^T.
    """
    cx = skew(com)
    I_o = inertia_com + mass * cx @ jnp.swapaxes(cx, -1, -2)
    m_eye = jnp.broadcast_to(mass * jnp.eye(3, dtype=cx.dtype), cx.shape)
    top = jnp.concatenate([I_o, mass * cx], axis=-1)
    bot = jnp.concatenate([mass * jnp.swapaxes(cx, -1, -2), m_eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_inertia(R, p, I6):
    """Express spatial inertia I6 (about its own frame) in a new frame.

    The new frame sees the old frame at rotation R (old->new) and origin
    offset p (position of old origin in new frame). Returns X I6 X^T with the
    force transform X = [[R, 0], [px R, R]].
    """
    px = skew(p)
    zeros = jnp.zeros_like(R)
    X = jnp.concatenate(
        [
            jnp.concatenate([R, zeros], axis=-1),
            jnp.concatenate([px @ R, R], axis=-1),
        ],
        axis=-2,
    )
    return X @ I6 @ jnp.swapaxes(X, -1, -2)


def cross_motion(v, m):
    """Spatial cross product v x m for motion vectors ([w; vl])."""
    w, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)], axis=-1
    )


def cross_force(v, f):
    """Spatial cross product v x* f for force vectors."""
    w, vl = v[..., :3], v[..., 3:]
    fw, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fw) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def apply_inertia(I6, m):
    """I6 @ m for a motion vector m -> force vector."""
    return jnp.einsum("...ij,...j->...i", I6, m)
