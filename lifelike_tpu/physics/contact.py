"""Compliant contact model for foot/wheel spheres against terrain.

The reference relies on Bullet's sequential-impulse solver (10 iterations,
reference legged_robot.py:261). A TPU-batched replacement needs fixed
structure and no LCP branching, so contact is modeled as a regularized
spring-damper normal force plus smooth Coulomb friction — the standard
penalty/compliant formulation used by on-device simulators. Parameters are
tuned so static penetration is ~1 mm and the 500 Hz substep integration stays
stable (see tests/test_physics.py).
"""
from typing import NamedTuple

import jax.numpy as jnp


class ContactParams(NamedTuple):
    """Stability constraint (explicit 500 Hz substeps, ~0.2 kg effective foot
    mass m_eff): spring needs sqrt(kn/m_eff)*dt < ~1 and any effective viscous
    coefficient c needs c*dt/m_eff < ~1, i.e. c < ~100 N s/m. kn=1.2e4 gives
    ~2.7 mm static penetration at 32 N/foot and omega*dt ~ 0.5."""

    kn: float = 1.2e4  # normal stiffness (N/m)
    dn: float = 50.0  # normal damping (N s/m)
    v_slip: float = 0.1  # friction regularization velocity (m/s)
    fric_visc_cap: float = 80.0  # max effective tangential viscosity (N s/m)
    mu: float = 0.5  # lateral friction; reference default foot friction 0.5


def box_sdf(center, half, p, eps=1e-9):
    """Signed distance + outward unit normal of points to axis-aligned boxes.

    center/half: (..., 3) box parameters; p: (..., 3) query points (shapes
    broadcast). Returns (dist (...,), normal (..., 3)): dist > 0 outside with
    the exact closest-feature normal; dist < 0 inside with the nearest-face
    pushout normal. This is the contact query that replaces Bullet's
    box-vs-sphere narrowphase (reference bullet_static_entities.py boxes are
    hard collision bodies for every robot link).
    """
    r = p - center
    q = jnp.abs(r) - half
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.sqrt(jnp.sum(outside * outside, axis=-1) + eps)
    d_in = jnp.max(q, axis=-1)  # negative inside, 0 on surface
    inside = d_in < 0.0
    dist = jnp.where(inside, d_in, d_out)

    sign = jnp.where(r >= 0.0, 1.0, -1.0)
    n_out = sign * outside / d_out[..., None]
    # inside: push out through the least-penetrated face
    face = q >= jnp.max(q, axis=-1, keepdims=True)
    face = face / jnp.sum(face, axis=-1, keepdims=True).clip(1.0)
    n_in = sign * face
    normal = jnp.where(inside[..., None], n_in, n_out)
    return dist, normal


def _sphere_surface_force(dist, normal, vel, radius, params: ContactParams, mu):
    """Compliant force for a sphere center at signed distance `dist` from a
    surface with outward `normal` — shared by plane, heightmap and box paths."""
    pen = jnp.maximum(radius - dist, 0.0)
    in_contact = pen > 0.0
    vn = jnp.sum(vel * normal, axis=-1)
    fn = params.kn * pen + params.dn * jnp.maximum(-vn, 0.0) * in_contact
    fn = jnp.maximum(fn, 0.0) * in_contact
    vt = vel - vn[..., None] * normal
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-12)
    coef = jnp.minimum(
        mu * fn / jnp.sqrt(vt_norm**2 + params.v_slip**2), params.fric_visc_cap
    )
    return fn[..., None] * normal - coef[..., None] * vt


def sphere_boxes_force(pos, vel, radius, center, half, active, params: ContactParams, mu):
    """Total contact force on spheres from a masked set of AABBs.

    pos/vel: (..., P, 3) sphere centers/velocities; center/half: (..., N, 3),
    active: (..., N). Returns (..., P, 3) forces summed over boxes — vertical
    faces push back exactly like tops, so robots cannot walk through walls or
    hurdles (Bullet hard-collision parity,
    reference bullet_static_entities.py:243-256).
    """
    dist, normal = box_sdf(
        center[..., None, :, :], half[..., None, :, :], pos[..., :, None, :]
    )  # (..., P, N), (..., P, N, 3)
    mu_b = mu if jnp.ndim(mu) == 0 else jnp.asarray(mu)[..., None]
    f = _sphere_surface_force(
        dist, normal, vel[..., :, None, :], radius, params, mu_b
    )
    f = f * active[..., None, :, None]
    return jnp.sum(f, axis=-2)


def sphere_ground_force(pos, vel, radius, ground_height, ground_normal, params: ContactParams, mu=None):
    """Contact force on spheres of `radius` at world positions `pos`.

    pos/vel: (..., 3); ground_height: (...,) terrain height at (x, y);
    ground_normal: (..., 3) unit normal. Returns world-frame forces (..., 3).
    Supports per-batch friction mu (broadcastable) for domain randomization
    (reference playground_env.py:209-211 randomizes friction 0.4-3.0).
    """
    mu = params.mu if mu is None else mu
    # Signed gap along the normal: distance of sphere bottom to surface.
    gap = (pos[..., 2] - ground_height) - radius  # plane-aligned fast path
    pen = jnp.maximum(-gap, 0.0)
    in_contact = pen > 0.0

    vn = jnp.sum(vel * ground_normal, axis=-1)
    fn = params.kn * pen + params.dn * jnp.maximum(-vn, 0.0) * (pen > 0.0)
    fn = jnp.maximum(fn, 0.0) * in_contact

    vt = vel - vn[..., None] * ground_normal
    # eps inside the sqrt: plain norm has an infinite gradient at zero slip,
    # which poisons dynamics Jacobians (iLQR linearization) for resting feet
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-12)
    # Effective viscosity min(mu*fn/sqrt(vt^2+vs^2), cap): Coulomb outside the
    # regularization region, capped viscous inside it for explicit stability.
    coef = jnp.minimum(
        mu * fn / jnp.sqrt(vt_norm**2 + params.v_slip**2), params.fric_visc_cap
    )
    ft = -coef[..., None] * vt

    return fn[..., None] * ground_normal + ft
