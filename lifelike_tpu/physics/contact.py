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
