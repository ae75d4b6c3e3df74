"""Analytic 3-DoF leg inverse kinematics for the MAX quadruped.

Closed-form IK for one leg chain of the MAX robot (hip abduction about +x,
hip pitch and knee about -y; geometry from robot/max_urdf_data.py:
joint2 sits (0, +-0.09, 0) from joint1, thigh 0.2115 m, shank 0.24 m,
foot sphere fused at the shank tip). Used by the mocap retargeter
(motion/retarget.py) and available at runtime for foot-placement costs —
pure jnp, jit/vmap/grad friendly, no data-dependent branching.

The knee branch is fixed to the robot's natural convention (theta3 >= 0,
as in the reference stand pose [-0.028, -0.779, 1.687] — see
`/root/reference/train_scripts/example_pmc_train.sh:75-77` context and
`legged_robot.py:115-117` init states).
"""
import jax.numpy as jnp
import numpy as np

# Leg order FR, FL, HR, HL (robot/model.py LEG_NAMES; clip LegOrder).
# sy = sign of the leg's lateral (y) offsets: right legs -1, left legs +1.
LEG_SY = np.array([-1.0, 1.0, -1.0, 1.0])
HIP_OFFSET = np.array(  # joint1 origin in base frame (max_urdf_data JOINTS)
    [
        [0.195, -0.06, 0.0],
        [0.195, 0.06, 0.0],
        [-0.195, -0.06, 0.0],
        [-0.195, 0.06, 0.0],
    ]
)
D_HIP = 0.09  # |joint2 y-offset from joint1|
L_THIGH = 0.2115
L_SHANK = 0.24
MAX_REACH = L_THIGH + L_SHANK


def leg_ik(p_rel, sy, eps=1e-9):
    """Joint angles (..., 3) reaching foot position p_rel (..., 3).

    p_rel: foot-sphere center relative to the leg's joint1 origin, in the
    base frame. sy: +1 left legs, -1 right legs (broadcastable). Targets
    outside the reachable annulus are projected onto it (acos/sqrt clamps),
    so the function is total — callers clamp to joint limits separately.

    Branch convention: returns the knee-positive, foot-below-hip-axis
    solution (planar z' < 0). Configurations with the foot folded above the
    hip axis map to the mirror solution (theta1 shifted by pi) — unreachable
    in normal locomotion and excluded from the retarget targets.
    """
    dtype = jnp.asarray(p_rel).dtype
    px, py, pz = p_rel[..., 0], p_rel[..., 1], p_rel[..., 2]
    d = jnp.asarray(sy, dtype) * D_HIP

    # Abduction: rotate about +x so the leg plane (at lateral offset d)
    # contains the target. In the post-theta1 frame the foot has y' = d.
    rho_sq = py**2 + pz**2
    zp = -jnp.sqrt(jnp.maximum(rho_sq - d**2, eps))
    theta1 = jnp.arctan2(pz, py) - jnp.arctan2(zp, d)
    # wrap to (-pi, pi] so straight-down targets give theta1 ~ 0
    theta1 = jnp.arctan2(jnp.sin(theta1), jnp.cos(theta1))

    # Planar 2R in the leg plane: x' forward, z' down the leg.
    xp = px
    r_sq = xp**2 + zp**2
    c3 = (r_sq - L_THIGH**2 - L_SHANK**2) / (2.0 * L_THIGH * L_SHANK)
    theta3 = jnp.arccos(jnp.clip(c3, -1.0, 1.0))  # knee-positive branch
    psi = jnp.arctan2(L_SHANK * jnp.sin(theta3), L_THIGH + L_SHANK * jnp.cos(theta3))
    theta2 = jnp.arctan2(xp, -zp) - psi

    return jnp.stack([theta1, theta2, theta3], axis=-1)


def all_legs_ik(p_rel_all):
    """IK for all four legs at once: p_rel_all (..., 4, 3) -> (..., 4, 3)."""
    sy = jnp.asarray(LEG_SY, jnp.asarray(p_rel_all).dtype)
    return leg_ik(p_rel_all, sy[..., :, None][..., :, 0])


def leg_fk(q, sy):
    """Foot position (..., 3) from joint angles (..., 3), relative to joint1.

    The forward map inverted by leg_ik — used for tests and for projecting
    foot targets. Matches physics/dynamics.forward_kinematics foot output
    for an identity base pose.
    """
    dtype = jnp.asarray(q).dtype
    t1, t2, t3 = q[..., 0], q[..., 1], q[..., 2]
    d = jnp.asarray(sy, dtype) * D_HIP
    xp = L_THIGH * jnp.sin(t2) + L_SHANK * jnp.sin(t2 + t3)
    zp = -(L_THIGH * jnp.cos(t2) + L_SHANK * jnp.cos(t2 + t3))
    # un-rotate the leg plane by theta1 about +x
    c1, s1 = jnp.cos(t1), jnp.sin(t1)
    py = d * c1 - zp * s1
    pz = d * s1 + zp * c1
    return jnp.stack([xp, py, pz], axis=-1)
