"""SEPMC Chase-Tag objective as MPC costs for both roles.

Game terms from reference chase_tag_game_env.py: chaser minimizes distance to
the escapee (:670-680 chaser dist-progress), escapee maximizes it while
closing on the flag (:682-697, flag progress gated by visibility); catch and
flag-grab events are terminal bonuses handled by the game engine. Running
both robots' solvers against these coupled costs gives the alternating
best-response self-play loop (SURVEY.md section 7 layer 10).
"""
from typing import NamedTuple

import jax.numpy as jnp

from lifelike_tpu.costs import tracking
from lifelike_tpu.physics.dynamics import RobotState


class ChaseWeights(NamedTuple):
    distance: float = 1.0
    heading: float = 0.5
    fall: float = 5.0
    # stand prior (see costs.traversal.TraversalWeights: lying flat is
    # otherwise a safe local optimum for the sampling MPC)
    height: float = 4.0
    height_min: float = 0.26
    upright: float = 2.0
    pose: float = 0.05


def chaser_cost(state: RobotState, opponent_pos, weights=ChaseWeights()):
    """Minimize distance to the escapee + heading alignment (reference
    _compute_chaser_common_reward :699-719)."""
    from lifelike_tpu.math import quat

    diff = (opponent_pos - state.base_pos)[..., :2]
    d = jnp.linalg.norm(diff, axis=-1)
    dir_w = diff / d[..., None].clip(1e-8)
    yaw = quat.yaw(state.base_orn)
    r_rot = jnp.exp(
        (jnp.cos(yaw) * dir_w[..., 0] + jnp.sin(yaw) * dir_w[..., 1] - 1.0) * 2.0
    )
    cost = weights.distance * d + weights.heading * (1.0 - r_rot)
    fall = tracking.fall_terminated(state)
    return cost + weights.fall * fall.astype(cost.dtype)


def escapee_cost(state: RobotState, opponent_pos, flag_pos, flag_visible=1.0,
                 weights=ChaseWeights()):
    """Maximize distance from the chaser while closing on the flag
    (flag term gated by visibility, reference :682-697)."""
    d_opp = jnp.linalg.norm((opponent_pos - state.base_pos)[..., :2], axis=-1)
    d_flag = jnp.linalg.norm((flag_pos - state.base_pos)[..., :2], axis=-1)
    cost = -weights.distance * d_opp + weights.distance * flag_visible * d_flag
    fall = tracking.fall_terminated(state)
    return cost + weights.fall * fall.astype(cost.dtype)
