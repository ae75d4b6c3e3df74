"""End-to-end slice: PD standing, tracking reward sanity, and a small MPPI
solve improving tracking cost on a synthetic clip (SURVEY.md section 7
"minimum end-to-end slice", shrunk for CPU CI)."""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.costs import tracking
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import dynamics, engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.solver import mppi, rollout

MODEL = build_max_model()

STAND_JOINTS = jnp.asarray([-0.028, -0.779, 1.687] * 4)


def standing_state(batch=()):
    z = jnp.zeros(batch + (3,))
    return RobotState(
        base_pos=z.at[..., 2].set(0.33),
        base_orn=jnp.zeros(batch + (4,)).at[..., 3].set(1.0),
        base_lin_vel=z,
        base_ang_vel=z,
        joint_pos=jnp.broadcast_to(STAND_JOINTS, batch + (12,)),
        joint_vel=jnp.zeros(batch + (12,)),
    )


def test_pd_standing_stable():
    """PD holding the crouch pose keeps the robot upright for 1 s sim time."""
    params = engine.PhysicsParams()
    s = standing_state()
    step = jax.jit(lambda s: engine.control_step(MODEL, params, s, STAND_JOINTS))
    for _ in range(50):  # 50 control steps = 1 s
        s = step(s)
    # PD with kp=50 sags ~0.1-0.25 rad under gravity (same gains as Bullet);
    # equilibrium height ~0.25 m. The policy/solver compensates via targets.
    assert 0.22 < float(s.base_pos[2]) < 0.40, s.base_pos
    assert not bool(tracking.fall_terminated(s))
    # joints stay near targets up to the gravity-load steady-state error
    assert float(jnp.max(jnp.abs(s.joint_pos - STAND_JOINTS))) < 0.3


def test_tracking_reward_perfect_is_one():
    s = standing_state()
    kin = dynamics.forward_kinematics(MODEL, s)
    r = tracking.tracking_reward(s, kin.p_foot, s, kin.p_foot)
    np.testing.assert_allclose(float(r), 1.0, atol=1e-6)


def test_tracking_reward_decreases_with_error():
    s = standing_state()
    kin = dynamics.forward_kinematics(MODEL, s)
    s2 = s._replace(joint_pos=s.joint_pos + 0.3)
    kin2 = dynamics.forward_kinematics(MODEL, s2)
    r_good = tracking.tracking_reward(s, kin.p_foot, s, kin.p_foot)
    r_bad = tracking.tracking_reward(s2, kin2.p_foot, s, kin.p_foot)
    assert float(r_bad) < float(r_good)


def _stand_clip():
    """Synthetic clip that just stands at the crouch pose."""
    frames = np.zeros((240, 19), dtype=np.float32)
    frames[:, 2] = 0.33
    frames[:, 6] = 1.0
    frames[:, 7:] = np.asarray(STAND_JOINTS)
    return motion_lib.pack_clips([frames], frame_step=1.0 / 120.0)


def test_rollout_tracking_runs_batched():
    clips = _stand_clip()
    params = engine.PhysicsParams(substeps=5)
    B, H = 3, 4
    s = standing_state((B,))
    u = jnp.zeros((B, H, 12))
    cost, final, costs = jax.jit(
        lambda s, u: rollout.rollout_tracking(
            MODEL, params, clips, s, jnp.zeros(B, jnp.int32), jnp.zeros(B), u
        )
    )(s, u)
    assert cost.shape == (B,)
    assert costs.shape == (B, H)
    assert float(jnp.max(cost)) < 1.0  # standing tracks the stand clip well


def test_mppi_improves_over_bad_nominal():
    clips = _stand_clip()
    params = engine.PhysicsParams(substeps=5)
    cfg = mppi.MPPIConfig(horizon=5, population=64, iterations=2, sigma=0.1)
    s = standing_state()
    u_bad = jnp.full((cfg.horizon, 12), 0.35)  # strong constant offset
    cost_bad, _, _ = rollout.rollout_tracking(
        MODEL, params, clips, s, jnp.asarray(0), jnp.asarray(0.0), u_bad
    )
    key = jax.random.PRNGKey(0)
    u_opt, diag = mppi.mppi_step(
        MODEL, params, clips, cfg, key, s, jnp.asarray(0), jnp.asarray(0.0), u_bad
    )
    cost_opt, _, _ = rollout.rollout_tracking(
        MODEL, params, clips, s, jnp.asarray(0), jnp.asarray(0.0), u_opt
    )
    assert float(cost_opt) < float(cost_bad), (float(cost_opt), float(cost_bad))


def test_grad_through_rollout():
    """Differentiability: SQP/iLQR refinement needs d cost / d controls."""
    clips = _stand_clip()
    params = engine.PhysicsParams(substeps=2)
    s = standing_state()

    def loss(u):
        c, _, _ = rollout.rollout_tracking(
            MODEL, params, clips, s, jnp.asarray(0), jnp.asarray(0.0), u
        )
        return c

    g = jax.grad(loss)(jnp.zeros((3, 12)))
    assert g.shape == (3, 12)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0
