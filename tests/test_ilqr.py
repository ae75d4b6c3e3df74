"""iLQR refinement: cost must decrease on the tracking problem."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.solver import ilqr

MODEL = build_max_model()
STAND = jnp.asarray([-0.028, -0.779, 1.687] * 4)


def _clip():
    frames = np.zeros((240, 19), dtype=np.float32)
    frames[:, 2] = 0.33
    frames[:, 6] = 1.0
    frames[:, 7:] = np.asarray(STAND)
    return motion_lib.pack_clips([frames], frame_step=1.0 / 120.0)


def test_flatten_roundtrip():
    s = RobotState(
        base_pos=jnp.arange(3.0),
        base_orn=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.arange(3.0) + 3,
        base_ang_vel=jnp.arange(3.0) + 6,
        joint_pos=jnp.arange(12.0),
        joint_vel=jnp.arange(12.0) + 12,
    )
    x = ilqr.flatten_state(s)
    assert x.shape == (37,)
    s2 = ilqr.unflatten_state(x)
    for a, b in zip(s, s2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


@pytest.mark.slow
def test_ilqr_reduces_tracking_cost():
    clips = _clip()
    params = engine.PhysicsParams(substeps=2)
    step_fn, cost_fn = ilqr.make_problem(
        MODEL, params, clips, jnp.asarray(0), jnp.asarray(0.0)
    )
    s0 = RobotState(
        base_pos=jnp.asarray([0.0, 0.0, 0.33]),
        base_orn=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        joint_pos=STAND,
        joint_vel=jnp.zeros(12),
    )
    x0 = ilqr.flatten_state(s0)
    H = 3
    u0 = jnp.full((H, 12), 0.25)  # deliberately bad warm start
    cfg = ilqr.ILQRConfig(iterations=2)
    solve = jax.jit(lambda u: ilqr.ilqr_solve(step_fn, cost_fn, x0, u, cfg))
    u_opt, info = solve(u0)
    assert u_opt.shape == (H, 12)
    assert float(info["final_cost"]) < float(info["initial_cost"]), info
    assert np.isfinite(np.asarray(info["cost_history"])).all()
