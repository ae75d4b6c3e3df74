"""TL rollout/MPPI fast path vs the oracle solver implementation."""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.solver import mppi, mppi_tl, rollout, rollout_tl

MODEL = build_max_model()
STAND = jnp.asarray([-0.028, -0.779, 1.687] * 4)


def _stand_clip():
    frames = np.zeros((240, 19), dtype=np.float32)
    frames[:, 2] = 0.33
    frames[:, 6] = 1.0
    frames[:, 7:] = np.asarray(STAND)
    return motion_lib.pack_clips([frames], frame_step=1.0 / 120.0)


def standing_state():
    z = jnp.zeros(3)
    return RobotState(
        base_pos=z.at[2].set(0.33),
        base_orn=jnp.zeros(4).at[3].set(1.0),
        base_lin_vel=z,
        base_ang_vel=z,
        joint_pos=STAND,
        joint_vel=jnp.zeros(12),
    )


def test_rollout_tl_matches_oracle_cost():
    clips = _stand_clip()
    params = engine.PhysicsParams(substeps=5)
    H, n = 4, 3
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(-0.1, 0.1, size=(n, H, 12)))
    s = standing_state()
    sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), s)

    cost_oracle, _, _ = rollout.rollout_tracking(
        MODEL, params, clips, sb, jnp.zeros(n, jnp.int32), jnp.zeros(n), u
    )

    c = B.tl_constants(MODEL, dtype=s.base_pos.dtype)
    ref = rollout_tl.precompute_reference(
        MODEL, clips, jnp.asarray(0), jnp.asarray(0.0), H, params.dt * params.substeps
    )
    tl = B.tl_from_state(sb, batch2d=(1, n))
    u_tl = jnp.moveaxis(u.reshape(n, H, 4, 3), 0, -1)[..., None, :]  # (H,4,3,1,n)
    cost_tl, _ = rollout_tl.rollout_tracking(c, params, tl, u_tl, ref)
    np.testing.assert_allclose(
        np.asarray(cost_tl).reshape(n), np.asarray(cost_oracle), rtol=1e-4, atol=1e-5
    )


def test_mppi_tl_improves():
    clips = _stand_clip()
    params = engine.PhysicsParams(substeps=5)
    cfg = mppi.MPPIConfig(horizon=4, population=128, iterations=2, sigma=0.1)
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    s = standing_state()
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], s))
    ref = rollout_tl.precompute_reference(
        MODEL, clips, jnp.asarray(0), jnp.asarray(0.0), cfg.horizon,
        params.dt * params.substeps,
    )
    u_bad = jnp.full((cfg.horizon, 4, 3), 0.35)
    cost_bad, _ = rollout_tl.rollout_tracking(
        c, params, tl, u_bad[..., None, None], ref
    )
    u_opt, diag = mppi_tl.mppi_step(
        c, params, cfg, jax.random.PRNGKey(0), tl, u_bad, ref, lanes=64
    )
    cost_opt, _ = rollout_tl.rollout_tracking(
        c, params, tl, u_opt[..., None, None], ref
    )
    assert float(cost_opt.reshape(())) < float(cost_bad.reshape(())), (
        float(cost_opt.reshape(())), float(cost_bad.reshape(())),
    )


def test_tl_controller_closed_loop():
    clips = _stand_clip()
    params = engine.PhysicsParams(substeps=5)
    cfg = mppi.MPPIConfig(horizon=4, population=64, iterations=1, sigma=0.08)
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    ctrl = mppi_tl.make_mpc_controller(MODEL, c, params, clips, cfg)
    s = standing_state()
    step = jax.jit(lambda s, tgt: engine.control_step(MODEL, params, s, tgt))
    key = jax.random.PRNGKey(1)
    u = jnp.zeros((cfg.horizon, 4, 3))
    t = jnp.asarray(0.0)
    for i in range(5):
        key, k = jax.random.split(key)
        tgt, u, diag = ctrl(k, s, jnp.asarray(0), t, u)
        s = step(s, tgt)
        t = t + params.dt * params.substeps
    assert 0.2 < float(s.base_pos[2]) < 0.45
    assert bool(jnp.all(jnp.isfinite(s.joint_pos)))
