"""Sharded MPPI on the virtual 8-device CPU mesh vs the single-device solve."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.motion import motion_lib
from lifelike_tpu.parallel import mesh as meshlib
from lifelike_tpu.parallel import sharded_solve
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.solver import mppi, rollout_tl

MODEL = build_max_model()
STAND = jnp.asarray([-0.028, -0.779, 1.687] * 4)


def _clip():
    frames = np.zeros((240, 19), dtype=np.float32)
    frames[:, 2] = 0.33
    frames[:, 6] = 1.0
    frames[:, 7:] = np.asarray(STAND)
    return motion_lib.pack_clips([frames], frame_step=1.0 / 120.0)


def test_sharded_solve_runs_and_improves():
    assert len(jax.devices()) == 8, jax.devices()
    mesh = meshlib.make_mesh(8)
    clips = _clip()
    params = engine.PhysicsParams(substeps=2)
    cfg = mppi.MPPIConfig(horizon=3, population=8 * 16, iterations=1, sigma=0.1)
    c = B.tl_constants(MODEL, dtype=jnp.float64)

    s = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33]),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        joint_pos=STAND,
        joint_vel=jnp.zeros(12),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], s))
    ref = rollout_tl.precompute_reference(
        MODEL, clips, jnp.asarray(0), jnp.asarray(0.0), cfg.horizon,
        params.dt * params.substeps,
    )
    u_bad = jnp.full((cfg.horizon, 4, 3), 0.3)
    u_opt, diag = sharded_solve.sharded_mppi_step(
        mesh, c, params, cfg, jax.random.PRNGKey(0), tl, u_bad, ref, lanes=16
    )
    assert u_opt.shape == (cfg.horizon, 4, 3)
    cost_bad, _ = rollout_tl.rollout_tracking(
        c, params, tl, u_bad[..., None, None], ref
    )
    cost_opt, _ = rollout_tl.rollout_tracking(
        c, params, tl, u_opt[..., None, None], ref
    )
    assert float(cost_opt.reshape(())) < float(cost_bad.reshape(()))
    assert np.isfinite(float(diag["best_cost"]))


def test_sharded_weighting_matches_reassociated_math():
    """The psum-reassociated weighted average equals the dense softmax: check
    with a hand computation on known costs."""
    # simulate: costs per device shard, verify global softmax identity
    costs = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float64)
    temp = 0.05
    dense_w = np.exp(-(costs - costs.min()) / temp)
    dense_w /= dense_w.sum()
    # reassociated: per-shard exp sums then global denominator
    c_min = costs.min()
    parts = np.exp(-(costs - c_min) / temp)
    denom = parts.sum()
    np.testing.assert_allclose(parts / denom, dense_w, rtol=1e-12)


@pytest.mark.slow
def test_sharded_hybrid_refines_across_mesh():
    """Stage-2 refinement: per-device iLQR polish of the weighted u and the
    device-local best candidate, globally argmin-selected over ICI. The
    refined sequence can only beat (or match) the pure-MPPI weighted u
    under the smooth refinement cost."""
    from lifelike_tpu.solver import ilqr

    assert len(jax.devices()) == 8, jax.devices()
    mesh = meshlib.make_mesh(8)
    clips = _clip()
    params = engine.PhysicsParams(substeps=2)
    cfg = mppi.MPPIConfig(horizon=3, population=8 * 16, iterations=1,
                          sigma=0.1)
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    s = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33]),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        joint_pos=STAND,
        joint_vel=jnp.zeros(12),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], s))
    ref = rollout_tl.precompute_reference(
        MODEL, clips, jnp.asarray(0), jnp.asarray(0.0), cfg.horizon,
        params.dt * params.substeps,
    )
    u_bad = jnp.full((cfg.horizon, 4, 3), 0.3)
    icfg = ilqr.ILQRConfig(iterations=1)
    u_hyb, diag = sharded_solve.sharded_hybrid_step(
        mesh, MODEL, c, params, clips, cfg, icfg, jax.random.PRNGKey(0),
        tl, u_bad, jnp.asarray(0), jnp.asarray(0.0), ref,
        use_pallas=False, lanes=16,
    )
    assert u_hyb.shape == (cfg.horizon, 4, 3)
    assert np.isfinite(float(diag["refined_cost"]))

    # pure-MPPI weighted u for comparison, same rng
    u_mppi, _ = sharded_solve.sharded_mppi_step(
        mesh, c, params, cfg, jax.random.PRNGKey(0), tl, u_bad, ref, lanes=16
    )
    step_fn, cost_fn = ilqr.make_problem(
        MODEL, params, clips, jnp.asarray(0), jnp.asarray(0.0)
    )
    x0 = ilqr.flatten_state(s)
    cost_of = lambda u: float(
        ilqr._rollout(step_fn, cost_fn, x0, u.reshape(cfg.horizon, 12))[2]
    )
    assert cost_of(u_hyb) <= cost_of(u_mppi) + 1e-6
