"""Pallas Riccati sweep vs XLA oracle; batched iLQR; MPPI->iLQR hybrid.

The round-1 verdict's item 4: the sampling and SQP halves must be one
solver, with the block-banded Riccati factorization as a VMEM-resident
Pallas kernel (BASELINE.json north_star)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.solver import hybrid, ilqr, mppi, mppi_tl, riccati_pallas

MODEL = build_max_model()
STAND = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)


def _rand_lqr(key, S=3, H=5, n=37, m=12):
    ks = jax.random.split(key, 6)
    A = 0.1 * jax.random.normal(ks[0], (S, H, n, n)) + jnp.eye(n)
    Bm = 0.1 * jax.random.normal(ks[1], (S, H, n, m))
    cx = jax.random.normal(ks[2], (S, H, n))
    cu = jax.random.normal(ks[3], (S, H, m))
    W = 0.1 * jax.random.normal(ks[4], (S, H, n, n))
    Cxx = W @ jnp.swapaxes(W, -1, -2) + 0.1 * jnp.eye(n)
    V = 0.1 * jax.random.normal(ks[5], (S, H, m, m))
    Cuu = V @ jnp.swapaxes(V, -1, -2) + 0.1 * jnp.eye(m)
    return tuple(x.astype(jnp.float32) for x in (A, Bm, cx, cu, Cxx, Cuu))


def test_riccati_kernel_matches_oracle():
    prob = _rand_lqr(jax.random.PRNGKey(0))
    k1, K1 = riccati_pallas.riccati_sweep(*prob, reg=1e-3)
    k2, K2 = riccati_pallas.riccati_sweep_ref(*prob, reg=1e-3)
    scale = float(jnp.max(jnp.abs(k2)))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               atol=2e-5 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=2e-5)


def test_riccati_oracle_solves_lqr():
    """On an exact LQR problem (linear dynamics, quadratic cost) the swept
    gains reach the analytic optimum: one forward pass with k, K from x0=0
    must beat any perturbed control sequence."""
    A, Bm, cx, cu, Cxx, Cuu = _rand_lqr(jax.random.PRNGKey(1), S=1, H=6)
    cx = jnp.zeros_like(cx)  # pure quadratic cost around the origin

    def cost_of(us):
        x = jnp.zeros(37)
        total = 0.0
        for t in range(6):
            u = us[t]
            total = total + (
                0.5 * x @ Cxx[0, t] @ x + 0.5 * u @ Cuu[0, t] @ u
                + cu[0, t] @ u
            )
            x = A[0, t] @ x + Bm[0, t] @ u
        return total

    ks, Ks = riccati_pallas.riccati_sweep_ref(A, Bm, cx, cu, Cxx, Cuu, reg=0.0)
    x = jnp.zeros(37)
    us_opt = []
    for t in range(6):
        u = ks[0, t] + Ks[0, t] @ x
        us_opt.append(u)
        x = A[0, t] @ x + Bm[0, t] @ u
    us_opt = jnp.stack(us_opt)
    c_opt = float(cost_of(us_opt))
    for seed in range(3):
        du = 0.1 * jax.random.normal(jax.random.PRNGKey(seed), us_opt.shape)
        assert c_opt <= float(cost_of(us_opt + du)) + 1e-5


def _stand_setup(substeps=2, H=3):
    frames = np.zeros((240, 19), dtype=np.float32)
    frames[:, 2] = 0.33
    frames[:, 6] = 1.0
    frames[:, 7:] = np.asarray(STAND)
    clips = motion_lib.pack_clips([frames], frame_step=1.0 / 120.0)
    params = engine.PhysicsParams(substeps=substeps)
    s0 = RobotState(
        base_pos=jnp.asarray([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=STAND,
        joint_vel=jnp.zeros(12, jnp.float32),
    )
    return clips, params, s0, H


@pytest.mark.slow
def test_ilqr_batch_matches_single():
    clips, params, s0, H = _stand_setup()
    step_fn, cost_fn = ilqr.make_problem(
        MODEL, params, clips, jnp.asarray(0), jnp.asarray(0.0)
    )
    x0 = ilqr.flatten_state(s0)
    cfg = ilqr.ILQRConfig(iterations=2)
    us = jnp.stack([jnp.full((H, 12), 0.25), jnp.full((H, 12), -0.15)])
    x0b = jnp.broadcast_to(x0, (2, 37))
    u_b, info = ilqr.ilqr_solve_batch(step_fn, cost_fn, x0b, us, cfg,
                                      use_pallas=False)
    for s in range(2):
        u_s, info_s = ilqr.ilqr_solve(step_fn, cost_fn, x0, us[s], cfg)
        # reg enters via (Cuu + reg I) + B'VB in the batch vs
        # Cuu + B'VB + reg I in the single path: f32 reassociation drift
        # amplified through two iterations of contact physics
        np.testing.assert_allclose(np.asarray(u_b[s]), np.asarray(u_s),
                                   rtol=5e-3, atol=1e-5)
        np.testing.assert_allclose(float(info["final_cost"][s]),
                                   float(info_s["final_cost"]), rtol=1e-3)
    fin, ini = np.asarray(info["final_cost"]), np.asarray(info["initial_cost"])
    assert (fin <= ini).all()  # iLQR never accepts a worse sequence
    assert (fin < ini).any()  # and the bad seed does get polished


@pytest.mark.slow
def test_ilqr_batch_pallas_path_runs():
    clips, params, s0, H = _stand_setup()
    step_fn, cost_fn = ilqr.make_problem(
        MODEL, params, clips, jnp.asarray(0), jnp.asarray(0.0)
    )
    x0b = jnp.broadcast_to(ilqr.flatten_state(s0), (2, 37)).astype(jnp.float32)
    us = jnp.stack([jnp.full((H, 12), 0.25), jnp.full((H, 12), -0.15)],
                   ).astype(jnp.float32)
    cfg = ilqr.ILQRConfig(iterations=1)
    u_p, info_p = ilqr.ilqr_solve_batch(step_fn, cost_fn, x0b, us, cfg,
                                        use_pallas=True)
    u_r, info_r = ilqr.ilqr_solve_batch(step_fn, cost_fn, x0b, us, cfg,
                                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_r),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_hybrid_controller_beats_mppi_seed():
    """The refined sequence must cost no more than its MPPI seed under the
    smooth cost, and the controller must run closed-loop."""
    clips, params, s0, H = _stand_setup(substeps=2, H=4)
    c = B.tl_constants(MODEL)
    mcfg = mppi.MPPIConfig(horizon=H, population=128, iterations=1)
    icfg = ilqr.ILQRConfig(iterations=1)
    ctrl = hybrid.make_hybrid_controller(
        MODEL, c, params, clips, mcfg, icfg, n_refine=3, use_pallas=False
    )
    key = jax.random.PRNGKey(0)
    u_warm = jnp.zeros((H, 4, 3), jnp.float32)
    u_exec, u_next, diag = ctrl(key, s0, jnp.asarray(0), jnp.asarray(0.0),
                                u_warm)
    assert u_exec.shape == (12,)
    assert np.isfinite(float(diag["refined_cost"]))
    # iLQR keeps the seed on no-improvement, so min refined cost <= every
    # scenario's initial cost is not guaranteed — but the best refined cost
    # must be <= the best initial (seed) cost.
    step_fn, cost_fn = ilqr.make_problem(
        MODEL, params, clips, jnp.asarray(0), jnp.asarray(0.0)
    )
    # reconstruct seeds: weighted u + top-3 — rerun the mppi stage
    from lifelike_tpu.solver import rollout_tl
    ref = rollout_tl.precompute_reference(
        MODEL, clips, jnp.asarray(0), jnp.asarray(0.0), H,
        params.dt * params.substeps,
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], s0))
    u_opt, d2 = mppi_tl.mppi_step(c, params, mcfg, key, tl,
                                  u_warm, ref, return_topk=3)
    us = jnp.concatenate([u_opt[None], d2["u_topk"]]).reshape(4, H, 12)
    x0 = ilqr.flatten_state(s0)
    seed_costs = jax.vmap(
        lambda u: ilqr._rollout(step_fn, cost_fn, x0, u)[2]
    )(us)
    assert float(diag["refined_cost"]) <= float(jnp.min(seed_costs)) + 1e-5
