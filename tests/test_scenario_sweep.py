"""Pod-scale SEPMC scenario sweep (BASELINE config 5) on the virtual mesh.

Scenarios are independent, so the sharded sweep must agree exactly with the
local vmapped sweep — per-scenario solves never communicate; only the
summary statistics ride ICI.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.parallel import mesh as meshlib
from lifelike_tpu.parallel import scenario_sweep
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import arena_gen
from lifelike_tpu.solver import mppi

MODEL = build_max_model()
PARAMS = engine.PhysicsParams(kd=1.0, max_tau=16.0, substeps=2)
CFG = mppi.MPPIConfig(horizon=3, population=32, iterations=1, sigma=0.15)


def _scenarios(n):
    return scenario_sweep.generate_scenarios(
        jax.random.PRNGKey(7), n,
        arena_gen.ArenaConfig(rand_cube=True), dtype=jnp.float64,
    )


def test_generate_scenarios_shapes_and_randomization():
    scen = _scenarios(4)
    # rand_cube tables are sized to what the config can populate
    # (4 walls + 6 cube slots); structurally-empty rows are not carried
    assert scen.scene.center.shape == (4, 10, 3)
    assert scen.robots.base_pos.shape == (4, 2, 3)
    assert scen.flag_pos.shape == (4, 3)
    # exactly one chaser per scenario, role randomized across scenarios
    # (reference chase_tag reset: with_flag = np.random.randint(0, 2))
    assert np.all(np.asarray(scen.with_flag[:, 0] ^ scen.with_flag[:, 1]))
    # robots start on opposite halves, inside the walls
    assert np.all(np.asarray(scen.robots.base_pos[:, 0, 0]) < 0)
    assert np.all(np.asarray(scen.robots.base_pos[:, 1, 0]) > 0)
    assert np.all(np.abs(np.asarray(scen.robots.base_pos[..., :2])) < 2.5)
    # arenas differ across scenarios (randomized cubes)
    assert not np.allclose(
        np.asarray(scen.scene.center[0]), np.asarray(scen.scene.center[1])
    )


@pytest.mark.slow
def test_local_sweep_improves_over_zero_controls():
    scen = _scenarios(2)
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)

    u, cost = jax.jit(
        lambda k, s: scenario_sweep.sweep_scenarios(c, PARAMS, CFG, k, s)
    )(key, scen)
    assert u.shape == (2, 2, CFG.horizon, 4, 3)
    assert cost.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(cost)))

    # the solved sequences must beat the zero-control warm start they
    # improved on: re-score both through the same deterministic rollout
    from lifelike_tpu.physics import engine_tl
    from lifelike_tpu.solver import rollout_tasks

    def score(scen_i, u_pair, i):
        sc = jax.tree.map(lambda x: x[i], scen_i)
        ts = engine_tl.tl_scene(sc.scene)
        states = [
            B.tl_from_state(jax.tree.map(lambda x, r=r: x[r][None], sc.robots))
            for r in (0, 1)
        ]
        total = 0.0
        for r in (0, 1):
            opp = rollout_tasks.rollout_plan(
                c, PARAMS, states[1 - r], u_pair[i, 1 - r], ts
            )
            cc, _ = rollout_tasks.rollout_chase(
                c, PARAMS, states[r], u_pair[i, r][..., None, None], ts,
                opp, sc.flag_pos, sc.with_flag[r],
            )
            total += float(cc[0, 0])
        return total

    zeros = jnp.zeros_like(u)
    for i in range(2):
        # MPPI's exponentially-weighted average of noisy candidates is NOT
        # guaranteed to beat the nominal in a deterministic re-rollout, so
        # this is seed-sensitive; allow headroom rather than exact dominance.
        z = score(scen, zeros, i)
        assert score(scen, u, i) < z + 0.1 * abs(z) + 0.05


@pytest.mark.slow
def test_sharded_sweep_matches_local_vmap():
    assert len(jax.devices()) == 8, jax.devices()
    mesh = meshlib.make_mesh(8)
    scen = _scenarios(8)
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    key = jax.random.PRNGKey(3)

    u_l, cost_l = jax.jit(
        lambda k, s: scenario_sweep.sweep_scenarios(c, PARAMS, CFG, k, s)
    )(key, scen)
    u_s, cost_s, summary = jax.jit(
        lambda k, s: scenario_sweep.sharded_scenario_sweep(
            mesh, c, PARAMS, CFG, k, s
        )
    )(key, scen)

    # independence: per-scenario results identical up to reduction order
    np.testing.assert_allclose(
        np.asarray(cost_s), np.asarray(cost_l), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(u_s), np.asarray(u_l), rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        float(summary["mean_cost"]), float(np.mean(np.asarray(cost_l))),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        float(summary["min_cost"]), float(np.min(np.asarray(cost_l))),
        rtol=1e-10,
    )


def test_fused_sweep_matches_xla_tiled():
    """fused=True (per-scenario Pallas kernel blocks) vs the XLA tiled sweep:
    same RNG schedule, same solves to kernel-vs-XLA numerics."""
    scen = _scenarios(2)
    c = B.tl_constants(MODEL, dtype=jnp.float32)
    scen32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        scen,
    )
    key = jax.random.PRNGKey(0)
    cfg = CFG._replace(population=128)
    u_x, cost_x = jax.jit(
        lambda k, s: scenario_sweep.sweep_scenarios_tiled(
            c, PARAMS, cfg, k, s)
    )(key, scen32)
    u_f, cost_f = jax.jit(
        lambda k, s: scenario_sweep.sweep_scenarios_tiled(
            c, PARAMS, cfg, k, s, fused=True)
    )(key, scen32)
    np.testing.assert_allclose(np.asarray(cost_f), np.asarray(cost_x),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_x),
                               rtol=5e-2, atol=5e-3)
