"""EPMC/SEPMC MPC solves: cost parity and solver improvement.

Pins (1) tile-layout task costs == batch-leading oracles (costs/traversal,
costs/chase), (2) the zero-shaping cost == the negated env reward (the env is
the behavioral spec, reference playground_env.py:479-539), and (3) MPPI over
the terrain/chase rollouts actually improves cost / closes distance on
randomized scenes — the integration the round-1 review flagged as missing.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.costs import chase as chase_costs
from lifelike_tpu.costs import traversal as trav_costs
from lifelike_tpu.envs import playground
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine, engine_tl
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import playground_gen
from lifelike_tpu.solver import mpc_tasks, rollout_tasks
from lifelike_tpu.solver.mppi import MPPIConfig

MODEL = build_max_model()
rng = np.random.default_rng(23)


def _rand_states(n):
    yaw = rng.uniform(0, 2 * np.pi, size=n)
    q = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    return RobotState(
        base_pos=jnp.asarray(rng.normal(size=(n, 3)) * 0.5 + [0, 0, 0.35]),
        base_orn=jnp.asarray(q),
        base_lin_vel=jnp.asarray(rng.normal(size=(n, 3))),
        base_ang_vel=jnp.asarray(rng.normal(size=(n, 3)) * 0.5),
        joint_pos=jnp.asarray(rng.uniform(-1, 1, size=(n, 12))),
        joint_vel=jnp.asarray(rng.normal(size=(n, 12))),
    )


def test_joystick_cost_tile_matches_oracle():
    n = 8
    s = _rand_states(n)
    tgt = jnp.asarray(rng.normal(size=(3,)) * 4.0)
    spd = 1.5
    c_oracle = trav_costs.joystick_cost(s, tgt, spd)
    tl = B.tl_from_state(s, batch2d=(2, 4))
    c_tile = rollout_tasks.joystick_cost_tl(tl, tgt[:, None, None], spd)
    np.testing.assert_allclose(
        np.asarray(c_oracle), np.asarray(c_tile).reshape(-1),
        rtol=1e-6, atol=1e-8,
    )


def test_zero_shaping_cost_is_negated_env_reward():
    """With shaping/fall off, joystick stage cost == 1 - reward*max_steps
    where reward is the env's _compute_joystick_reward output."""
    cfg = playground.PlaygroundConfig(
        scene=playground_gen.PlaygroundConfig(element_id=0)
    )
    key = jax.random.PRNGKey(0)
    s, _ = playground.reset(MODEL, cfg, key)
    a = jnp.zeros(12)
    s2, _, r, _, _ = playground.step(MODEL, cfg, s, a, jax.random.PRNGKey(1))
    w0 = trav_costs.TraversalWeights(velocity=0.0, heading=0.0, fall=0.0)
    cost = trav_costs.joystick_cost(s2.robot, s2.target_pos, s2.target_spd, w0)
    np.testing.assert_allclose(
        float(cost), 1.0 - float(r) * cfg.max_steps, rtol=1e-5
    )


def test_chase_costs_tile_match_oracle():
    n = 8
    s = _rand_states(n)
    opp = jnp.asarray(rng.normal(size=(3,)) * 3.0)
    flag = jnp.asarray(rng.normal(size=(3,)) * 2.0)
    tl = B.tl_from_state(s, batch2d=(2, 4))
    c_ch_o = chase_costs.chaser_cost(s, opp)
    c_ch_t = rollout_tasks.chaser_cost_tl(tl, opp[:, None, None])
    np.testing.assert_allclose(
        np.asarray(c_ch_o), np.asarray(c_ch_t).reshape(-1),
        rtol=1e-6, atol=1e-8,
    )
    c_es_o = chase_costs.escapee_cost(s, opp, flag)
    c_es_t = rollout_tasks.escapee_cost_tl(tl, opp[:, None, None], flag[:, None, None])
    np.testing.assert_allclose(
        np.asarray(c_es_o), np.asarray(c_es_t).reshape(-1),
        rtol=1e-6, atol=1e-8,
    )


def test_clearance_cost_tile_matches_oracle():
    scene = playground_gen.generate(
        jax.random.PRNGKey(3), playground_gen.PlaygroundConfig(element_id=1)
    )
    n = 8
    s = _rand_states(n)
    c_o = trav_costs.clearance_cost(scene, s)
    tl = B.tl_from_state(s, batch2d=(2, 4))
    ts = engine_tl.tl_scene(scene)
    c_t = rollout_tasks.clearance_cost_tl(ts, tl.base_pos)
    np.testing.assert_allclose(
        np.asarray(c_o), np.asarray(c_t).reshape(-1),
        rtol=1e-6, atol=1e-8,
    )


def _stand_robot(pos=(0.0, 0.0, 0.33), yaw=0.0):
    jq = jnp.asarray(
        [-0.0278, -0.7790, 1.6873, -0.0276, -0.7777, 1.6838,
         -0.0278, -0.7334, 1.5669, -0.0276, -0.7319, 1.5632]
    )
    return RobotState(
        base_pos=jnp.asarray(pos, jnp.float64),
        base_orn=jnp.asarray(
            [0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)], jnp.float64
        ),
        base_lin_vel=jnp.zeros(3, jnp.float64),
        base_ang_vel=jnp.zeros(3, jnp.float64),
        joint_pos=jq.astype(jnp.float64),
        joint_vel=jnp.zeros(12, jnp.float64),
    )


def test_traversal_solve_improves_cost():
    """MPPI on a randomized hurdle scene must beat the zero-control plan."""
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    params = engine.PhysicsParams(kd=1.0, max_tau=16.0)
    scene = playground_gen.generate(
        jax.random.PRNGKey(5), playground_gen.PlaygroundConfig(element_id=1)
    )
    robot = _stand_robot()
    tgt = scene.target_pos
    H, pop = 6, 64
    sub = None

    sub_scene = engine_tl.tl_scene(
        jax.tree.map(lambda x: x,  # full scene: capacity is fine on CPU test
                     scene)
    )
    tl = mpc_tasks._tl_single(robot)

    def total_cost(u):  # u: (H, 4, 3, Bs, L)
        cost, _ = rollout_tasks.rollout_traversal(
            c, params, jax.tree.map(
                lambda x: jnp.broadcast_to(x, x.shape[:-2] + u.shape[-2:]), tl
            ),
            u, sub_scene, tgt, 1.5, "joystick",
        )
        return cost

    zero = total_cost(jnp.zeros((H, 4, 3, 1, 1)))
    mcfg = MPPIConfig(horizon=H, population=pop, iterations=2, sigma=0.15)
    ctrl = mpc_tasks.make_traversal_controller(MODEL, c, params, mcfg)
    u_exec, u_next, diag = ctrl(
        jax.random.PRNGKey(7), robot, scene, tgt, 1.5, jnp.zeros((H, 4, 3))
    )
    assert float(diag["best_cost"]) < float(zero[0, 0]), (
        diag["best_cost"], zero,
    )
    assert np.all(np.isfinite(np.asarray(u_exec)))


@pytest.mark.slow
def test_chase_solver_closes_distance():
    """Chaser's optimized plan must end nearer a standing opponent than the
    zero plan; escapee's must end farther."""
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    params = engine.PhysicsParams(kd=1.0, max_tau=16.0, substeps=10)
    from lifelike_tpu.scene import arena_gen

    scene = arena_gen.generate(jax.random.PRNGKey(1), arena_gen.ArenaConfig())
    ts = engine_tl.tl_scene(scene)
    # chaser at origin facing the opponent at +x
    chaser = _stand_robot(pos=(-1.0, 0.0, 0.33), yaw=0.0)
    escapee = _stand_robot(pos=(1.0, 0.0, 0.33), yaw=0.0)
    robots = jax.tree.map(
        lambda a, b: jnp.stack([a, b]), chaser, escapee
    )
    H = 8
    mcfg = MPPIConfig(horizon=H, population=64, iterations=2, sigma=0.15)
    solver = mpc_tasks.make_chase_solver(MODEL, c, params, mcfg,
                                         n_best_response=1)
    flag = jnp.asarray([0.0, 2.0, 0.25], jnp.float64)
    with_flag = jnp.asarray([True, False])
    u_exec, u_next, _ = solver(
        jax.random.PRNGKey(9), robots, scene, flag, with_flag,
        jnp.zeros((2, H, 4, 3)),
    )
    # roll each optimized plan and the zero plan; compare final distances
    def final_pos(robot, plan):
        tl = mpc_tasks._tl_single(robot)
        traj = rollout_tasks.rollout_plan(c, params, tl, plan, ts)
        return traj[-1, :, 0, 0]

    opp0 = escapee.base_pos
    d_opt = jnp.linalg.norm((final_pos(chaser, u_next[0]) - opp0)[:2])
    d_zero = jnp.linalg.norm(
        (final_pos(chaser, jnp.zeros((H, 4, 3))) - opp0)[:2]
    )
    assert float(d_opt) < float(d_zero), (d_opt, d_zero)

    chas0 = chaser.base_pos
    e_opt = jnp.linalg.norm((final_pos(escapee, u_next[1]) - chas0)[:2])
    e_zero = jnp.linalg.norm(
        (final_pos(escapee, jnp.zeros((H, 4, 3))) - chas0)[:2]
    )
    assert float(e_opt) > float(e_zero), (e_opt, e_zero)


def test_corridor_prune_sees_obstacle_ahead():
    """Horizon-exit regression: the nearest obstacles at solve time are
    BEHIND the robot; a hurdle ~2 m ahead must still enter the pruned
    contact set (nearest_boxes_corridor), where plain nearest_boxes
    drops it."""
    from lifelike_tpu.scene import boxes

    k = 8
    n_clutter = 12
    ang = np.linspace(0, 2 * np.pi, n_clutter, endpoint=False)
    # clutter ring 0.6 m behind/around the robot, plus a hurdle at x=+2
    centers = np.stack([
        -0.6 + 0.1 * np.cos(ang), 0.1 * np.sin(ang), np.full(n_clutter, 0.05)
    ], -1)
    hurdle = np.array([[2.0, 0.0, 0.15]])
    center = jnp.asarray(np.concatenate([centers, hurdle]))
    half = jnp.concatenate([
        jnp.full((n_clutter, 3), 0.05),
        jnp.asarray([[0.05, 1.0, 0.15]]),
    ])
    scene = boxes.BoxScene(
        center=center, half=half,
        active=jnp.ones(n_clutter + 1, bool),
        target_pos=jnp.asarray([4.0, 0.0, 0.0]),
    )
    pos = jnp.asarray([0.0, 0.0, 0.33])

    old = boxes.nearest_boxes(scene, pos, k)
    # hurdle (x ~= 2) absent from the position-ranked set
    assert not bool(jnp.any(jnp.abs(old.center[:, 0] - 2.0) < 1e-6))

    p1 = jnp.asarray([3.0, 0.0, 0.33])  # 3 m/s * H=50 * 20 ms corridor
    cor = boxes.nearest_boxes_corridor(scene, pos, p1, k)
    sel = jnp.abs(cor.center[:, 0] - 2.0) < 1e-6
    assert bool(jnp.any(sel & cor.active))

    # and the traversal controller's rollouts actually FEEL an obstacle that
    # only corridor pruning selects: clutter behind fills the k-nearest set,
    # a hurdle 0.35 m ahead deflects the solve (the robot enters it within
    # the H=8 x 10-substep horizon at 3 m/s). With position-ranked pruning
    # the hurdle would be invisible and both costs identical.
    near = scene._replace(
        center=scene.center.at[-1, 0].set(0.35),
        target_pos=jnp.asarray([2.0, 0.0, 0.0]),
    )
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    params = engine.PhysicsParams(kd=1.0, max_tau=16.0, substeps=10)
    mcfg = MPPIConfig(horizon=8, population=32, iterations=1, sigma=0.15)
    ctrl = mpc_tasks.make_traversal_controller(MODEL, c, params, mcfg,
                                               contact_k=k)
    robot = _stand_robot()
    robot = robot._replace(
        base_lin_vel=robot.base_lin_vel.at[0].set(3.0)
    )
    no_hurdle = near._replace(active=near.active.at[-1].set(False))
    _, _, diag_h = ctrl(jax.random.PRNGKey(0), robot, near,
                        near.target_pos, 3.0, jnp.zeros((8, 4, 3)))
    _, _, diag_f = ctrl(jax.random.PRNGKey(0), robot, no_hurdle,
                        near.target_pos, 3.0, jnp.zeros((8, 4, 3)))
    assert float(diag_h["best_cost"]) != float(diag_f["best_cost"])
