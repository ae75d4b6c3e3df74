"""Pod-scale SEPMC scenario sweep (BASELINE.json config 5).

The reference's closest analog is the actor farm: many independent
ChaseTagGameEnv processes, each with its own randomized V4 arena
(max_game/bullet_static_entities.py:830-1019) and episodic randomization
(chase_tag_game_env.py:262-293). The TPU-native form is a DATA-PARALLEL
SCENARIO SWEEP: the scenario batch — randomized arena boxes, robot starts,
flag position, roles — lives in stacked device arrays, shards over the mesh
'batch' axis, and every chip vmaps its local scenarios through alternating-
best-response Chase-Tag solves (solver.mpc_tasks.make_chase_solver's math).

Scenarios are independent, so the sweep is embarrassingly parallel: no
collective touches the solve itself, and the only ICI traffic is the final
summary psum (mean/min best-response cost over the whole sweep). That is the
right pod-scale shape — BR solves never wait on other scenarios, and the
sweep weak-scales at ICI-negligible cost (tools/scaling_bench.py).

Multi-host runs use the same program over DCN via jax.distributed.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lifelike_tpu.parallel.mesh import BATCH_AXIS
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine_tl
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.scene import arena_gen
from lifelike_tpu.scene.boxes import BoxScene
from lifelike_tpu.solver import mppi_tl, rollout_tasks
from lifelike_tpu.solver.mppi import MPPIConfig

STAND_Q = (-0.028, -0.779, 1.687) * 4


class ScenarioBatch(NamedTuple):
    """A batch of S independent Chase-Tag scenarios (leading axis S).

    scene:     BoxScene with arrays (S, CAPACITY, 3) / (S, CAPACITY)
    robots:    RobotState with leading (S, 2) — agent axis after scenario
    flag_pos:  (S, 3)
    with_flag: (S, 2) bool — True = that robot is the chaser this round
               (reference chase_tag_game_env.py:640-652 role convention)
    """

    scene: BoxScene
    robots: RobotState
    flag_pos: jnp.ndarray
    with_flag: jnp.ndarray


def generate_scenarios(
    key,
    n: int,
    arena_cfg: arena_gen.ArenaConfig = arena_gen.ArenaConfig(rand_cube=True),
    dtype=jnp.float32,
) -> ScenarioBatch:
    """Sample n randomized scenarios: V4 arena per scenario, robots facing
    off from opposite halves (a deliberate richer spread than the reference's
    randomize_init_states, which samples both robots uniformly in +-2 with no
    separation constraint), flag uniform in the central region, and the
    chaser role (with_flag) drawn per scenario like the reference's reset
    (chase_tag_game_env.py: with_flag = np.random.randint(0, 2))."""
    k_arena, k_start, k_flag, k_role = jax.random.split(key, 4)
    scenes = jax.vmap(lambda k: arena_gen.generate(k, arena_cfg, dtype))(
        jax.random.split(k_arena, n)
    )

    ks = jax.random.split(k_start, 4)
    x0 = jax.random.uniform(ks[0], (n,), dtype, -2.0, -1.0)
    x1 = jax.random.uniform(ks[1], (n,), dtype, 1.0, 2.0)
    ys = jax.random.uniform(ks[2], (n, 2), dtype, -1.5, 1.5)
    stand = jnp.asarray(STAND_Q, dtype)
    base_pos = jnp.stack(
        [
            jnp.stack([x0, ys[:, 0], jnp.full((n,), 0.33, dtype)], axis=-1),
            jnp.stack([x1, ys[:, 1], jnp.full((n,), 0.33, dtype)], axis=-1),
        ],
        axis=1,
    )  # (n, 2, 3)
    # robot 0 faces +x, robot 1 faces -x (yaw pi): quat xyzw = (0,0,1,0)
    orn0 = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1], dtype), (n, 4))
    orn1 = jnp.broadcast_to(jnp.asarray([0, 0, 1, 0], dtype), (n, 4))
    robots = RobotState(
        base_pos=base_pos,
        base_orn=jnp.stack([orn0, orn1], axis=1),
        base_lin_vel=jnp.zeros((n, 2, 3), dtype),
        base_ang_vel=jnp.zeros((n, 2, 3), dtype),
        joint_pos=jnp.broadcast_to(stand, (n, 2, 12)),
        joint_vel=jnp.zeros((n, 2, 12), dtype),
    )
    flag = jnp.concatenate(
        [
            jax.random.uniform(k_flag, (n, 2), dtype, -2.0, 2.0),
            jnp.full((n, 1), 0.25, dtype),
        ],
        axis=-1,
    )
    chaser0 = jax.random.bernoulli(k_role, 0.5, (n,))
    with_flag = jnp.stack([chaser0, ~chaser0], axis=1)
    return ScenarioBatch(scenes, robots, flag, with_flag)


def _solve_one(c, params, cfg: MPPIConfig, n_rounds, key, scen: ScenarioBatch,
               u_warm):
    """One scenario's alternating-best-response solve (unbatched leaves —
    run under vmap). u_warm: (2, H, 4, 3). Returns (u (2,H,4,3), cost (2,))."""
    ts = engine_tl.tl_scene(scen.scene)
    states = [
        B.tl_from_state(jax.tree.map(lambda x, i=i: x[i][None], scen.robots))
        for i in (0, 1)
    ]
    u = [u_warm[0], u_warm[1]]
    cost = [jnp.zeros(()), jnp.zeros(())]
    for _ in range(n_rounds):
        for i in (0, 1):
            j = 1 - i
            opp_traj = rollout_tasks.rollout_plan(c, params, states[j], u[j], ts)

            def rollout_fn(state_k, u_cand, opp=opp_traj, role=scen.with_flag[i]):
                cc, _ = rollout_tasks.rollout_chase(
                    c, params, state_k, u_cand, ts, opp, scen.flag_pos, role
                )
                return cc

            key, k = jax.random.split(key)
            u[i], diag = mppi_tl.mppi_step(
                c, params, cfg, k, states[i], u[i], ref=None,
                rollout_fn=rollout_fn,
            )
            cost[i] = diag["best_cost"]
    return jnp.stack(u), jnp.stack(cost)


def sweep_scenarios(c, params, cfg: MPPIConfig, key, scen: ScenarioBatch,
                    u_warm=None, n_rounds: int = 1):
    """vmapped local sweep (no mesh): solve every scenario's BR round(s).

    u_warm: (S, 2, H, 4, 3) or None (zeros). Returns
    (u (S, 2, H, 4, 3), best_cost (S, 2))."""
    n = scen.flag_pos.shape[0]
    if u_warm is None:
        u_warm = jnp.zeros((n, 2, cfg.horizon, 4, 3), scen.flag_pos.dtype)
    keys = jax.random.split(key, n)
    return jax.vmap(
        lambda k, s, u: _solve_one(c, params, cfg, n_rounds, k, s, u)
    )(keys, scen, u_warm)


def _rows(x, reps):
    """Stacked per-scenario array (S, ...) -> tile-batch rows (..., S*reps, 1):
    scenario axis moved to the tile row axis, each scenario repeated reps
    times contiguously (row r belongs to scenario r // reps)."""
    y = jnp.repeat(jnp.moveaxis(x, 0, -1), reps, axis=-1)
    return y[..., None]


def _tile_scene(scene: BoxScene, reps) -> engine_tl.TLScene:
    """Stacked BoxScene (S, N, 3)/(S, N) -> per-row TLScene (N, 3, S*reps, 1)."""
    return engine_tl.TLScene(
        center=_rows(scene.center, reps),
        half=_rows(scene.half, reps),
        active=_rows(scene.active.astype(scene.center.dtype), reps),
    )


def _tile_state(robots: RobotState, reps) -> B.TLState:
    """Per-scenario single-robot RobotState (leaves (S, k)) -> TLState with
    batch rows (S*reps, 1)."""
    jp = robots.joint_pos.reshape(robots.joint_pos.shape[:-1] + (4, 3))
    jv = robots.joint_vel.reshape(jp.shape)
    return B.TLState(
        base_pos=_rows(robots.base_pos, reps),
        base_orn=_rows(robots.base_orn, reps),
        base_lin_vel=_rows(robots.base_lin_vel, reps),
        base_ang_vel=_rows(robots.base_ang_vel, reps),
        joint_pos=_rows(jp, reps),
        joint_vel=_rows(jv, reps),
    )


def _plan_traj(c, params, state_S: B.TLState, u_plan, ts_S):
    """Roll each scenario's opponent plan. u_plan (S, H, 4, 3); state_S/ts_S
    with batch rows (S, 1). Returns base trajectory (H, 3, S, 1)."""
    q0 = state_S.joint_pos

    def body(s, u_t):
        s = engine_tl.control_step(c, params, s, q0 + u_t, scene=ts_S)
        return s, s.base_pos

    u_seq = jnp.moveaxis(u_plan, 0, -1)[..., None]  # (S,H,4,3)->(H,4,3,S,1)
    _, traj = jax.lax.scan(body, state_S, u_seq)
    return traj


def sweep_scenarios_tiled(c, params, cfg: MPPIConfig, key,
                          scen: ScenarioBatch, u_warm=None,
                          n_rounds: int = 1, fused: bool = False):
    """The compiled-fast sweep: scenarios ARE tile rows, not a vmap axis.

    Each scenario's population fills (Bs, L) tiles; the S scenarios stack
    along the row axis into one (S*Bs, L) tile batch, with per-row scene
    boxes / opponent paths / flag / role constants (the SURVEY section 7
    "per-rollout scene heterogeneity as data" prescription). One physics
    scan serves the whole sweep — no vmap-of-scan nest, which the TPU
    backend compiles an order of magnitude slower.

    RNG schedule matches sweep_scenarios exactly (per-scenario fold), so
    both paths produce identical solves — pinned in
    tests/test_scenario_sweep.py.

    Returns (u (S, 2, H, 4, 3), best_cost (S, 2)).
    """
    keys = jax.random.split(key, scen.flag_pos.shape[0])
    return _tiled_from_keys(c, params, cfg, keys, scen, u_warm, n_rounds,
                            fused=fused)


def _tiled_from_keys(c, params, cfg: MPPIConfig, keys, scen: ScenarioBatch,
                     u_warm, n_rounds, fused: bool = False):
    """sweep_scenarios_tiled with per-scenario keys supplied by the caller
    (the sharded sweep passes globally-indexed key shards)."""
    S = scen.flag_pos.shape[0]
    K, H = cfg.population, cfg.horizon
    # lane choice MUST mirror mppi_tl.mppi_step's default: the documented
    # RNG parity with sweep_scenarios depends on identical noise shapes
    # (hence no lanes override here).
    lanes = 128 if K % 128 == 0 else K
    assert K % lanes == 0, (K, lanes)
    Bs = K // lanes
    if fused and (Bs % 8 != 0 or lanes != 128):
        # Mosaic requires 8-sublane row blocks; per-scenario kernel blocks
        # therefore need population >= 1024 (8 rows x 128 lanes). Smaller
        # sweeps stay on the XLA tile path.
        fused = False
    dtype = scen.flag_pos.dtype
    if u_warm is None:
        u_warm = jnp.zeros((S, 2, H, 4, 3), dtype)

    ts_rows = _tile_scene(scen.scene, Bs)
    ts_plan = _tile_scene(scen.scene, 1)
    robots = [jax.tree.map(lambda x, i=i: x[:, i], scen.robots) for i in (0, 1)]
    st_rows = [_tile_state(r, Bs) for r in robots]
    st_plan = [_tile_state(r, 1) for r in robots]
    flag_rows = _rows(scen.flag_pos, Bs)  # (3, S*Bs, 1)
    role_rows = [
        _rows(scen.with_flag[:, i].astype(dtype), Bs) for i in (0, 1)
    ]  # (S*Bs, 1) each

    if fused:
        # per-scenario kernel blocks (ops.traversal_pallas): box tables
        # (S, K, 8), constant-pose references (S, H, 64) with the per-robot
        # initial joints as target_joint (rollout_chase's q0+u nominal)
        from lifelike_tpu.ops import scalar_phys, traversal_pallas
        from lifelike_tpu.robot.model import build_max_model

        sm = scalar_phys.build_scalar_model(build_max_model())
        act = scen.scene.active.astype(dtype)[..., None]
        boxes_s = jnp.concatenate(
            [scen.scene.center, scen.scene.half, act,
             jnp.zeros_like(act)], axis=-1
        )  # (S, K, 8)
        refs = [
            jnp.zeros((S, H, 64), dtype).at[:, :, :12].set(
                robots[i].joint_pos[:, None, :]
            )
            for i in (0, 1)
        ]
        flag_s = scen.flag_pos[:, :2]
        role_s = [scen.with_flag[:, i].astype(dtype) for i in (0, 1)]

    def _noise(keys_s):
        """Per-scenario AR(1) noise with sweep_scenarios' exact draw:
        (S,) keys -> (H, 4, 3, S*Bs, L)."""
        eps = jax.vmap(
            lambda k: mppi_tl._smooth_noise_tl(k, (H, 4, 3, Bs, lanes),
                                               cfg.beta, dtype)
        )(keys_s)  # (S, H, 4, 3, Bs, L)
        return jnp.moveaxis(eps, 0, -3).reshape(H, 4, 3, S * Bs, lanes)

    u = [u_warm[:, 0], u_warm[:, 1]]
    cost_out = [jnp.zeros((S,), dtype), jnp.zeros((S,), dtype)]
    for _ in range(n_rounds):
        for i in (0, 1):
            j = 1 - i
            if fused:
                opp = traversal_pallas.rollout_plan_fused(
                    sm, params, st_plan[j], u[j], boxes_s, refs[j]
                )  # (H, 3, S, 1)
                opp_sc = jnp.moveaxis(opp[..., 0], 2, 0)[..., :2]  # (S,H,2)
            else:
                opp = _plan_traj(c, params, st_plan[j], u[j], ts_plan)
            opp_rows = jnp.repeat(opp, Bs, axis=2)  # (H, 3, S*Bs, 1)

            split = jax.vmap(jax.random.split)(keys)  # (S, 2, key)
            keys, k_solve = split[:, 0], split[:, 1]
            k_iters = jax.vmap(
                lambda k: jax.random.split(k, cfg.iterations)
            )(k_solve)  # (S, iterations) keys
            state_k = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x, x.shape[:-2] + (S * Bs, lanes)), st_rows[i]
            )
            for it in range(cfg.iterations):
                noise = cfg.sigma * _noise(k_iters[:, it])
                u_rows = _rows(u[i], Bs)  # (H,4,3) rows: (H,4,3,S*Bs,1)
                u_cand = u_rows + noise  # (H, 4, 3, S*Bs, L)
                if fused:
                    total_cost = traversal_pallas.rollout_chase_fused(
                        sm, params, state_k, u_cand, boxes_s, refs[i],
                        opp_sc, flag_s, role_s[i], gait_weight=0.0,
                    )  # (S*Bs, L)
                else:
                    total_cost, _ = rollout_tasks.rollout_chase(
                        c, params, state_k, u_cand, ts_rows, opp_rows,
                        flag_rows, role_rows[i],
                    )  # (S*Bs, L)

                cg = total_cost.reshape(S, Bs * lanes)
                c_min = jnp.min(cg, axis=1, keepdims=True)
                w = jax.nn.softmax(-(cg - c_min) / cfg.temperature, axis=1)
                uc = u_cand.reshape(H, 4, 3, S, Bs * lanes)
                u_new = jnp.einsum("hjksp,sp->shjk", uc, w)
                u[i] = u_new.astype(dtype)
                cost_out[i] = c_min[:, 0]
    return jnp.stack(u, axis=1), jnp.stack(cost_out, axis=1)


def sharded_scenario_sweep(mesh: Mesh, c, params, cfg: MPPIConfig, key,
                           scen: ScenarioBatch, u_warm=None,
                           n_rounds: int = 1):
    """The pod-scale sweep: scenario axis sharded over mesh axis 'batch',
    each device running the TILED sweep on its local scenario shard.

    Per-scenario results stay sharded (u (S,2,H,4,3), best_cost (S,2));
    the summary dict {mean_cost, min_cost} is psum/pmin-reduced over ICI.
    Scenario count S must divide evenly over the mesh. The per-scenario RNG
    is keyed by GLOBAL scenario index, so results are independent of the
    mesh size and equal to the unsharded sweep.
    """
    n = scen.flag_pos.shape[0]
    n_dev = mesh.shape[BATCH_AXIS]
    assert n % n_dev == 0, (n, n_dev)
    if u_warm is None:
        u_warm = jnp.zeros((n, 2, cfg.horizon, 4, 3), scen.flag_pos.dtype)
    keys = jax.random.split(key, n)

    def local(keys_l, scen_l, u_l):
        u, cost = _tiled_from_keys(
            c, params, cfg, keys_l, scen_l, u_l, n_rounds
        )
        mean_c = jax.lax.pmean(jnp.mean(cost), BATCH_AXIS)
        min_c = jax.lax.pmin(jnp.min(cost), BATCH_AXIS)
        return u, cost, mean_c, min_c

    sharded = P(BATCH_AXIS)
    u, cost, mean_c, min_c = shard_map(
        local,
        mesh=mesh,
        in_specs=(sharded, jax.tree.map(lambda _: sharded, scen), sharded),
        out_specs=(sharded, sharded, P(), P()),
        check_vma=False,
    )(keys, scen, u_warm)
    return u, cost, {"mean_cost": mean_c, "min_cost": min_c}
