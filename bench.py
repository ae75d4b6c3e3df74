"""Benchmark: batched H=50 MPC solve latency on the available accelerator.

Default: prints the FULL BASELINE matrix, one JSON line
{"metric", "value", "unit", "vs_baseline"} per row, with the headline PMC
tracking solve (BASELINE.json config 1/2) printed FIRST (early signal) and
re-printed LAST (so both first-line and last-line parsers of the driver
record the headline). BENCH_ALL=0 restores the single headline line. Rows:

  pmc          tracking solve, real mocap clip, sampling physics
               (mass_freeze=substeps — mass/Schur refactored once per control
               step; fidelity vs exact <=1e-2 rad transient, see
               tests/test_batched_layout.py::test_mass_freeze_fidelity)
  pmc_exact    same with mass_freeze=1 (exact per-substep factorization)
  pmc_rate     solves/s/chip derived from the headline latency
  epmc         terrain-traversal solve on a randomized hurdle scene with box
               SDF contact (BASELINE.json config 3)
  sepmc        two-robot Chase-Tag alternating-best-response solve in the V4
               arena (BASELINE.json config 4); per-robot population pop/2
  sepmc_sweep  pod-scale SEPMC scenario sweep (BASELINE.json config 5):
               BENCH_SWEEP_S randomized arenas x one BR round each, vmapped
               on this chip — the per-shard slice of
               parallel.scenario_sweep.sharded_scenario_sweep
  hybrid       MPPI->iLQR hybrid (sampling + Pallas-Riccati SQP polish of the
               weighted u + top-7 candidates): latency row + relative
               cost-improvement row vs the pure-MPPI seed
  impulse      hard-contact fidelity mode (physics/impulse.py, the PGS
               solver that meets the 1e-2 rad criterion): ms per 10-substep
               control step at a small batch — sequential-solver-bound by
               construction, NOT a sampling path
  scaling      weak-scaling rows on the virtual CPU mesh + the 2-process
               jax.distributed pod row (BASELINE scaling config; subprocess,
               BENCH_SCALING=0 to skip)

The north-star target (BASELINE.md) is >=4096 parallel H=50 rollouts per MPC
solve at <10 ms p50 on TPU; vs_baseline = target_ms / measured_ms, so values
> 1.0 beat the target.

Timing method: the axon TPU tunnel adds a ~24 ms host<->device round trip to
any synchronous call, and `block_until_ready` can ACK before device completion
— so single-call wall times are meaningless here. We therefore time M
data-dependent solves chained inside ONE jitted program (each solve warm-
starts from the previous one, exactly the receding-horizon pattern) for
THREE values of M and report the least-squares slope: pure per-solve device
latency, RTT excluded (see _slope_ms — the round-4 two-point slope flipped
sign on RTT jitter; the fit + positivity guard fixes that). Each program
takes the trip count as a traced scalar, so all chain lengths share one
compile. Override sizes with env vars BENCH_POP, BENCH_HORIZON,
BENCH_SUBSTEPS, BENCH_REPS, BENCH_M.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REAL_CLIP = "/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt"
TARGET_MS = 10.0


def _stand_state():
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    from lifelike_tpu.physics.dynamics import RobotState

    return RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand,
        joint_vel=jnp.zeros(12, jnp.float32),
    )


def _slope_ms(make_chained, args, reps, m_hi, _retry=True):
    """Per-solve latency via a least-squares fit of wall time vs chain
    length (RTT excluded).

    Wall time at chain length M is t(M) ~= RTT + M * per_solve, so the
    fitted slope is the pure per-solve device latency. Round-4 lesson: a
    TWO-point slope at ~3 ms/solve flipped sign on a single ~20 ms
    tunnel-RTT excursion and the driver recorded a negative headline
    latency. Now: min-of-reps wall times at M in {1, m_hi, 4*m_hi},
    least-squares slope over the three points, slope > 0 enforced with one
    retry at doubled chain lengths, and the amortized upper bound
    t(M_max)/M_max (positive by construction, RTT/M_max-inflated) as the
    last resort. Every make_chained(M) shares ONE jitted program with a
    traced trip count, so the extra fit point costs no extra compile.
    """

    def wall_ms(f):
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0])  # warmup + true sync (host fetch)
        ts = []
        for _ in range(reps):
            t_s = time.perf_counter()
            r = f(*args)
            np.asarray(jax.tree.leaves(r)[0])
            ts.append(time.perf_counter() - t_s)
        return float(np.min(ts) * 1e3)

    m_pts = sorted({1, m_hi, 4 * m_hi})
    ws = [wall_ms(make_chained(m)) for m in m_pts]
    slope = float(np.polyfit(m_pts, ws, 1)[0])
    if slope <= 0.0:
        if _retry:
            return _slope_ms(make_chained, args, reps, 2 * m_hi,
                             _retry=False)
        slope = ws[-1] / m_pts[-1]
    return slope


def bench_pmc(pop, horizon, substeps, reps, m_hi, mass_freeze, fused, bs_tile):
    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi, mppi_tl, rollout_tl

    model = build_max_model()
    real = os.path.exists(REAL_CLIP) and not int(os.environ.get("BENCH_SYN", 0))
    if real:
        clips = motion_lib.load_clips(REAL_CLIP)
    else:
        clips = motion_lib.pack_clips(
            [motion_lib.make_synthetic_clip(int(120 * (horizon / 50.0 + 3)))],
            frame_step=1.0 / 120.0,
        )
    params = engine.PhysicsParams(substeps=substeps, mass_freeze=mass_freeze)
    cfg = mppi.MPPIConfig(horizon=horizon, population=pop, iterations=1)
    c = B.tl_constants(model, dtype=jnp.float32)
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], _stand_state()))
    policy_dt = params.dt * params.substeps

    if fused:
        from lifelike_tpu.ops import rollout_pallas, scalar_phys

        sm = scalar_phys.build_scalar_model(model)

    @jax.jit
    def f(key, tl_state, u_warm, t0, M):
        def body(i, carry):
            uw, _ = carry
            k = jax.random.fold_in(key, i)
            ref = rollout_tl.precompute_reference(
                model, clips, jnp.asarray(0), t0, horizon, policy_dt
            )
            rollout_fn = None
            if fused:
                rollout_fn = lambda sk, uc: (
                    rollout_pallas.rollout_tracking_fused(
                        sm, params, sk, uc, ref, bs_tile=bs_tile
                    )
                )
            u_opt, diag = mppi_tl.mppi_step(
                c, params, cfg, k, tl_state, uw, ref,
                rollout_fn=rollout_fn,
            )
            return u_opt, diag["best_cost"]

        return jax.lax.fori_loop(
            0, M, body, (u_warm, jnp.asarray(0.0, jnp.float32))
        )

    def chained(M):
        return lambda *a: f(*a, jnp.asarray(M, jnp.int32))

    args = (
        jax.random.PRNGKey(0),
        tl,
        jnp.zeros((horizon, 4, 3), jnp.float32),
        jnp.asarray(0.5, jnp.float32),
    )
    ms = _slope_ms(chained, args, reps, m_hi)
    tag = "" if real else "_syn"
    return f"mpc_solve_latency_pop{pop}_H{horizon}_sub{substeps}{tag}", ms


def bench_hybrid(pop, horizon, substeps, reps, m_hi, mass_freeze, fused,
                 n_refine=7, ilqr_iters=1):
    """MPPI->iLQR hybrid solve: latency + smooth-cost improvement over the
    pure-MPPI weighted u (BASELINE north_star 'sampling+SQP hybrid').

    Returns (name, ms, improvement) where improvement is the mean relative
    cost reduction of the refined sequence vs its MPPI seed."""
    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import hybrid, ilqr, mppi, mppi_tl, rollout_tl

    model = build_max_model()
    real = os.path.exists(REAL_CLIP) and not int(os.environ.get("BENCH_SYN", 0))
    if real:
        clips = motion_lib.load_clips(REAL_CLIP)
    else:
        clips = motion_lib.pack_clips(
            [motion_lib.make_synthetic_clip(int(120 * (horizon / 50.0 + 3)))],
            frame_step=1.0 / 120.0,
        )
    params = engine.PhysicsParams(substeps=substeps, mass_freeze=mass_freeze)
    cfg = mppi.MPPIConfig(horizon=horizon, population=pop, iterations=1)
    icfg = ilqr.ILQRConfig(
        iterations=ilqr_iters,
        lin_substeps=int(os.environ.get("BENCH_LIN_SUBSTEPS",
                                        ilqr.ILQRConfig().lin_substeps)),
    )
    c = B.tl_constants(model, dtype=jnp.float32)
    state = _stand_state()
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], state))
    policy_dt = params.dt * params.substeps
    if fused:
        from lifelike_tpu.ops import rollout_pallas, scalar_phys

        sm = scalar_phys.build_scalar_model(model)

    @jax.jit
    def f(key, tl_state, u_warm, t0, M):
        def body(i, carry):
            uw, _, _ = carry
            k = jax.random.fold_in(key, i)
            ref = rollout_tl.precompute_reference(
                model, clips, jnp.asarray(0), t0, horizon, policy_dt
            )
            rollout_fn = None
            if fused:
                rollout_fn = lambda sk, uc: (
                    rollout_pallas.rollout_tracking_fused(
                        sm, params, sk, uc, ref
                    )
                )
            u_opt, diag = mppi_tl.mppi_step(
                c, params, cfg, k, tl_state, uw, ref,
                rollout_fn=rollout_fn, return_topk=n_refine,
            )
            us = jnp.concatenate(
                [u_opt[None], diag["u_topk"]], axis=0
            ).reshape(n_refine + 1, horizon, 12)
            u_best, cost_best, info = hybrid.refine_candidates(
                model, params, clips, jnp.asarray(0), t0, state, us, icfg
            )
            imp = (info["initial_cost"][0] - cost_best) / jnp.maximum(
                info["initial_cost"][0], 1e-6
            )
            return (u_best.reshape(horizon, 4, 3), imp, cost_best)

        return jax.lax.fori_loop(
            0, M, body,
            (u_warm, jnp.asarray(0.0, jnp.float32),
             jnp.asarray(0.0, jnp.float32)),
        )

    def chained(M):
        return lambda *a: f(*a, jnp.asarray(M, jnp.int32))

    args = (
        jax.random.PRNGKey(0),
        tl,
        jnp.zeros((horizon, 4, 3), jnp.float32),
        jnp.asarray(0.5, jnp.float32),
    )
    ms = _slope_ms(chained, args, reps, m_hi)
    imp = float(np.asarray(chained(4)(*args)[1]))
    tag = "" if real else "_syn"
    return (
        f"hybrid_solve_latency_pop{pop}_H{horizon}_r{n_refine + 1}{tag}",
        ms, imp,
    )


def bench_epmc(pop, horizon, substeps, reps, m_hi, mass_freeze, contact_k=16,
               fused=False, bs_tile=None):
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine, engine_tl
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.scene import boxes, playground_gen
    from lifelike_tpu.solver import mppi, mppi_tl, rollout_tasks

    model = build_max_model()
    params = engine.PhysicsParams(
        kd=1.0, max_tau=16.0, substeps=substeps, mass_freeze=mass_freeze
    )
    cfg = mppi.MPPIConfig(
        horizon=horizon, population=pop, iterations=1, sigma=0.15
    )
    c = B.tl_constants(model, dtype=jnp.float32)
    state = _stand_state()
    scene = playground_gen.generate(
        jax.random.PRNGKey(3), playground_gen.PlaygroundConfig(element_id=1)
    )
    sub = boxes.nearest_boxes(scene, state.base_pos, contact_k)
    ts = engine_tl.tl_scene(sub)
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], state))
    tgt = scene.target_pos

    if fused:
        # the product path of the gait controllers (mpc_tasks fused=True):
        # rollout_traversal's "deltas on the initial pose" convention maps to
        # the fused kernel as a constant target_joint reference + zero gait
        from lifelike_tpu.ops import scalar_phys, traversal_pallas
        from lifelike_tpu.solver import rollout_tl

        sm = scalar_phys.build_scalar_model(model)
        btab = traversal_pallas.pack_boxes(sub)
        q0 = state.joint_pos.reshape(4, 3)
        zH = lambda *sh: jnp.zeros((horizon,) + sh + (1, 1), jnp.float32)
        ref = rollout_tl.RefTraj(
            target_joint=jnp.broadcast_to(
                q0[None, ..., None, None], (horizon, 4, 3, 1, 1)
            ),
            joint_pos=zH(4, 3), joint_vel=zH(4, 3), foot_pos=zH(4, 3),
            base_pos=zH(3), base_orn=zH(4), base_lin_vel=zH(3),
            base_ang_vel=zH(3),
        )

        def rollout_fn(state_k, u_cand):
            return traversal_pallas.rollout_traversal_fused(
                sm, params, state_k, u_cand, btab, ref, tgt,
                jnp.asarray(1.5, jnp.float32), "joystick", gait_weight=0.0,
                bs_tile=bs_tile,
            )
    else:
        def rollout_fn(state_k, u_cand):
            cost, _ = rollout_tasks.rollout_traversal(
                c, params, state_k, u_cand, ts, tgt, 1.5, "joystick"
            )
            return cost

    @jax.jit
    def f(key, tl_state, u_warm, M):
        def body(i, carry):
            uw, _ = carry
            k = jax.random.fold_in(key, i)
            u_opt, diag = mppi_tl.mppi_step(
                c, params, cfg, k, tl_state, uw, ref=None,
                rollout_fn=rollout_fn,
            )
            return u_opt, diag["best_cost"]

        return jax.lax.fori_loop(
            0, M, body, (u_warm, jnp.asarray(0.0, jnp.float32))
        )

    def chained(M):
        return lambda *a: f(*a, jnp.asarray(M, jnp.int32))

    args = (jax.random.PRNGKey(0), tl, jnp.zeros((horizon, 4, 3), jnp.float32))
    ms = _slope_ms(chained, args, reps, m_hi)
    return f"epmc_solve_latency_pop{pop}_H{horizon}_k{contact_k}", ms


def bench_sepmc(pop, horizon, substeps, reps, m_hi, mass_freeze, fused=False):
    """One alternating-best-response round = 2 MPPI solves (pop/2 each) +
    2 opponent plan rollouts, arena scene contact."""
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine, engine_tl
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.scene import arena_gen
    from lifelike_tpu.solver import mppi, mppi_tl, rollout_tasks

    model = build_max_model()
    params = engine.PhysicsParams(
        kd=1.0, max_tau=16.0, substeps=substeps, mass_freeze=mass_freeze
    )
    pop_r = max(pop // 2, 128)
    cfg = mppi.MPPIConfig(
        horizon=horizon, population=pop_r, iterations=1, sigma=0.15
    )
    c = B.tl_constants(model, dtype=jnp.float32)
    scene = arena_gen.generate(jax.random.PRNGKey(1), arena_gen.ArenaConfig())
    ts = engine_tl.tl_scene(scene)
    s0 = _stand_state()
    states = [
        B.tl_from_state(jax.tree.map(
            lambda x: x[None], s0._replace(
                base_pos=jnp.asarray([dx, 0.0, 0.33], jnp.float32))
        ))
        for dx in (-1.0, 1.0)
    ]
    flag = jnp.asarray([0.0, 2.0, 0.25], jnp.float32)

    if fused:
        from lifelike_tpu.ops import scalar_phys, traversal_pallas
        from lifelike_tpu.solver import rollout_tl

        sm = scalar_phys.build_scalar_model(model)
        btab = traversal_pallas.pack_boxes(scene)
        q0 = s0.joint_pos.reshape(4, 3)
        zH = lambda *sh: jnp.zeros((horizon,) + sh + (1, 1), jnp.float32)
        ref0 = rollout_tl.RefTraj(
            target_joint=jnp.broadcast_to(
                q0[None, ..., None, None], (horizon, 4, 3, 1, 1)
            ),
            joint_pos=zH(4, 3), joint_vel=zH(4, 3), foot_pos=zH(4, 3),
            base_pos=zH(3), base_orn=zH(4), base_lin_vel=zH(3),
            base_ang_vel=zH(3),
        )

    @jax.jit
    def f(key, u0, u1, M):
        def body(i, carry):
            ua, ub, _ = carry
            k = jax.random.fold_in(key, i)
            cost = 0.0
            u = [ua, ub]
            for r in (0, 1):
                if fused:
                    opp = traversal_pallas.rollout_plan_fused(
                        sm, params, states[1 - r], u[1 - r], btab, ref0
                    )
                else:
                    opp = rollout_tasks.rollout_plan(
                        c, params, states[1 - r], u[1 - r], ts
                    )

                if fused:
                    def rollout_fn(state_k, u_cand, opp=opp, r=r):
                        return traversal_pallas.rollout_chase_fused(
                            sm, params, state_k, u_cand, btab, ref0,
                            opp, flag,
                            jnp.asarray(1.0 if r == 0 else 0.0,
                                        jnp.float32),
                            gait_weight=0.0,
                        )
                else:
                    def rollout_fn(state_k, u_cand, opp=opp, r=r):
                        cc, _ = rollout_tasks.rollout_chase(
                            c, params, state_k, u_cand, ts, opp, flag,
                            r == 0
                        )
                        return cc

                u[r], diag = mppi_tl.mppi_step(
                    c, params, cfg, jax.random.fold_in(k, r), states[r],
                    u[r], ref=None, rollout_fn=rollout_fn,
                )
                cost = cost + diag["best_cost"]
            return (u[0], u[1], cost)

        return jax.lax.fori_loop(
            0, M, body, (u0, u1, jnp.asarray(0.0, jnp.float32))
        )

    def chained(M):
        return lambda *a: f(*a, jnp.asarray(M, jnp.int32))

    z = jnp.zeros((horizon, 4, 3), jnp.float32)
    ms = _slope_ms(chained, (jax.random.PRNGKey(0), z, z), reps, m_hi)
    return f"sepmc_br_solve_latency_pop2x{pop_r}_H{horizon}", ms


def bench_sweep(pop, horizon, substeps, reps, m_hi, mass_freeze, n_scen=16,
                fused=False):
    """Pod-scale SEPMC scenario sweep (BASELINE config 5), single-chip slice:
    n_scen randomized arenas, each running an alternating-best-response round
    (pop per robot per scenario), chained M rounds deep with warm starts.
    On a pod the scenario axis shards over the mesh
    (parallel.scenario_sweep.sharded_scenario_sweep); the per-chip work timed
    here is exactly one shard's, so ms/round/chip is the scaling unit."""
    from lifelike_tpu.parallel import scenario_sweep
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.scene import arena_gen
    from lifelike_tpu.solver import mppi

    model = build_max_model()
    params = engine.PhysicsParams(
        kd=1.0, max_tau=16.0, substeps=substeps, mass_freeze=mass_freeze
    )
    cfg = mppi.MPPIConfig(
        horizon=horizon, population=pop, iterations=1, sigma=0.15
    )
    c = B.tl_constants(model, dtype=jnp.float32)
    scen = scenario_sweep.generate_scenarios(
        jax.random.PRNGKey(11), n_scen,
        arena_gen.ArenaConfig(rand_cube=True), dtype=jnp.float32,
    )

    # Tiled sweep (scenarios as tile rows — the vmap-of-scan form compiles
    # minutes-slow on the TPU backend); a traced fori_loop trip count lets
    # ONE compilation serve both chain lengths of the slope.
    @jax.jit
    def f(key, u0, M):
        def body(i, carry):
            uw, _ = carry
            k = jax.random.fold_in(key, i)
            u, cost = scenario_sweep.sweep_scenarios_tiled(
                c, params, cfg, k, scen, u_warm=uw, fused=fused
            )
            return u, jnp.mean(cost)

        return jax.lax.fori_loop(
            0, M, body, (u0, jnp.asarray(0.0, jnp.float32))
        )

    def chained(M):
        return lambda key, u0: f(key, u0, jnp.asarray(M, jnp.int32))

    u0 = jnp.zeros((n_scen, 2, horizon, 4, 3), jnp.float32)
    ms = _slope_ms(chained, (jax.random.PRNGKey(0), u0), reps, m_hi)
    return f"sepmc_sweep_latency_s{n_scen}_pop{pop}_H{horizon}", ms


def bench_impulse(substeps, reps, m_hi, batch=256):
    """Hard-contact PGS mode: ms per control step (fidelity path cost row)."""
    from lifelike_tpu.physics import impulse
    from lifelike_tpu.physics.dynamics import RobotState
    from lifelike_tpu.robot.model import build_max_model

    model = build_max_model()
    p = impulse.ImpulseParams(
        substeps=substeps,
        use_pallas_pgs=bool(int(os.environ.get("BENCH_IMPULSE_PALLAS", 1))),
    )
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    s = RobotState(
        base_pos=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.33], jnp.float32),
                                  (batch, 3)),
        base_orn=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0],
                                              jnp.float32), (batch, 4)),
        base_lin_vel=jnp.zeros((batch, 3), jnp.float32),
        base_ang_vel=jnp.zeros((batch, 3), jnp.float32),
        joint_pos=jnp.broadcast_to(stand, (batch, 12)),
        joint_vel=jnp.zeros((batch, 12), jnp.float32),
    )
    lam = impulse.init_lam((batch,), jnp.float32)

    @jax.jit
    def f(s, lam, M):
        def body(i, carry):
            return impulse.control_step(model, p, carry[0], carry[1], stand)

        s, lam = jax.lax.fori_loop(0, M, body, (s, lam))
        return s.base_pos

    def chained(M):
        return lambda *a: f(*a, jnp.asarray(M, jnp.int32))

    ms = _slope_ms(chained, (s, lam), reps, m_hi)
    return f"impulse_ctrl_step_latency_B{batch}_sub{substeps}", ms


def main():
    pop = int(os.environ.get("BENCH_POP", 4096))
    horizon = int(os.environ.get("BENCH_HORIZON", 50))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 10))
    reps = int(os.environ.get("BENCH_REPS", 4))
    m_hi = int(os.environ.get("BENCH_M", 8))
    mass_freeze = int(os.environ.get("BENCH_MASS_FREEZE", substeps))
    fused = bool(int(os.environ.get("BENCH_FUSED", 1))) and pop % 128 == 0
    bs_tile = int(os.environ.get("BENCH_TILE", 0)) or None
    all_rows = bool(int(os.environ.get("BENCH_ALL", 1)))

    def emit(metric, ms):
        if not ms > 0.0:
            # never record a nonsense latency as the official number
            # (round-4 driver capture was -2.97 ms from a jittered slope)
            raise SystemExit(
                f"refusing to emit non-positive latency {ms} for {metric}"
            )
        print(json.dumps({
            "metric": metric,
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(TARGET_MS / ms, 4),
        }), flush=True)
        return ms

    headline_name, headline_ms = bench_pmc(
        pop, horizon, substeps, reps, m_hi, mass_freeze, fused, bs_tile
    )
    name, ms = headline_name, headline_ms
    emit(name, ms)
    if not all_rows:
        return

    print(json.dumps({
        "metric": f"pmc_solve_rate_pop{pop}_H{horizon}",
        "value": round(1000.0 / ms, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(TARGET_MS / ms, 4),
    }), flush=True)
    name, ms_x = bench_pmc(
        pop, horizon, substeps, reps, m_hi, 1, fused, bs_tile
    )
    emit(name + "_exact", ms_x)
    # k=8 contact prune: measured lossless for H<=12 solves on every element
    # (tests/test_contact_prune.py) and halves the dominant K-vectorized box
    # contact — 16.6 ms -> 8.6 ms for this row (tools/epmc_sweep.py)
    contact_k = int(os.environ.get("BENCH_CONTACT_K", 8))
    epmc_tile = int(os.environ.get("BENCH_EPMC_TILE", 0)) or None
    name, ms_e = bench_epmc(pop, horizon, substeps, reps, m_hi, mass_freeze,
                            contact_k=contact_k, fused=fused,
                            bs_tile=epmc_tile)
    emit(name, ms_e)
    if fused:
        name, ms_ex = bench_epmc(pop, horizon, substeps, reps, m_hi,
                                 mass_freeze, contact_k=contact_k,
                                 fused=False)
        emit(name + "_exact", ms_ex)
    name, ms_s = bench_sepmc(pop, horizon, substeps, reps, m_hi, mass_freeze,
                             fused=fused)
    emit(name, ms_s)
    sweep_s = int(os.environ.get("BENCH_SWEEP_S", 16))
    # round-over-round row (pop 256/scenario, XLA tile path below the fused
    # kernel's 1024 minimum) + the fused-kernel row at 4x the per-scenario
    # population (2.3x better per unit work)
    sweep_pop = int(os.environ.get("BENCH_SWEEP_POP", max(pop // 16, 128)))
    name, ms_w = bench_sweep(
        sweep_pop, horizon, substeps, reps, m_hi, mass_freeze, sweep_s,
        fused=fused,
    )
    emit(name, ms_w)
    sweep_pop_f = int(os.environ.get("BENCH_SWEEP_POP_FUSED",
                                     max(pop // 4, 1024)))
    if (fused and sweep_pop_f >= 128 and sweep_pop_f % 128 == 0
            and sweep_pop_f != sweep_pop):
        name, ms_wf = bench_sweep(
            sweep_pop_f, horizon, substeps, reps, m_hi, mass_freeze, sweep_s,
            fused=True,
        )
        emit(name, ms_wf)
    # The hybrid's value is SAMPLE efficiency: at large populations the MPPI
    # weighted u is already near-optimal, so the refinement row runs at a
    # quarter population where second-order polish visibly beats sampling
    # (override with BENCH_HYBRID_POP / BENCH_ILQR_ITERS).
    h_pop = int(os.environ.get("BENCH_HYBRID_POP", max(pop // 4, 128)))
    h_iters = int(os.environ.get("BENCH_ILQR_ITERS", 4))
    # the hybrid solve is seconds-scale: a short chain (RTT is negligible
    # at that latency) keeps the whole matrix driver-runnable
    name, ms_h, imp = bench_hybrid(
        h_pop, horizon, substeps, max(2, reps - 2), max(2, m_hi // 4),
        mass_freeze, fused and h_pop % 128 == 0, ilqr_iters=h_iters,
    )
    emit(name, ms_h)
    print(json.dumps({
        "metric": name.replace("latency", "cost_improvement"),
        "value": round(imp, 4),
        "unit": "relative cost reduction vs MPPI seed",
        "vs_baseline": round(imp, 4),
    }), flush=True)
    # full reps/chain: at reps=2/M=2 the slope is RTT-noise-dominated
    # (measured 5.9 ms vs 2.5 ms at reps=4/M=8 in the same session)
    name, ms_i = bench_impulse(substeps, reps, m_hi)
    emit(name, ms_i)
    if int(os.environ.get("BENCH_SCALING", 1)):
        # weak-scaling proxy rows (virtual CPU mesh, own subprocess so the
        # forced host-device count cannot disturb this process's backend)
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools", "scaling_bench.py")],
            capture_output=True, text=True, timeout=3600,
        )
        print(out.stdout, end="", flush=True)
    # headline again LAST: last-line parsers record the BASELINE config-1 row
    emit(headline_name, headline_ms)


if __name__ == "__main__":
    main()
