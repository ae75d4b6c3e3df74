"""Benchmark: batched H=50 MPC solve latency on the available accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures one full MPPI solve — population BENCH_POP rollouts of BENCH_HORIZON
control steps x BENCH_SUBSTEPS physics substeps through the tile-layout
dynamics (lifelike_tpu.physics.batched), tracking a mocap-style reference.
The north-star target (BASELINE.md) is >=4096 parallel H=50 rollouts per MPC
solve at <10 ms p50 on TPU; vs_baseline = target_ms / measured_ms, so values
> 1.0 beat the target.

Timing method: the axon TPU tunnel adds a ~24 ms host<->device round trip to
any synchronous call, and `block_until_ready` can ACK before device completion
— so single-call wall times are meaningless here. We therefore time M
data-dependent solves chained inside ONE jitted program (each solve warm-
starts from the previous one, exactly the receding-horizon pattern) for two
values of M and report the slope: pure per-solve device latency, RTT
excluded. Override sizes with env vars BENCH_POP, BENCH_HORIZON,
BENCH_SUBSTEPS, BENCH_REPS, BENCH_M.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    pop = int(os.environ.get("BENCH_POP", 4096))
    horizon = int(os.environ.get("BENCH_HORIZON", 50))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 10))
    reps = int(os.environ.get("BENCH_REPS", 5))
    m_hi = int(os.environ.get("BENCH_M", 8))
    # MPPI-sampling physics config: refactor mass/Schur once per control
    # step (fidelity vs exact: <=1e-2 rad transient, ~1e-4 rad settled over
    # 1 s — see tests/test_batched_layout.py). BENCH_MASS_FREEZE=1 for exact.
    mass_freeze = int(os.environ.get("BENCH_MASS_FREEZE", substeps))
    # 1 = single-kernel Pallas rollout (ops.rollout_pallas); 0 = XLA scan.
    # The fused kernel needs the tile layout's lane dim full (pop % 128 == 0);
    # small probe sizes fall back to the XLA-scan path automatically.
    fused = bool(int(os.environ.get("BENCH_FUSED", 1))) and pop % 128 == 0
    bs_tile = int(os.environ.get("BENCH_TILE", 0)) or None  # kernel sublane tile

    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine
    from lifelike_tpu.physics.dynamics import RobotState
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi, mppi_tl, rollout_tl

    model = build_max_model()
    clips = motion_lib.pack_clips(
        [motion_lib.make_synthetic_clip(int(120 * (horizon / 50.0 + 3)))],
        frame_step=1.0 / 120.0,
    )
    params = engine.PhysicsParams(substeps=substeps, mass_freeze=mass_freeze)
    cfg = mppi.MPPIConfig(horizon=horizon, population=pop, iterations=1)
    c = B.tl_constants(model, dtype=jnp.float32)

    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    state = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand,
        joint_vel=jnp.zeros(12, jnp.float32),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], state))
    policy_dt = params.dt * params.substeps

    if fused:
        from lifelike_tpu.ops import rollout_pallas, scalar_phys

        sm = scalar_phys.build_scalar_model(model)

    def chained(M):
        """M receding-horizon MPPI solves, each warm-started from the last."""

        @jax.jit
        def f(key, tl_state, u_warm, t0):
            def body(uw, i):
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

            u_fin, costs = jax.lax.scan(body, u_warm, jnp.arange(M))
            return u_fin, costs

        return f

    key = jax.random.PRNGKey(0)
    u = jnp.zeros((horizon, 4, 3), jnp.float32)
    t0 = jnp.asarray(0.0, jnp.float32)

    def wall_ms(f):
        r, _ = f(key, tl, u, t0)
        np.asarray(r)  # warmup + true sync (host fetch)
        ts = []
        for _ in range(reps):
            t_s = time.perf_counter()
            r, _ = f(key, tl, u, t0)
            np.asarray(r)  # host fetch forces real completion
            ts.append(time.perf_counter() - t_s)
        return float(np.min(ts) * 1e3)

    w1 = wall_ms(chained(1))
    wM = wall_ms(chained(m_hi))
    per_solve_ms = (wM - w1) / (m_hi - 1)

    target_ms = 10.0
    print(
        json.dumps(
            {
                "metric": f"mpc_solve_latency_pop{pop}_H{horizon}_sub{substeps}",
                "value": round(per_solve_ms, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / per_solve_ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
