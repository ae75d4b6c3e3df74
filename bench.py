"""Benchmark: batched H=50 MPC solve latency on the available accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.md) is >=4096 parallel H=50 rollouts per MPC
solve step at <10 ms p50 on TPU; vs_baseline here is target_ms / measured_ms,
so values > 1.0 beat the target. Sizes can be overridden with env vars
BENCH_POP, BENCH_HORIZON, BENCH_SUBSTEPS, BENCH_ITERS.
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
    iters = int(os.environ.get("BENCH_ITERS", 20))

    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.physics import engine
    from lifelike_tpu.physics.dynamics import RobotState
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi

    model = build_max_model()
    clips = motion_lib.pack_clips(
        [motion_lib.make_synthetic_clip(int(120 * (horizon / 50.0 + 3)))],
        frame_step=1.0 / 120.0,
    )
    params = engine.PhysicsParams(substeps=substeps)
    cfg = mppi.MPPIConfig(horizon=horizon, population=pop, iterations=1)

    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    state = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand,
        joint_vel=jnp.zeros(12, jnp.float32),
    )

    @jax.jit
    def solve(key, state, u_warm):
        u_opt, diag = mppi.mppi_step(
            model, params, clips, cfg, key, state,
            jnp.asarray(0), jnp.asarray(0.0, jnp.float32), u_warm,
        )
        return u_opt, diag

    key = jax.random.PRNGKey(0)
    u = jnp.zeros((horizon, 12), jnp.float32)

    # warmup / compile
    u_opt, diag = solve(key, state, u)
    jax.block_until_ready(u_opt)

    times = []
    for i in range(iters):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        u_opt, diag = solve(k, state, u)
        jax.block_until_ready(u_opt)
        times.append(time.perf_counter() - t0)

    p50_ms = float(np.percentile(times, 50) * 1e3)
    target_ms = 10.0
    print(
        json.dumps(
            {
                "metric": f"mpc_solve_p50_latency_pop{pop}_H{horizon}_sub{substeps}",
                "value": round(p50_ms, 3),
                "unit": "ms",
                "vs_baseline": round(target_ms / p50_ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
