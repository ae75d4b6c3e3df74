"""Benchmark: batched H=50 MPC solve latency on the available accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures one full MPPI solve — population BENCH_POP rollouts of BENCH_HORIZON
control steps x BENCH_SUBSTEPS physics substeps through the tile-layout
dynamics (lifelike_tpu.physics.batched), tracking a mocap-style reference.
The north-star target (BASELINE.md) is >=4096 parallel H=50 rollouts per MPC
solve at <10 ms p50 on TPU; vs_baseline = target_ms / measured_ms, so values
> 1.0 beat the target. Override sizes with env vars BENCH_POP, BENCH_HORIZON,
BENCH_SUBSTEPS, BENCH_ITERS.
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
    params = engine.PhysicsParams(substeps=substeps)
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

    @jax.jit
    def solve(key, tl_state, u_warm, t0):
        ref = rollout_tl.precompute_reference(
            model, clips, jnp.asarray(0), t0, horizon, policy_dt
        )
        u_opt, diag = mppi_tl.mppi_step(c, params, cfg, key, tl_state, u_warm, ref)
        return u_opt, diag

    key = jax.random.PRNGKey(0)
    u = jnp.zeros((horizon, 4, 3), jnp.float32)
    t0 = jnp.asarray(0.0, jnp.float32)

    u_opt, diag = solve(key, tl, u, t0)  # warmup/compile
    jax.block_until_ready(u_opt)

    times = []
    for i in range(iters):
        k = jax.random.fold_in(key, i)
        t_start = time.perf_counter()
        u_opt, diag = solve(k, tl, u, t0)
        jax.block_until_ready(u_opt)
        times.append(time.perf_counter() - t_start)

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
