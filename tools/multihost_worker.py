"""One process of a multi-host run: joins the jax.distributed pod, then
runs the sharded MPPI solve and one sharded PMC train step over the GLOBAL
mesh (all processes' devices). Spawned by tools/launch_multihost.py and
tests/test_multihost.py; mirrors what reference bin/run_pg_learner.py:76-85
does per Horovod rank, as one SPMD program instead.

    python tools/launch_multihost.py -n 2 --devices 4 -- \
        python tools/multihost_worker.py

With --bench, prints a JSON latency row for the sharded solve (consumed by
tools/scaling_bench.py's multi-process section).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lifelike_tpu.parallel import distributed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--pop_per_dev", type=int, default=16)
    ap.add_argument("--horizon", type=int, default=3)
    ap.add_argument("--substeps", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    multi = distributed.initialize(cpu=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lifelike_tpu.envs import primitive
    from lifelike_tpu.learning import learner
    from lifelike_tpu.models.pmc import PMCNet
    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.parallel import sharded_solve
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine
    from lifelike_tpu.physics.dynamics import RobotState
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi

    pid = jax.process_index()
    mesh = distributed.global_mesh()
    n_dev = len(jax.devices())
    print(f"proc {pid}: joined pod, {n_dev} global devices "
          f"({len(jax.local_devices())} local), multi={multi}", flush=True)

    model = build_max_model()
    clips = motion_lib.pack_clips(
        [motion_lib.make_synthetic_clip(240)], frame_step=1.0 / 120.0
    )
    params_p = engine.PhysicsParams(substeps=args.substeps)
    c = B.tl_constants(model, dtype=jnp.float32)
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    rs = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand, joint_vel=jnp.zeros(12, jnp.float32),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], rs))

    # --- sharded MPPI solve over the global (cross-process) mesh ---------
    cfg = mppi.MPPIConfig(
        horizon=args.horizon, population=n_dev * args.pop_per_dev,
        iterations=1,
    )
    solve = sharded_solve.make_sharded_solver(
        mesh, model, c, params_p, clips, cfg
    )
    solve_args = (
        jax.random.PRNGKey(0), tl,
        jnp.zeros((cfg.horizon, 4, 3), jnp.float32),
        jnp.asarray(0), jnp.asarray(0.0, jnp.float32),
    )
    u_opt, diag = solve(*solve_args)
    jax.block_until_ready(u_opt)
    best = float(distributed.fetch(diag["best_cost"]).ravel()[0])
    assert np.isfinite(best), best
    print(f"proc {pid}: sharded MPC solve ok; best_cost={best:.4f}", flush=True)

    if args.bench:
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            u_opt, diag = solve(*solve_args)
            jax.block_until_ready(u_opt)
            ts.append(time.perf_counter() - t0)
        ms = float(np.min(ts) * 1e3)
        if pid == 0:
            print(json.dumps({
                "metric": (f"multiproc_scaling_p{jax.process_count()}"
                           f"x{len(jax.local_devices())}_pop{cfg.population}"
                           f"_H{cfg.horizon}"),
                "value": round(ms, 3), "unit": "ms",
                "vs_baseline": 0.0,
            }), flush=True)
        return

    # --- one full sharded PPO train step, env batch across processes -----
    env_cfg = primitive.PrimitiveEnvConfig(params=params_p)
    lcfg = learner.PPOConfig(unroll_length=3)
    net = PMCNet()
    optimizer = learner.make_optimizer(lcfg)
    key = jax.random.PRNGKey(0)

    B_local = 2 * len(jax.local_devices())
    env_state, obs = primitive.reset(model, clips, env_cfg, key, batch=(B_local,))
    params = net.init(key, obs.prop, obs.prop_a, obs.future)
    opt_state = optimizer.init(params)

    env_state = distributed.host_local_batch(mesh, env_state)
    params = distributed.replicate(mesh, params)
    opt_state = distributed.replicate(mesh, opt_state)

    @jax.jit
    def train(params, opt_state, env_state, key):
        return learner.learner_step(
            net, model, clips, env_cfg, lcfg, optimizer,
            params, opt_state, env_state, key,
        )

    params, opt_state, env_state, metrics = train(
        params, opt_state, env_state, key
    )
    jax.block_until_ready(metrics["loss"])
    loss = float(distributed.fetch(metrics["loss"]).ravel()[0])
    assert np.isfinite(loss), loss
    print(f"proc {pid}: sharded train step ok; loss={loss:.4f}", flush=True)
    print(f"proc {pid}: MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
