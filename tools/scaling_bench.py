"""Weak-scaling proxy for the sharded MPC solve (BASELINE.md row 4).

Real multi-chip hardware is not reachable from this container, so the
scaling-efficiency measurement the baseline demands (solves/s/chip at
1 chip / 1 host / N hosts) is proxied on a virtual CPU mesh: the SAME
shard_map program that runs on a pod slice (parallel.sharded_solve — psum
softmax weighting, per-device population shards) is timed at n_devices in
{1, 2, 4, 8} with the population scaled proportionally (weak scaling).
Ideal weak scaling keeps the per-solve wall time flat; the printed
efficiency is t(1) / t(n). On real ICI the collectives are faster relative
to compute than on a shared-memory CPU "mesh", so this proxy UNDERSTATES
pod efficiency.

Prints one JSON line per mesh size:
  {"metric": "weak_scaling_n{n}", "value": <ms/solve>,
   "unit": "ms", "vs_baseline": <efficiency vs n=1>}

Run standalone:
  python tools/scaling_bench.py
Sizes via env: SCALE_POP_PER_DEV (default 512), SCALE_HORIZON (default 10),
SCALE_SUBSTEPS (default 10), SCALE_REPS (default 3).
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.parallel import mesh as meshlib
    from lifelike_tpu.parallel import sharded_solve
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine
    from lifelike_tpu.physics.dynamics import RobotState
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi

    pop_per_dev = int(os.environ.get("SCALE_POP_PER_DEV", 512))
    horizon = int(os.environ.get("SCALE_HORIZON", 10))
    substeps = int(os.environ.get("SCALE_SUBSTEPS", 10))
    reps = int(os.environ.get("SCALE_REPS", 3))

    model = build_max_model()
    clip_path = "/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt"
    if os.path.exists(clip_path):
        clips = motion_lib.load_clips(clip_path)
    else:
        clips = motion_lib.pack_clips(
            [motion_lib.make_synthetic_clip(240)], frame_step=1.0 / 120.0
        )
    params = engine.PhysicsParams(substeps=substeps,
                                  mass_freeze=substeps)
    c = B.tl_constants(model, dtype=jnp.float32)
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    rs = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand,
        joint_vel=jnp.zeros(12, jnp.float32),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], rs))

    t1 = None
    for n in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(n)
        cfg = mppi.MPPIConfig(horizon=horizon, population=n * pop_per_dev,
                              iterations=1)
        solve = sharded_solve.make_sharded_solver(
            mesh, model, c, params, clips, cfg
        )
        args = (
            jax.random.PRNGKey(0), tl,
            jnp.zeros((horizon, 4, 3), jnp.float32),
            jnp.asarray(0), jnp.asarray(0.5, jnp.float32),
        )
        u, diag = solve(*args)  # compile + warmup
        jax.block_until_ready(u)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            u, diag = solve(*args)
            jax.block_until_ready(u)
            ts.append(time.perf_counter() - t0)
        ms = float(np.min(ts) * 1e3)
        if t1 is None:
            t1 = ms
        ms_n8 = ms  # last iteration leaves the n=8 time
        print(json.dumps({
            "metric": f"weak_scaling_n{n}_pop{n * pop_per_dev}_H{horizon}",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(t1 / ms, 4),
        }), flush=True)

    # FIXED-WORK CONTROL: the same total population as the n=8 row on a
    # single virtual device. This machine has 2 physical cores hosting the
    # 8 "devices", so weak scaling conflates core saturation with
    # sharding/collective overhead; t(n8) / t(fixed-work n1) isolates the
    # sharding cost alone (1.0 = sharding is free; <1 would mean the mesh
    # program is slower than the equivalent single-device program).
    mesh1 = meshlib.make_mesh(1)
    cfg = mppi.MPPIConfig(horizon=horizon, population=8 * pop_per_dev,
                          iterations=1)
    solve = sharded_solve.make_sharded_solver(
        mesh1, model, c, params, clips, cfg
    )
    args = (
        jax.random.PRNGKey(0), tl,
        jnp.zeros((horizon, 4, 3), jnp.float32),
        jnp.asarray(0), jnp.asarray(0.5, jnp.float32),
    )
    u, diag = solve(*args)
    jax.block_until_ready(u)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        u, diag = solve(*args)
        jax.block_until_ready(u)
        ts.append(time.perf_counter() - t0)
    ms_fixed = float(np.min(ts) * 1e3)
    print(json.dumps({
        "metric": f"weak_scaling_fixedwork_n1_pop{8 * pop_per_dev}_H{horizon}",
        "value": round(ms_fixed, 3),
        "unit": "ms",
        "vs_baseline": round(ms_fixed / ms_n8, 4),
    }), flush=True)

    # SEPMC scenario-sweep weak scaling (BASELINE config 5): scenario count
    # grows with the mesh, per-chip shard constant. Scenarios never
    # communicate, so this measures pure shard_map + summary-psum overhead.
    from lifelike_tpu.parallel import scenario_sweep
    from lifelike_tpu.scene import arena_gen

    scen_per_dev = int(os.environ.get("SCALE_SCEN_PER_DEV", 2))
    sweep_pop = int(os.environ.get("SCALE_SWEEP_POP", 64))
    params_s = engine.PhysicsParams(kd=1.0, max_tau=16.0, substeps=substeps,
                                    mass_freeze=substeps)
    t1 = None
    for n in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(n)
        cfg = mppi.MPPIConfig(horizon=horizon, population=sweep_pop,
                              iterations=1, sigma=0.15)
        n_scen = n * scen_per_dev
        scen = scenario_sweep.generate_scenarios(
            jax.random.PRNGKey(5), n_scen,
            arena_gen.ArenaConfig(rand_cube=True), dtype=jnp.float32,
        )
        sweep = jax.jit(
            lambda k, s, mesh=mesh, cfg=cfg:
            scenario_sweep.sharded_scenario_sweep(mesh, c, params_s, cfg, k, s)
        )
        u, cost, summary = sweep(jax.random.PRNGKey(0), scen)
        jax.block_until_ready(u)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            u, cost, summary = sweep(jax.random.PRNGKey(0), scen)
            jax.block_until_ready(u)
            ts.append(time.perf_counter() - t0)
        ms = float(np.min(ts) * 1e3)
        if t1 is None:
            t1 = ms
        print(json.dumps({
            "metric": f"sweep_weak_scaling_n{n}_s{n_scen}_pop{sweep_pop}",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(t1 / ms, 4),
        }), flush=True)

    # N>=2 HOSTS row (BASELINE.md scaling config): the same sharded solve as
    # one SPMD program across 2 real OS processes joined by jax.distributed
    # (gloo-over-localhost stands in for DCN; tests/test_multihost.py is the
    # correctness harness). Subprocesses: a jax.distributed pod cannot be
    # joined from within this already-initialized process.
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))

    def run_pod(n_proc, n_dev):
        out = subprocess.run(
            [sys.executable, os.path.join(here, "launch_multihost.py"),
             "-n", str(n_proc), "--devices", str(n_dev), "--",
             sys.executable, os.path.join(here, "multihost_worker.py"),
             "--bench", "--pop_per_dev", str(max(pop_per_dev // 8, 16)),
             "--horizon", str(horizon), "--substeps", str(substeps)],
            capture_output=True, text=True, timeout=1800,
        )
        rows = [json.loads(ln) for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        return out.returncode, rows

    # baseline: the SAME 8-device program in ONE process (no DCN); the
    # 2-process row's vs_baseline is then t(1 proc) / t(2 proc) — the
    # gloo-over-localhost stand-in's cross-process efficiency.
    rc1, rows1 = run_pod(1, 8)
    rc2, rows2 = run_pod(2, 4)
    base_ms = rows1[0]["value"] if rc1 == 0 and rows1 else None
    for row in rows1:
        print(json.dumps(row), flush=True)
    for row in rows2:
        if base_ms:
            row["vs_baseline"] = round(base_ms / row["value"], 4)
        print(json.dumps(row), flush=True)
    if rc2 != 0:
        print(json.dumps({"metric": "multiproc_scaling_error",
                          "value": rc2, "unit": "rc",
                          "vs_baseline": 0.0}), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
