"""Probe: where does the fused scenario sweep round spend its time?

Times, at BASELINE config-5 sweep shapes (S=16 arenas, pop 1024, H=50,
substeps 10), on the real chip:
  (a) one rollout_plan_fused call (S=16)        -- 16-program grid
  (b) one rollout_chase_fused call (S*Bs=128 rows)
  (c) the full sweep_scenarios_tiled round (2 plans + 2 chases + glue)
"""
import os, time, functools
import jax, jax.numpy as jnp

import numpy as np
from lifelike_tpu.parallel import scenario_sweep
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import arena_gen
from lifelike_tpu.solver import mppi
from lifelike_tpu.ops import scalar_phys, traversal_pallas

S, POP, H, SUB = 16, 1024, 50, 10
model = build_max_model()
params = engine.PhysicsParams(kd=1.0, max_tau=16.0, substeps=SUB,
                              mass_freeze=True)
cfg = mppi.MPPIConfig(horizon=H, population=POP, iterations=1, sigma=0.15)
c = B.tl_constants(model, dtype=jnp.float32)
scen = scenario_sweep.generate_scenarios(
    jax.random.PRNGKey(11), S, arena_gen.ArenaConfig(rand_cube=True),
    dtype=jnp.float32)

sm = scalar_phys.build_scalar_model(model)
dtype = jnp.float32
act = scen.scene.active.astype(dtype)[..., None]
boxes_s = jnp.concatenate(
    [scen.scene.center, scen.scene.half, act, jnp.zeros_like(act)], axis=-1)
robots = [jax.tree.map(lambda x, i=i: x[:, i], scen.robots) for i in (0, 1)]
st_plan = [scenario_sweep._tile_state(r, 1) for r in robots]
refs = [jnp.zeros((S, H, 64), dtype).at[:, :, :12].set(
    robots[i].joint_pos[:, None, :]) for i in (0, 1)]
u0 = jnp.zeros((S, H, 4, 3), dtype)

Bs = POP // 128
st_rows = scenario_sweep._tile_state(robots[0], Bs)
state_k = jax.tree.map(
    lambda x: jnp.broadcast_to(x, x.shape[:-2] + (S * Bs, 128)), st_rows)
u_cand = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (H, 4, 3, S * Bs, 128), dtype)
flag_s = scen.flag_pos[:, :2]
role_s = scen.with_flag[:, 0].astype(dtype)
opp_sc = jnp.zeros((S, H, 2), dtype)


def timeit(name, fn, arg, reps=6):
    out = fn(arg)
    jax.block_until_ready(out)
    print(f"  {name} out-mean {float(jnp.mean(jnp.asarray(jax.tree.leaves(out)[0]))):.4f}")
    ts = []
    for r in range(reps):
        a = jax.tree.map(lambda x: x * (1.0 + 1e-6 * (r + 1)), arg) \
            if arg.dtype != jnp.uint32 else jax.random.fold_in(
                jax.random.PRNGKey(0), r)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(a))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name}: min {min(ts):.1f} ms  med {sorted(ts)[len(ts)//2]:.1f} ms")


plan = jax.jit(lambda u: traversal_pallas.rollout_plan_fused(
    sm, params, st_plan[0], u, boxes_s, refs[0]))
timeit("plan_fused S=16", plan, u0 + 0.01)

chase = jax.jit(lambda u: traversal_pallas.rollout_chase_fused(
    sm, params, state_k, u, boxes_s, refs[0], opp_sc, flag_s, role_s,
    gait_weight=0.0))
timeit("chase_fused 128x128 rows", chase, u_cand)

full = jax.jit(lambda k: scenario_sweep.sweep_scenarios_tiled(
    c, params, cfg, k, scen, fused=True))
timeit("full fused round", full, jax.random.PRNGKey(0))
