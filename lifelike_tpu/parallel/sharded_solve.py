"""Multi-chip MPC solves: population sharded over the mesh, ICI reductions.

The pod-scale execution model (SURVEY.md section 7 layer 9): one mesh axis
'batch' shards the MPPI population (or scenario set); each chip rolls its
shard through the tile-layout dynamics independently, and the only
cross-chip communication is the exponentiated-cost weighting — a min + two
psums riding ICI. Multi-host runs use the same program over DCN via
jax.distributed; nothing else changes.

Weighted-average math is reduction-reassociated (sum of per-shard partial
weighted sums), so the sharded result is bitwise-close to the single-chip
solve — asserted in tests/test_sharded_solve.py on a virtual 8-device mesh.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lifelike_tpu.parallel.mesh import BATCH_AXIS
from lifelike_tpu.physics import batched as B
from lifelike_tpu.solver import rollout_tl
from lifelike_tpu.solver.mppi import MPPIConfig
from lifelike_tpu.solver.mppi_tl import _smooth_noise_tl


def sharded_mppi_step(
    mesh: Mesh,
    c: B.TLConstants,
    params,
    cfg: MPPIConfig,
    key,
    state: B.TLState,
    u_nominal,
    ref: rollout_tl.RefTraj,
    terrain_fn=None,
    lanes=None,
    rollout_fn=None,
):
    """One MPPI improvement with the population sharded over mesh axis
    'batch'. state: TLState batch (1, 1); u_nominal (H, 4, 3).

    rollout_fn: optional (state_k, u_cand) -> cost override, same contract
    as mppi_tl.mppi_step's — e.g. the fused Pallas rollout
    (ops.rollout_pallas.rollout_tracking_fused) running per-shard under
    shard_map (exercised by dryrun_multichip).

    Returns (u_improved, diagnostics) — identical semantics to
    mppi_tl.mppi_step, computed across all devices of the mesh.
    """
    n_dev = mesh.shape[BATCH_AXIS]
    K, H = cfg.population, cfg.horizon
    if lanes is None:
        lanes = 128 if K % (n_dev * 128) == 0 else K // n_dev
    assert K % (n_dev * lanes) == 0, (K, n_dev, lanes)
    Bs = K // (n_dev * lanes)  # tile rows per device

    def local_solve(key_shard, u_nom, state_loc):
        """Runs on each device with its own rng shard; u_nom replicated."""
        dtype = u_nom.dtype
        state_k = jax.tree.map(
            lambda x: jnp.broadcast_to(x, x.shape[:-2] + (Bs, lanes)), state_loc
        )

        def one_iter(u_n, key_i):
            noise = cfg.sigma * _smooth_noise_tl(
                key_i, (H, 4, 3, Bs, lanes), cfg.beta, dtype
            )
            u_cand = u_n[..., None, None] + noise
            if rollout_fn is not None:
                cost = rollout_fn(state_k, u_cand)  # (Bs, lanes) local shard
            else:
                cost, _ = rollout_tl.rollout_tracking(
                    c, params, state_k, u_cand, ref, terrain_fn
                )  # (Bs, lanes) local shard
            # global softmax over the full population: ICI reductions
            c_min = jax.lax.pmin(jnp.min(cost), BATCH_AXIS)
            w_un = jnp.exp(-(cost - c_min) / cfg.temperature)
            denom = jax.lax.psum(jnp.sum(w_un), BATCH_AXIS)
            w = w_un / denom
            u_new = jax.lax.psum(
                jnp.sum(u_cand * w, axis=(-2, -1)), BATCH_AXIS
            )
            c_weighted = jax.lax.psum(jnp.sum(w * cost), BATCH_AXIS)
            return u_new, (c_min, c_weighted)

        keys = jax.random.split(key_shard[0], cfg.iterations)
        u_final, (c_mins, c_means) = jax.lax.scan(one_iter, u_nom, keys)
        return u_final, c_mins[-1], c_means[-1]

    # per-device rng: fold in the device index via a sharded key array
    keys = jax.random.split(key, n_dev)

    shard_fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(), jax.tree.map(lambda _: P(), state)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    u_final, best, weighted = shard_fn(keys, u_nominal, state)
    return u_final, {"best_cost": best, "weighted_cost": weighted}


def sharded_hybrid_step(
    mesh: Mesh,
    model,
    c: B.TLConstants,
    params,
    clips,
    cfg: MPPIConfig,
    icfg,
    key,
    state: B.TLState,
    u_nominal,
    clip_idx,
    t0,
    ref: rollout_tl.RefTraj,
    use_pallas=True,
    lanes=None,
    rollout_fn=None,
):
    """Sharded sampling + sharded second-order refinement.

    Stage 1 is sharded_mppi_step's math: each device rolls its population
    shard and the exponentiated weighting rides ICI psums. Stage 2 is new:
    every device *additionally* keeps its shard's best raw candidate and
    refines {global weighted u, local best candidate} through batched iLQR
    (solver.riccati_pallas sweep) — so the refinement fan-out scales with
    the mesh — and the globally cheapest refined sequence is selected with
    an all_gather(argmin) + psum broadcast, all on ICI.

    Returns (u_best (H, 4, 3), {best_cost, refined_cost}).
    """
    from lifelike_tpu.solver import ilqr

    n_dev = mesh.shape[BATCH_AXIS]
    K, H = cfg.population, cfg.horizon
    if lanes is None:
        lanes = 128 if K % (n_dev * 128) == 0 else K // n_dev
    assert K % (n_dev * lanes) == 0, (K, n_dev, lanes)
    Bs = K // (n_dev * lanes)

    step_fn, cost_fn = ilqr.make_problem(model, params, clips, clip_idx, t0)

    def local_solve(key_shard, u_nom, state_loc):
        dtype = u_nom.dtype
        state_k = jax.tree.map(
            lambda x: jnp.broadcast_to(x, x.shape[:-2] + (Bs, lanes)),
            state_loc,
        )

        def one_iter(u_n, key_i):
            noise = cfg.sigma * _smooth_noise_tl(
                key_i, (H, 4, 3, Bs, lanes), cfg.beta, dtype
            )
            u_cand = u_n[..., None, None] + noise
            if rollout_fn is not None:
                cost = rollout_fn(state_k, u_cand)
            else:
                cost, _ = rollout_tl.rollout_tracking(
                    c, params, state_k, u_cand, ref
                )
            c_min = jax.lax.pmin(jnp.min(cost), BATCH_AXIS)
            w_un = jnp.exp(-(cost - c_min) / cfg.temperature)
            denom = jax.lax.psum(jnp.sum(w_un), BATCH_AXIS)
            w = w_un / denom
            u_new = jax.lax.psum(jnp.sum(u_cand * w, axis=(-2, -1)),
                                 BATCH_AXIS)
            # this device's best raw candidate (local — no collective)
            flat_cost = cost.reshape(-1)
            i_loc = jnp.argmin(flat_cost)
            u_loc = u_cand.reshape(u_cand.shape[:3] + (-1,))[..., i_loc]
            return u_new, (c_min, u_loc)

        keys = jax.random.split(key_shard[0], cfg.iterations)
        u_final, (c_mins, u_locs) = jax.lax.scan(one_iter, u_nom, keys)

        # stage 2: refine {weighted u, local best} from the oracle state
        robot = B.state_from_tl(
            jax.tree.map(lambda x: x[..., :1, :1], state_loc), batch_shape=()
        )
        x0 = jnp.broadcast_to(ilqr.flatten_state(robot), (2, ilqr.STATE_DIM))
        us = jnp.stack(
            [u_final.reshape(H, 12), u_locs[-1].reshape(H, 12)]
        ).astype(dtype)
        u_ref, info = ilqr.ilqr_solve_batch(
            step_fn, cost_fn, x0, us, icfg, use_pallas=use_pallas
        )
        j = jnp.argmin(info["final_cost"])
        my_cost = info["final_cost"][j]
        my_u = u_ref[j]

        # global selection: gather refined costs, broadcast the winner
        costs = jax.lax.all_gather(my_cost, BATCH_AXIS)  # (D,)
        i_star = jnp.argmin(costs)
        me = jax.lax.axis_index(BATCH_AXIS)
        u_best = jax.lax.psum(
            jnp.where(me == i_star, my_u, jnp.zeros_like(my_u)), BATCH_AXIS
        )
        return u_best.reshape(H, 4, 3), c_mins[-1], costs[i_star]

    keys = jax.random.split(key, n_dev)
    shard_fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(), jax.tree.map(lambda _: P(), state)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    u_best, best, refined = shard_fn(keys, u_nominal, state)
    return u_best, {"best_cost": best, "refined_cost": refined}


def make_sharded_solver(mesh, model, c, params, clips, cfg, terrain_fn=None,
                        rollout_fn=None):
    """Jitted sharded receding-horizon solve: f(key, tl_state, u_warm, clip_idx,
    t0) -> (u_opt, diag)."""
    policy_dt = params.dt * params.substeps

    @jax.jit
    def solve(key, tl_state, u_warm, clip_idx, t0):
        ref = rollout_tl.precompute_reference(
            model, clips, clip_idx, t0, cfg.horizon, policy_dt
        )
        fn = None
        if rollout_fn is not None:
            fn = lambda sk, uc: rollout_fn(sk, uc, ref)
        return sharded_mppi_step(
            mesh, c, params, cfg, key, tl_state, u_warm, ref, terrain_fn,
            rollout_fn=fn,
        )

    return solve
