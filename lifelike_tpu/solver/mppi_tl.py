"""Tile-layout MPPI: population spread over (Bs, 128) VPU tiles.

Drop-in fast path for solver.mppi (the oracle): same algorithm — AR(1)
smoothed Gaussian exploration, exponentiated-cost weighting, receding-horizon
warm starts — but the K candidates ARE the tile batch, so the whole solve is
a handful of fused elementwise programs plus the physics rollout.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.physics import batched as B
from lifelike_tpu.solver import rollout_tl
from lifelike_tpu.solver.mppi import MPPIConfig


def _smooth_noise_tl(key, shape, beta, dtype):
    """AR(1) smoothing along the leading horizon axis. shape = (H, 4, 3, Bs, L)."""
    eps = jax.random.normal(key, shape, dtype)

    def body(carry, x):
        y = beta * carry + jnp.sqrt(1.0 - beta**2) * x
        return y, y

    _, out = jax.lax.scan(body, jnp.zeros(shape[1:], dtype), eps)
    return out


def mppi_step(
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
    return_topk=0,
):
    """One MPPI improvement for a single scenario.

    state: TLState with batch (1, 1) (broadcast to the population inside).
    u_nominal: (H, 4, 3). Returns (u_improved (H, 4, 3), diagnostics).
    rollout_fn: optional (state_k, u_cand) -> total_cost (Bs, L) override —
    e.g. the fused Pallas kernel (ops.rollout_pallas); default is the
    XLA-scan rollout with this ref/terrain.
    return_topk: if > 0, diagnostics gain 'u_topk' (k, H, 4, 3) and
    'cost_topk' (k,) — the last iteration's best raw candidates, the seeds
    of the iLQR refinement stage (solver.hybrid).
    """
    K, H = cfg.population, cfg.horizon
    if lanes is None:
        lanes = 128 if K % 128 == 0 else K
    assert K % lanes == 0, (K, lanes)
    Bs = K // lanes
    dtype = u_nominal.dtype

    state_k = jax.tree.map(
        lambda x: jnp.broadcast_to(x, x.shape[:-2] + (Bs, lanes)), state
    )

    def one_iter(u_nom, key_i):
        noise = cfg.sigma * _smooth_noise_tl(
            key_i, (H, 4, 3, Bs, lanes), cfg.beta, dtype
        )
        u_cand = u_nom[..., None, None] + noise  # (H,4,3,Bs,L)
        if rollout_fn is not None:
            total_cost = rollout_fn(state_k, u_cand)  # (Bs, L)
        else:
            total_cost, _ = rollout_tl.rollout_tracking(
                c, params, state_k, u_cand, ref, terrain_fn
            )  # (Bs, L)
        c_min = jnp.min(total_cost)
        w = jax.nn.softmax(
            (-(total_cost - c_min) / cfg.temperature).reshape(-1)
        ).reshape(total_cost.shape)
        u_new = jnp.sum(u_cand * w, axis=(-2, -1))
        extras = ()
        if return_topk:
            neg_top, idx = jax.lax.top_k(
                -total_cost.reshape(-1), return_topk
            )
            flat = u_cand.reshape(u_cand.shape[:3] + (-1,))  # (H,4,3,K)
            u_topk = jnp.moveaxis(flat[..., idx], -1, 0)  # (k,H,4,3)
            extras = (u_topk, -neg_top)
        return u_new, ((c_min, jnp.sum(w * total_cost)), extras)

    keys = jax.random.split(key, cfg.iterations)
    u_final, ((c_mins, c_means), extras) = jax.lax.scan(
        one_iter, u_nominal, keys
    )
    diag = {"best_cost": c_mins[-1], "weighted_cost": c_means[-1]}
    if return_topk:
        diag["u_topk"] = extras[0][-1]
        diag["cost_topk"] = extras[1][-1]
    return u_final, diag


def make_mpc_controller(model, c, params, clips, cfg: MPPIConfig, terrain_fn=None,
                        fused=False):
    """Jitted receding-horizon controller over the tile-layout fast path.

    fused=True runs the candidates through the single-kernel Pallas rollout
    (ops.rollout_pallas; plane terrain only, population % 128 == 0).
    Returns f(key, robot_state (unbatched RobotState), clip_idx, t, u_warm
    (H,4,3)) -> (u_exec (12,), u_warm', diag)."""
    policy_dt = params.dt * params.substeps
    if fused:
        assert terrain_fn is None, "fused rollout supports plane terrain only"
        assert cfg.population % 128 == 0, cfg.population
        from lifelike_tpu.ops import rollout_pallas, scalar_phys

        sm = scalar_phys.build_scalar_model(model)

    @jax.jit
    def controller(key, robot_state, clip_idx, t, u_warm):
        ref = rollout_tl.precompute_reference(
            model, clips, clip_idx, t, cfg.horizon, policy_dt
        )
        tl = B.tl_from_state(jax.tree.map(lambda x: x[None], robot_state))
        rollout_fn = None
        if fused:
            rollout_fn = lambda sk, uc: rollout_pallas.rollout_tracking_fused(
                sm, params, sk, uc, ref
            )
        u_opt, diag = mppi_step(
            c, params, cfg, key, tl, u_warm, ref, terrain_fn,
            rollout_fn=rollout_fn,
        )
        u_exec = (ref.target_joint[0, ..., 0, 0] + u_opt[0]).reshape(12)
        u_next = jnp.concatenate([u_opt[1:], u_opt[-1:]], axis=0)
        return u_exec, u_next, diag

    return controller
