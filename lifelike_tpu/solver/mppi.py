"""MPPI (model-predictive path integral) solver over joint-target sequences.

Sampling layer of the hybrid trajectory optimizer (SURVEY.md section 7 layer
8a): K perturbed control sequences are rolled through the batched dynamics,
scored with the tracking cost, and combined with exponentiated-cost weights.
Everything is one jit graph; population and horizon are static shapes so XLA
can tile the whole solve onto the MXU/VPU.

Smooth exploration noise (first-order filtered) keeps 500 Hz PD targets from
chattering — equivalent in spirit to the low-pass that a learned policy's
tanh MLP provides in the reference.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.solver import rollout


class MPPIConfig(NamedTuple):
    horizon: int = 50
    population: int = 4096
    iterations: int = 1
    sigma: float = 0.08  # rad, exploration std on joint-target deltas
    beta: float = 0.7  # AR(1) smoothing of noise along the horizon
    temperature: float = 0.05
    elite_frac: float = 0.0  # optional CEM-style truncation; 0 = pure MPPI


def _smooth_noise(key, shape, beta, dtype=jnp.float32):
    """AR(1)-filtered Gaussian noise along the horizon axis (axis -2)."""
    eps = jax.random.normal(key, shape, dtype)

    def body(carry, x):
        y = beta * carry + jnp.sqrt(1.0 - beta**2) * x
        return y, y

    eps_t = jnp.moveaxis(eps, -2, 0)
    _, smoothed = jax.lax.scan(body, jnp.zeros_like(eps_t[0]), eps_t)
    return jnp.moveaxis(smoothed, 0, -2)


def mppi_step(
    model,
    params,
    clips,
    cfg: MPPIConfig,
    key,
    state,
    clip_idx,
    t0,
    u_nominal,
    terrain_fn=None,
):
    """One MPPI improvement of u_nominal (H, 12) for a single scenario state.

    Batched scenarios: vmap this function (or rely on leading batch dims of
    `state`/`u_nominal` — everything broadcasts).
    Returns (u_improved, diagnostics dict).
    """
    K, H = cfg.population, cfg.horizon

    def one_iter(carry, key_i):
        u_nom = carry
        noise = cfg.sigma * _smooth_noise(
            key_i, (K, H, u_nom.shape[-1]), cfg.beta, u_nom.dtype
        )
        u_cand = u_nom[None] + noise  # (K, H, 12)
        state_k = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), state)
        total_cost, _, _ = rollout.rollout_tracking(
            model, params, clips, state_k,
            jnp.broadcast_to(clip_idx, (K,)), jnp.broadcast_to(t0, (K,)),
            u_cand, terrain_fn,
        )
        c_min = jnp.min(total_cost)
        w = jax.nn.softmax(-(total_cost - c_min) / cfg.temperature)
        u_new = jnp.einsum("k,khj->hj", w, u_cand)
        return u_new, (c_min, jnp.sum(w * total_cost))

    keys = jax.random.split(key, cfg.iterations)
    u_final, (c_mins, c_means) = jax.lax.scan(one_iter, u_nominal, keys)
    return u_final, {"best_cost": c_mins[-1], "weighted_cost": c_means[-1]}


def shift_warm_start(u, filler=None):
    """Receding-horizon warm start: drop the executed first control, repeat the
    last (or `filler`)."""
    tail = u[..., -1:, :] if filler is None else filler
    return jnp.concatenate([u[..., 1:, :], tail], axis=-2)


def make_mpc_controller(model, params, clips, cfg: MPPIConfig, terrain_fn=None):
    """Returns jitted f(key, state, clip_idx, t, u_warm) -> (u_exec, u_warm')."""

    @jax.jit
    def controller(key, state, clip_idx, t, u_warm):
        u_opt, diag = mppi_step(
            model, params, clips, cfg, key, state, clip_idx, t, u_warm, terrain_fn
        )
        return u_opt[..., 0, :], shift_warm_start(u_opt), diag

    return controller
