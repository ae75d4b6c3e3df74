"""Domain randomization: push forces, episodic friction/obs noise.

Functional counterpart of the reference PushRandomizer (reference
randomizer/push_randomizer.py): after `start_time`, a polar-sampled
horizontal + vertical force is applied to the base for `duration_time`
every `interval_time` seconds. State is a NamedTuple advanced per control
step; the resulting force feeds PhysicsParams.ext_force.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PushConfig(NamedTuple):
    start_time: float = 0.5
    interval_time: float = 1.0
    duration_time: float = 0.2
    horizontal_force: tuple = (0.0, 50.0)  # reference epmc train config
    vertical_force: tuple = (0.0, 10.0)
    push_strength_ratio: float = 1.0


class PushState(NamedTuple):
    count: jnp.ndarray  # (...,) int32 steps since last resample (negative = warmup)
    force: jnp.ndarray  # (..., 3) current sampled force


def _sample_force(key, cfg: PushConfig, batch, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, batch, dtype, 0.0, 2.0 * jnp.pi)
    h = jax.random.uniform(k2, batch, dtype, *cfg.horizontal_force)
    v = jax.random.uniform(k3, batch, dtype, *cfg.vertical_force)
    return jnp.stack([h * jnp.cos(theta), h * jnp.sin(theta), v], axis=-1)


def push_reset(key, cfg: PushConfig, dt, batch=(), dtype=jnp.float32) -> PushState:
    count = jnp.full(batch, -int(cfg.start_time / dt), jnp.int32)
    return PushState(count=count, force=_sample_force(key, cfg, batch, dtype))


def push_step(key, cfg: PushConfig, state: PushState, dt):
    """Advance one control step. Returns (state', active_force (..., 3))."""
    interval = max(int(cfg.interval_time / dt), 1)
    duration = int(cfg.duration_time / dt)
    count = state.count + 1
    resample = (count > 0) & (count % interval == 0)
    new_force = _sample_force(key, cfg, state.count.shape, state.force.dtype)
    force = jnp.where(resample[..., None], new_force, state.force)
    count = jnp.where(resample, 0, count)
    active = (count > 0) & (count < duration) | resample
    applied = jnp.where(
        active[..., None], force * cfg.push_strength_ratio, jnp.zeros_like(force)
    )
    return PushState(count=count, force=force), applied
