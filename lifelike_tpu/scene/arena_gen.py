"""Chase-Tag arena (BulletStaticsV4 parity) as BoxScene data.

Reference max_game/bullet_static_entities.py:830-1019: a 5x5 m walled box
(walls 0.01 thick, 2 m tall at +-2.5) with optional elements per config —
5..6 random cubes (0.5-1.0 footprint, 0.05-0.25 tall, anywhere in +-2),
one full-width hurdle at x=0 (0.05-0.15 tall), one full-length hole bar
(0.3 thick at gap 0.25-0.3).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.scene.boxes import BoxScene

CAPACITY = 12  # max table rows (all elements enabled); generate() sizes
               # each table to its config — see the capacity note below


class ArenaConfig(NamedTuple):
    rand_cube: bool = False
    hurdle: bool = False
    hole: bool = False


def generate(key, cfg: ArenaConfig, dtype=jnp.float32) -> BoxScene:
    # size the table to what this config can populate (4 walls + the
    # enabled elements): inactive rows contribute exact zeros to contact,
    # but they still COST contact compute in every K-vectorized rollout —
    # solver sweeps at capacity 12 spent 1/6 of their box work on rows
    # that are structurally empty under rand_cube.
    capacity = 4 + 6 * bool(cfg.rand_cube) + bool(cfg.hurdle) + \
        bool(cfg.hole)
    centers = jnp.zeros((capacity, 3), dtype)
    halves = jnp.zeros((capacity, 3), dtype)
    active = jnp.zeros((capacity,), bool)

    # walls
    w, l, h = 0.01, 5.0, 2.0
    wall_c = jnp.asarray(
        [[0, 2.5, h / 2], [0, -2.5, h / 2], [2.5, 0, h / 2], [-2.5, 0, h / 2]], dtype
    )
    wall_h = jnp.asarray(
        [[l / 2, w / 2, h / 2], [l / 2, w / 2, h / 2],
         [w / 2, l / 2, h / 2], [w / 2, l / 2, h / 2]], dtype
    )
    centers = centers.at[:4].set(wall_c)
    halves = halves.at[:4].set(wall_h)
    active = active.at[:4].set(True)
    idx = 4

    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.rand_cube:
        n = jax.random.randint(k1, (), 5, 6)  # reference: randint(5, 6) == 5
        kk = jax.random.split(k1, 4)
        hgt = jax.random.uniform(kk[0], (6,), dtype, 0.05, 0.25)
        pos = jax.random.uniform(kk[1], (6, 2), dtype, -2.0, 2.0)
        ln = jax.random.uniform(kk[2], (6,), dtype, 0.5, 1.0)
        wd = jax.random.uniform(kk[3], (6,), dtype, 0.5, 1.0)
        c = jnp.stack([pos[:, 0], pos[:, 1], hgt / 2], axis=-1)
        hv = jnp.stack([ln / 2, wd / 2, hgt / 2], axis=-1)
        centers = centers.at[idx : idx + 6].set(c)
        halves = halves.at[idx : idx + 6].set(hv)
        active = active.at[idx : idx + 6].set(jnp.arange(6) < n)
        idx += 6

    if cfg.hurdle:
        hgt = jax.random.uniform(k2, (), dtype, 0.05, 0.15)
        centers = centers.at[idx].set(jnp.stack([0.0, 0.0, hgt / 2]))
        halves = halves.at[idx].set(jnp.stack([0.05, 2.5, hgt / 2]))
        active = active.at[idx].set(True)
        idx += 1

    if cfg.hole:
        gap = jax.random.uniform(k3, (), dtype, 0.25, 0.3)
        centers = centers.at[idx].set(jnp.stack([0.0, 0.0, 0.15 + gap]))
        halves = halves.at[idx].set(jnp.asarray([2.5, 0.05, 0.15], dtype))
        active = active.at[idx].set(True)
        idx += 1

    return BoxScene(centers, halves, active, jnp.zeros(3, dtype))
