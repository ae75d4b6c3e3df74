"""Procedural playground terrain, jit-able and per-scenario randomized.

Mirrors the procedural vocabulary of reference
max_game_elements/bullet_static_entities.py into fixed-capacity masked box
arrays (scene.BoxScene), so thousands of randomized scenarios are generated
on device with no recompilation:

  element 0: joystick (no obstacles; far target) (:247-248)
  element 1: hurdle course — corridor walls + n in [1,10) low boxes at random
             spacing, then the target, then n more (:309-329 via :446-455)
  element 2: hole course — elevated blocks leaving a crawl gap (:366-422)
  element 3: cube staircase sets (easy variant) (:424-500)

All elements except joystick add the random-width corridor walls
(:165-203): gap ~ U(wall_gap_offset), width ~ U(wall_width_offset), two
200 x w x 2 boxes at x=5. Heights/distances use the same distributions as
the reference defaults.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.scene.boxes import BoxScene

CAPACITY = 48
MAX_OBJ = 9  # reference: np.random.randint(1, 10)


class PlaygroundConfig(NamedTuple):
    element_id: int = 0  # 0 joystick, 1 hurdles, 2 holes, 3 cubes
    wall_width_offset: tuple = (0.02, 0.5)  # playground_env.py:159
    wall_gap_offset: tuple = (1.0, 20.0)  # playground_env.py:160
    hurdle_min_height: float = 0.05
    hurdle_max_height: float = 0.15
    hole_min_gap: float = 0.25
    hole_max_gap: float = 0.3
    hole_block_height: float = 0.3
    min_distance: float = 1.0
    max_distance: float = 3.0
    element_length: float = 0.1


def _walls(key, cfg: PlaygroundConfig, dtype):
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(
        k1, (), dtype, cfg.wall_width_offset[0], cfg.wall_width_offset[1]
    )
    gap = jax.random.uniform(
        k2, (), dtype, cfg.wall_gap_offset[0], cfg.wall_gap_offset[1]
    )
    y = gap / 2.0 + width / 2.0
    centers = jnp.stack(
        [jnp.stack([5.0, y, 1.0]), jnp.stack([5.0, -y, 1.0])]
    ).astype(dtype)
    halves = jnp.broadcast_to(
        jnp.stack([100.0, width / 2.0, 1.0]).astype(dtype), (2, 3)
    )
    return centers, halves, gap


def _course(key, cfg: PlaygroundConfig, kind, gap_width, dtype):
    """Sequential obstacle course along +x (hurdles kind=1 / holes kind=2).

    Returns (centers (2*MAX_OBJ, 3), halves, active, target_x). First n
    obstacles precede the target, n more follow (anti-feature-fitting,
    reference :452-455)."""
    kn, kd, kh, kt = jax.random.split(key, 4)
    n = jax.random.randint(kn, (), 1, MAX_OBJ + 1)
    dist = jax.random.uniform(
        kd, (2 * MAX_OBJ,), dtype, cfg.min_distance, cfg.max_distance
    )
    length = cfg.element_length
    # cur_len recurrence: pos_x = cur_len + dist/2; cur_len += dist + length
    cum = jnp.cumsum(dist + length)
    cur_len_before = jnp.concatenate([jnp.zeros((1,), dtype), cum[:-1]])
    pos_x = cur_len_before + dist / 2.0

    if kind == 1:
        h = jax.random.uniform(
            kh, (2 * MAX_OBJ,), dtype, cfg.hurdle_min_height, cfg.hurdle_max_height
        )
        pos_z = h / 2.0
    else:
        gap_h = jax.random.uniform(
            kh, (2 * MAX_OBJ,), dtype, cfg.hole_min_gap, cfg.hole_max_gap
        )
        h = jnp.full((2 * MAX_OBJ,), cfg.hole_block_height, dtype)
        pos_z = h / 2.0 + gap_h

    centers = jnp.stack([pos_x, jnp.zeros_like(pos_x), pos_z], axis=-1)
    halves = jnp.stack(
        [jnp.full_like(pos_x, length / 2.0), jnp.full_like(pos_x, gap_width / 2.0), h / 2.0],
        axis=-1,
    )
    idx = jnp.arange(2 * MAX_OBJ)
    active = idx < 2 * n
    # target after the first n obstacles (reference :451): cur_len + U(-1, 1)
    cur_len_at_n = jnp.sum(jnp.where(idx < n, dist + length, 0.0))
    target_x = cur_len_at_n + jax.random.uniform(kt, (), dtype, -1.0, 1.0)
    return centers, halves, active, target_x


def _cubes(key, cfg: PlaygroundConfig, gap_width, dtype):
    """Easy cube staircase sets (reference _generate_one_cube_set easy=True,
    :424-500 + _create_cubes :446-455): per set, 10/25 cm step-up then 25/10 cm
    step-down; num_set ~ U{1..4} before the target, num_set more after."""
    kn, kd, kt = jax.random.split(key, 3)
    num_set = jax.random.randint(kn, (), 1, 5)
    max_sets = 8  # 2 * 4
    dist = jax.random.uniform(kd, (max_sets,), dtype, 0.0, 1.0)
    # per set (easy): cubes at [1.0+c, 0.1], [1.75+c, 0.25], [c+2.5, 0.25],
    # [c+3.25, 0.1] where c = cur_len + dist; set length = dist + 5.0
    set_len = dist + 5.0
    cum = jnp.cumsum(set_len)
    start = jnp.concatenate([jnp.zeros((1,), dtype), cum[:-1]]) + dist

    def one_set(c):
        # (x_center, length, height) per reference easy branch
        xs = jnp.stack([c + 1.0, c + 1.75, c + 2.0 + 0.5, c + 2.0 + 1.25])
        ls = jnp.asarray([0.5, 0.5, 0.5, 0.5], dtype)
        hs = jnp.asarray([0.1, 0.25, 0.25, 0.1], dtype)
        centers = jnp.stack([xs, jnp.zeros_like(xs), hs / 2.0], axis=-1)
        halves = jnp.stack(
            [ls / 2.0, jnp.full_like(xs, gap_width / 2.0), hs / 2.0], axis=-1
        )
        return centers, halves

    centers, halves = jax.vmap(one_set)(start)  # (8, 4, 3)
    centers = centers.reshape(-1, 3)
    halves = halves.reshape(-1, 3)
    set_idx = jnp.repeat(jnp.arange(max_sets), 4)
    active = set_idx < 2 * num_set
    target_x = jnp.sum(
        jnp.where(jnp.arange(max_sets) < num_set, set_len, 0.0)
    ) + jax.random.uniform(kt, (), dtype, -3.0, 3.0)
    return centers, halves, active, target_x


def generate(key, cfg: PlaygroundConfig, dtype=jnp.float32) -> BoxScene:
    """Build one randomized scenario scene. vmap over keys for a batch."""
    kw, ke = jax.random.split(key)
    centers = jnp.zeros((CAPACITY, 3), dtype)
    halves = jnp.zeros((CAPACITY, 3), dtype)
    active = jnp.zeros((CAPACITY,), bool)

    if cfg.element_id == 0:
        target = jnp.asarray([8.0, 0.0, 0.0], dtype)
        return BoxScene(centers, halves, active, target)

    wc, wh, gap = _walls(kw, cfg, dtype)
    centers = centers.at[:2].set(wc)
    halves = halves.at[:2].set(wh)
    active = active.at[:2].set(True)

    if cfg.element_id in (1, 2):
        ec, eh, ea, tx = _course(ke, cfg, cfg.element_id, gap, dtype)
    elif cfg.element_id == 3:
        ec, eh, ea, tx = _cubes(ke, cfg, gap, dtype)
    else:
        raise ValueError(f"unknown element_id {cfg.element_id}")

    n = ec.shape[0]
    centers = centers.at[2 : 2 + n].set(ec)
    halves = halves.at[2 : 2 + n].set(eh)
    active = active.at[2 : 2 + n].set(ea)
    target = jnp.stack([tx, jnp.zeros((), dtype), jnp.zeros((), dtype)])
    return BoxScene(centers, halves, active, target)
