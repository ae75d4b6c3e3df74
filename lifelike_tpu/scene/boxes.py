"""Scene-as-data: axis-aligned box worlds with analytic perception queries.

The reference's terrain vocabulary is entirely AABBs on a ground plane —
walls, hurdles, elevated hole blocks, cube staircases (reference
max_game_elements/bullet_static_entities.py) — and perception is ray casts
against them (playground_env.py:374-447). Here a scene is a fixed-size array
of boxes with an active mask, randomized per scenario WITHOUT recompilation,
and every rayTestBatch becomes a closed-form batched slab test:

  * heightmap_at: top-down height probe (percep_2d, 25x13 grid)
  * lidar: 128 horizontal rays (percep_1d) — reproduces the reference's
    miss semantics exactly (miss -> hit_pos [0,0,0] -> distance |ray_from|,
    playground_env.py:46-53,392)
  * front_depth: 25x13 forward depth rays (percep_front, miss -> full 3 m)

Rays see only boxes (Bullet collisionFilterMask=6 excludes plane and
robots); the ground contributes height 0 through the miss path.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.math import quat

LIDAR_RAYS = 128
LIDAR_LEN = 20.0
FRONT_LEN = 3.0


class BoxScene(NamedTuple):
    """Leaves broadcast over leading batch axes; N = fixed box capacity."""

    center: jnp.ndarray  # (..., N, 3)
    half: jnp.ndarray  # (..., N, 3)
    active: jnp.ndarray  # (..., N) bool/float mask
    target_pos: jnp.ndarray  # (..., 3)


def empty_scene(capacity, batch=(), dtype=jnp.float32):
    return BoxScene(
        center=jnp.zeros(batch + (capacity, 3), dtype),
        half=jnp.zeros(batch + (capacity, 3), dtype),
        active=jnp.zeros(batch + (capacity,), bool),
        target_pos=jnp.zeros(batch + (3,), dtype),
    )


def heightmap_at(scene: BoxScene, xy):
    """Terrain height at (..., P, 2) points: max box top among covering boxes,
    0 on plain ground. Matches the top-down ray of playground_env.py:431-447.
    """
    d = jnp.abs(xy[..., :, None, :] - scene.center[..., None, :, :2])
    inside = jnp.all(d <= scene.half[..., None, :, :2], axis=-1)
    inside = inside & scene.active[..., None, :]
    top = scene.center[..., None, :, 2] + scene.half[..., None, :, 2]
    return jnp.max(jnp.where(inside, top, 0.0), axis=-1)


def _slab(o, d, lo, hi, eps=1e-9):
    """Per-axis slab entry/exit for rays o + t d against [lo, hi]."""
    inv = 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0, eps, -eps), d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    return jnp.minimum(t0, t1), jnp.maximum(t0, t1)


def ray_box_distance(scene: BoxScene, origin, direction, max_len):
    """First-hit distance of rays (..., R, 3 origin/direction) against all
    boxes; inf when no hit within max_len."""
    o = origin[..., :, None, :]  # (..., R, 1, 3)
    d = direction[..., :, None, :]
    lo = scene.center[..., None, :, :] - scene.half[..., None, :, :]
    hi = scene.center[..., None, :, :] + scene.half[..., None, :, :]
    tmin, tmax = _slab(o, d, lo, hi)
    t_entry = jnp.max(tmin, axis=-1)
    t_exit = jnp.min(tmax, axis=-1)
    hit = (t_entry <= t_exit) & (t_exit >= 0.0) & (t_entry <= max_len)
    t_hit = jnp.where(t_entry >= 0.0, t_entry, 0.0)  # origin inside box -> 0
    t_hit = jnp.where(hit & scene.active[..., None, :], t_hit, jnp.inf)
    return jnp.min(t_hit, axis=-1)  # (..., R)


def lidar(scene: BoxScene, base_pos, yaw):
    """128-ray horizontal distances (reference RayCast + playground_env.py:392).

    base_pos (..., 3), yaw (...,). Miss reproduces the reference quirk:
    hit_pos = [0,0,0] so distance = |base_pos|.
    """
    angles = yaw[..., None] + (
        2.0 * jnp.pi * jnp.arange(LIDAR_RAYS, dtype=base_pos.dtype) / LIDAR_RAYS
    )
    direction = jnp.stack(
        [jnp.cos(angles), jnp.sin(angles), jnp.zeros_like(angles)], axis=-1
    )
    origin = jnp.broadcast_to(base_pos[..., None, :], direction.shape)
    t = ray_box_distance(scene, origin, direction, LIDAR_LEN)
    miss_dist = jnp.linalg.norm(base_pos, axis=-1)[..., None]
    return jnp.where(jnp.isfinite(t) & (t <= LIDAR_LEN), t, miss_dist)


def _rect_grid(a_min, a_max, an, b_min, b_max, bn, dtype):
    """reference utils/constants.py:5-10 compute_terrain_rectangle, flattened
    row-major (a-major)."""
    a = jnp.linspace(a_min, a_max, an, dtype=dtype)
    b = jnp.linspace(b_min, b_max, bn, dtype=dtype)
    A, B = jnp.meshgrid(a, b, indexing="ij")
    return A.reshape(-1), B.reshape(-1)


def perception_height(scene: BoxScene, base_pos, base_orn):
    """25x13 top-down height grid in the base frame (playground_env.py:431-447).

    Grid spans x in [-1.2, 1.2] (25), y in [-0.6, 0.6] (13), rotated by the
    FULL base rotation (as the reference does) and probed top-down.
    """
    dt = base_pos.dtype
    gx, gy = _rect_grid(-1.2, 1.2, 25, -0.6, 0.6, 13, dt)
    pts = jnp.stack([gx, gy, jnp.zeros_like(gx)], axis=-1)  # (325, 3)
    world = quat.rotate(base_orn[..., None, :], pts) + base_pos[..., None, :]
    h = heightmap_at(scene, world[..., :2])
    return h.reshape(h.shape[:-1] + (25, 13))


def perception_front(scene: BoxScene, base_pos, base_orn):
    """25x13 forward depth rays (playground_env.py:409-429): ray origins on a
    base-frame rectangle y in [-0.25, 0.25] (25) x z in [-0.3, 0.1] (13),
    direction +x (base frame), length 3 m; miss -> 3 m."""
    dt = base_pos.dtype
    gy, gz = _rect_grid(-0.25, 0.25, 25, -0.3, 0.1, 13, dt)
    froms = jnp.stack([jnp.zeros_like(gy), gy, gz], axis=-1)  # (325, 3)
    dirs = jnp.zeros_like(froms).at[..., 0].set(1.0)
    o = quat.rotate(base_orn[..., None, :], froms) + base_pos[..., None, :]
    d = quat.rotate(base_orn[..., None, :], jnp.broadcast_to(dirs, o.shape))
    t = ray_box_distance(scene, o, d, FRONT_LEN)
    t = jnp.minimum(t, FRONT_LEN)
    return t.reshape(t.shape[:-1] + (25, 13))


def nearest_boxes(scene: BoxScene, pos, k):
    """Fixed-size sub-scene of the k nearest active boxes to `pos` (3,).

    MPC solves replan every 20 ms over a ~1 m reachable set, so contact only
    needs the local boxes: gathering k << capacity keeps the per-substep SDF
    cost O(k) without recompilation (unbatched scene; jit-safe).
    """
    d = jnp.abs(pos[:2] - scene.center[..., :2]) - scene.half[..., :2]
    dist = jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1)
    dist = jnp.where(scene.active, dist, jnp.inf)
    neg, idx = jax.lax.top_k(-dist, k)
    return BoxScene(
        center=scene.center[idx],
        half=scene.half[idx],
        active=scene.active[idx] & jnp.isfinite(neg),
        target_pos=scene.target_pos,
    )


def nearest_boxes_corridor(scene: BoxScene, p0, p1, k):
    """Fixed-size sub-scene of the k active boxes nearest the SEGMENT p0->p1.

    Horizon-aware pruning for receding-horizon solves: `nearest_boxes` ranks
    by distance to the solve-time position, so at 3 m/s an H=50 (1 s) rollout
    can travel past every selected box and upcoming obstacles become
    invisible to the solve. Ranking by distance to the reachable corridor
    (current position -> expected end-of-horizon position) keeps obstacles
    ahead in the contact set even when clutter behind the robot is closer.
    p0/p1: (3,) world points (z ignored; ranking is 2D like nearest_boxes).
    """
    a = p0[:2]
    seg = p1[:2] - a
    seg_len2 = jnp.sum(seg * seg) + 1e-12
    # closest point of the segment to each box center, then box distance to it
    t = jnp.clip(
        jnp.einsum("...i,i->...", scene.center[..., :2] - a, seg) / seg_len2,
        0.0, 1.0,
    )
    q = a + t[..., None] * seg  # (..., N, 2)
    d = jnp.abs(q - scene.center[..., :2]) - scene.half[..., :2]
    dist = jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1)
    dist = jnp.where(scene.active, dist, jnp.inf)
    neg, idx = jax.lax.top_k(-dist, k)
    return BoxScene(
        center=scene.center[idx],
        half=scene.half[idx],
        active=scene.active[idx] & jnp.isfinite(neg),
        target_pos=scene.target_pos,
    )


def terrain_height_fn(scene: BoxScene):
    """Adapter for the physics engines: p (..., 3) -> (heights, normals).

    HEIGHTMAP-ONLY contact: box tops act as raised ground; vertical faces
    exert no force. Kept for perception-style probes and cheap walkover
    terrain. For Bullet hard-collision parity (impassable walls/hurdle
    faces) pass the scene itself to engine.control_step(scene=...) /
    engine_tl (TLScene), which adds per-box SDF forces
    (physics.contact.sphere_boxes_force)."""

    def fn(p):
        # p: (..., 4, 3) contact points; the leg axis doubles as the P axis.
        h = heightmap_at(scene, p[..., :2])
        n = jnp.zeros_like(p).at[..., 2].set(1.0)
        return h, n

    return fn
