"""Fixed arenas V1-V3 + GameManager selector: geometry and randomization."""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.scene import arena_fixed as AF
from lifelike_tpu.scene import boxes


def _height(scene, x, y):
    return float(boxes.heightmap_at(scene, jnp.asarray([[x, y]]))[0])


def test_v1_geometry_heights():
    s = AF.to_scene(AF.arena_v1())
    # central 2x2x1 cube loaded at z=0: top at 0.5
    assert np.isclose(_height(s, 0.0, 0.0), 0.5)
    # stamp row: 0.8-tall stamp at x=2 -> top 0.4; 0.2-tall at 3.75 -> 0.1
    assert np.isclose(_height(s, 2.0, 0.0), 0.4)
    assert np.isclose(_height(s, -3.75, 0.0), 0.1)
    # hurdle2 (0.4 tall) at (0, -4) -> 0.2; rotated side hurdle at (4, 3)
    assert np.isclose(_height(s, 0.0, -4.0), 0.2)
    assert np.isclose(_height(s, 4.0, 3.0), 0.15)
    # open ground
    assert _height(s, 1.0, -2.0) == 0.0


def test_v1_small_is_half_size():
    s = AF.to_scene(AF.arena_v1(small=True))
    assert np.isclose(_height(s, 1.0, 0.0), 0.4)  # stamp1 at x=1
    assert _height(s, 2.25, 0.0) == 0.0  # big-layout stamp positions empty
    # walls at +-2.5 y instead of +-5
    assert _height(s, 0.0, 2.5) == 2.0


def test_v2_block_and_holes():
    s = AF.to_scene(AF.arena_v2())
    # 4x3x1.5 central block at z=0 -> top 0.75
    assert np.isclose(_height(s, 0.0, 0.0), 0.75)
    # no holes by default
    assert _height(s, 1.0, -2.0) == 0.0
    sh = AF.to_scene(AF.arena_v2(holes=True))
    # elevated bar at (1, -2, 0.4), 0.4 tall -> top 0.6 (crawl space under)
    assert np.isclose(_height(sh, 1.0, -2.0), 0.6)


def test_v3_cubes_sunk():
    s = AF.to_scene(AF.arena_v3())
    # 1 m cube loaded at z=-0.1 -> top 0.4
    assert np.isclose(_height(s, 2.5, 2.0), 0.4)
    assert np.isclose(_height(s, 0.0, 0.0), 0.15)  # mid hurdle


def test_randomize_height_moves_only_elements():
    arena = AF.arena_v2()
    base = AF.to_scene(arena)
    rand = AF.to_scene(arena, key=jax.random.PRNGKey(0), height_offset=(0.1, 0.2))
    dz = np.asarray(rand.center[..., 2] - base.center[..., 2])
    el = arena.element
    assert np.all(dz[~el] == 0.0)
    assert np.all((dz[el] >= 0.1) & (dz[el] <= 0.2))


def test_make_arena_dispatch_and_batch():
    key = jax.random.PRNGKey(1)
    for v in ("v1", "v2", "v3"):
        s = AF.make_arena(v, key=key, batch=(3,))
        assert s.center.shape == (3, AF.CAPACITY, 3)
    from lifelike_tpu.scene.arena_gen import ArenaConfig

    s4 = AF.make_arena(
        "v4", key=key, batch=(3,),
        element_config=ArenaConfig(rand_cube=True, hurdle=True, hole=True),
    )
    assert s4.center.shape[0] == 3
    # batched v4 arenas differ per scenario
    assert not np.allclose(np.asarray(s4.center[0]), np.asarray(s4.center[1]))


def test_lidar_sees_v1_walls():
    s = AF.to_scene(AF.arena_v1())
    d = boxes.lidar(s, jnp.asarray([0.0, -2.0, 0.3]), jnp.asarray(0.0))
    d = np.asarray(d)
    assert d.min() > 0.0 and d.max() <= boxes.LIDAR_LEN
    # something within the 10x10 arena on every ray (walls or obstacles)
    assert np.all(np.isfinite(d)) and d.max() < 8.0
