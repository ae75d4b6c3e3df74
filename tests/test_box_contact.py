"""Box SDF contact: impassable walls, top-surface support, layout parity.

Bullet creates every playground/arena element as a hard collision body
(reference bullet_static_entities.py:243-256); this suite pins the compliant
SDF replacement: vertical faces push back (robots cannot walk through walls),
tops support feet like the old heightmap path, and the tile-layout engine
matches the oracle engine with boxes in the loop.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import contact, engine, engine_tl
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import boxes

MODEL = build_max_model()
rng = np.random.default_rng(11)

_STAND_Q = jnp.asarray(
    [-0.0278, -0.7790, 1.6873, -0.0276, -0.7777, 1.6838,
     -0.0278, -0.7334, 1.5669, -0.0276, -0.7319, 1.5632]
)


def _stand_state(pos=(0.0, 0.0, 0.33), vel=(0.0, 0.0, 0.0)):
    return RobotState(
        base_pos=jnp.asarray(pos, jnp.float64),
        base_orn=jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float64),
        base_lin_vel=jnp.asarray(vel, jnp.float64),
        base_ang_vel=jnp.zeros(3, jnp.float64),
        joint_pos=_STAND_Q.astype(jnp.float64),
        joint_vel=jnp.zeros(12, jnp.float64),
    )


def _wall_scene(x=0.6, dtype=jnp.float64):
    """One tall wall ahead of the robot at x, spanning y."""
    return boxes.BoxScene(
        center=jnp.asarray([[x + 0.1, 0.0, 1.0]], dtype),
        half=jnp.asarray([[0.1, 5.0, 1.0]], dtype),
        active=jnp.asarray([True]),
        target_pos=jnp.zeros(3, dtype),
    )


def test_box_sdf_values():
    c = jnp.asarray([0.0, 0.0, 1.0])
    h = jnp.asarray([1.0, 2.0, 1.0])
    pts = jnp.asarray([
        [2.0, 0.0, 1.0],   # 1.0 right of the +x face
        [0.0, 0.0, 2.5],   # 0.5 above the top
        [0.9, 0.0, 1.0],   # inside, nearest face +x at 0.1
        [2.0, 3.0, 1.0],   # corner region: sqrt(1^2 + 1^2)
    ])
    d, n = contact.box_sdf(c, h, pts)
    np.testing.assert_allclose(np.asarray(d), [1.0, 0.5, -0.1, np.sqrt(2.0)], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[1]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[2]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(n[3]), [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6
    )


def test_wall_is_impassable():
    """A robot shoved hard at a wall must not end up on the far side, while
    the same shove with heightmap-only contact sails straight through —
    the regression the SDF path fixes."""
    scene = _wall_scene(x=0.6)
    params = engine.PhysicsParams()
    s = _stand_state(vel=(2.5, 0.0, 0.0))
    step = jax.jit(lambda st: engine.control_step(
        model=MODEL, params=params, state=st, target_q=_STAND_Q, scene=scene))
    for _ in range(25):  # 0.5 s
        s = step(s)
    wall_far_face = 0.6 + 0.2
    assert float(s.base_pos[0]) < wall_far_face, s.base_pos

    # heightmap-only: the same shove either tunnels through or blows up on
    # the 2 m instantaneous "ground" step (documents the old broken behavior)
    s2 = _stand_state(vel=(2.5, 0.0, 0.0))
    step2 = jax.jit(lambda st: engine.control_step(
        model=MODEL, params=params, state=st, target_q=_STAND_Q,
        terrain_fn=boxes.terrain_height_fn(scene)))
    for _ in range(25):
        s2 = step2(s2)
    x2 = float(s2.base_pos[0])
    assert (not np.isfinite(x2)) or x2 > wall_far_face or float(s2.base_pos[2]) > 1.5


def test_box_top_supports_standing():
    """Standing centered on a wide low box: SDF contact holds the robot up
    (agrees with the heightmap path within the compliant-settle tolerance)."""
    scene = boxes.BoxScene(
        center=jnp.asarray([[0.0, 0.0, 0.05]], jnp.float64),
        half=jnp.asarray([[2.0, 2.0, 0.05]], jnp.float64),
        active=jnp.asarray([True]),
        target_pos=jnp.zeros(3, jnp.float64),
    )
    params = engine.PhysicsParams()
    s_sdf = _stand_state(pos=(0.0, 0.0, 0.43))
    s_hm = _stand_state(pos=(0.0, 0.0, 0.43))
    f_sdf = jax.jit(lambda st: engine.control_step(
        model=MODEL, params=params, state=st, target_q=_STAND_Q, scene=scene))
    f_hm = jax.jit(lambda st: engine.control_step(
        model=MODEL, params=params, state=st, target_q=_STAND_Q,
        terrain_fn=boxes.terrain_height_fn(scene)))
    for _ in range(50):  # 1 s to settle
        s_sdf = f_sdf(s_sdf)
        s_hm = f_hm(s_hm)
    assert float(s_sdf.base_pos[2]) > 0.3  # supported, not fallen to z=0.33-0.1
    np.testing.assert_allclose(
        np.asarray(s_sdf.base_pos), np.asarray(s_hm.base_pos), atol=2e-3
    )


def test_tile_layout_matches_oracle_with_boxes():
    """Oracle vs tile layout through one control step with wall contact.

    Tolerance: the two layouts' structured solves accumulate conditioning
    noise O(1e-7) per substep on stiff-contact states even without a scene;
    1e-5 over 10 substeps pins that the BOX path itself introduces nothing.
    """
    scene = _wall_scene(x=0.35)
    params = engine.PhysicsParams()
    n = 4
    yaw = rng.uniform(0, 2 * np.pi, size=n)
    q = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    s = RobotState(
        base_pos=jnp.asarray(rng.normal(size=(n, 3)) * 0.1 + [0.2, 0, 0.35]),
        base_orn=jnp.asarray(q),
        base_lin_vel=jnp.asarray(rng.normal(size=(n, 3)) * 0.5 + [0.8, 0, 0]),
        base_ang_vel=jnp.asarray(rng.normal(size=(n, 3)) * 0.3),
        joint_pos=jnp.asarray(_STAND_Q + rng.uniform(-0.2, 0.2, size=(n, 12))),
        joint_vel=jnp.asarray(rng.normal(size=(n, 12)) * 0.5),
    )
    tgt = jnp.asarray(np.asarray(_STAND_Q) + rng.uniform(-0.3, 0.3, size=(n, 12)))

    s_o = jax.vmap(lambda st, t: engine.control_step(
        MODEL, params, st, t, scene=scene))(s, tgt)

    c = B.tl_constants(MODEL, dtype=jnp.float64)
    tl = B.tl_from_state(s, batch2d=(2, 2))
    tgt_tl = jnp.moveaxis(tgt.reshape(n, 4, 3), 0, -1).reshape(4, 3, 2, 2)
    ts = engine_tl.tl_scene(scene)
    tl2 = engine_tl.control_step(c, params, tl, tgt_tl, scene=ts)
    s_t = B.state_from_tl(tl2, batch_shape=(n,))
    # sanity: at least one env is actually touching the wall during the step
    d, _ = contact.box_sdf(scene.center[0], scene.half[0], s_o.base_pos)
    assert float(jnp.min(d)) < 0.3
    for a, b, name in zip(s_o, s_t, s_o._fields):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_nearest_boxes_pruning():
    key = jax.random.PRNGKey(0)
    from lifelike_tpu.scene import playground_gen

    scene = playground_gen.generate(
        key, playground_gen.PlaygroundConfig(element_id=1)
    )
    pos = jnp.asarray([1.0, 0.0, 0.4])
    sub = boxes.nearest_boxes(scene, pos, 8)
    assert sub.center.shape == (8, 3)
    # pruned scene must contain every active box within 1 m of pos
    d = jnp.abs(pos[:2] - scene.center[:, :2]) - scene.half[:, :2]
    dist = jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1)
    near = np.asarray(scene.active & (dist < 1.0))
    sub_c = {tuple(np.round(c, 6)) for c, a in
             zip(np.asarray(sub.center), np.asarray(sub.active)) if a}
    for i in np.where(near)[0]:
        assert tuple(np.round(np.asarray(scene.center[i]), 6)) in sub_c


def test_trunk_corner_repelled_by_wall():
    """The trunk proxy is a 3x2 sphere grid spanning the body
    (engine._TRUNK_OFFSETS): a wall that only the trunk's FRONT overlaps
    (0.17 m ahead of the base origin — beyond the old single r=0.11 origin
    sphere, within the +0.12 sphere's reach of 0.19) must push the base
    back."""
    scene = boxes.BoxScene(
        center=jnp.asarray([[0.42, 0.0, 0.5]], jnp.float64),
        half=jnp.asarray([[0.25, 2.0, 0.5]], jnp.float64),  # face at x=0.17
        active=jnp.ones(1, bool),
        target_pos=jnp.zeros(3, jnp.float64),
    )
    s = _stand_state(pos=(0.0, 0.0, 0.33), vel=(0.5, 0.0, 0.0))
    params = engine.PhysicsParams()
    s1 = engine.substep(MODEL, params, s, _STAND_Q, scene=scene)
    # the wall face at x=0.17 is outside the old origin sphere (r=0.11):
    # the front trunk spheres must still produce a -x force
    free = engine.substep(MODEL, params, s, _STAND_Q, scene=None)
    assert float(s1.base_lin_vel[0]) < float(free.base_lin_vel[0])
    # and the tile layout agrees
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], s))
    ts = engine_tl.tl_scene(scene)
    tl1 = engine_tl.substep(c, params, tl, _STAND_Q.reshape(4, 3)[..., None, None],
                            scene=ts)
    assert abs(float(tl1.base_lin_vel[0, 0, 0]) - float(s1.base_lin_vel[0])) < 1e-7


def test_crouched_trunk_fits_under_hole_bar():
    """Hole-course crawl feasibility: the trunk proxy must be as thin as the
    real trunk (half-height 0.06). A crouched robot (base z=0.18) under a
    bar whose underside is at 0.27 feels NO trunk force (old r=0.11 proxy:
    sphere top at 0.29 collided); standing (base 0.33) it does."""
    bar = boxes.BoxScene(
        center=jnp.asarray([[0.0, 0.0, 0.47]], jnp.float64),
        half=jnp.asarray([[0.3, 2.0, 0.2]], jnp.float64),  # underside z=0.27
        active=jnp.ones(1, bool),
        target_pos=jnp.zeros(3, jnp.float64),
    )
    crouched = _stand_state(pos=(0.0, 0.0, 0.18))
    free = engine.substep(MODEL, engine.PhysicsParams(), crouched, _STAND_Q,
                          scene=None)
    under = engine.substep(MODEL, engine.PhysicsParams(), crouched, _STAND_Q,
                           scene=bar)
    # identical z-dynamics: no trunk-bar contact while crouched
    assert abs(float(under.base_lin_vel[2]) - float(free.base_lin_vel[2])) < 1e-9
    standing = _stand_state(pos=(0.0, 0.0, 0.33))
    free_s = engine.substep(MODEL, engine.PhysicsParams(), standing, _STAND_Q,
                            scene=None)
    under_s = engine.substep(MODEL, engine.PhysicsParams(), standing,
                             _STAND_Q, scene=bar)
    # standing trunk (top ~0.40 > 0.27) IS pushed down by the bar
    assert float(under_s.base_lin_vel[2]) < float(free_s.base_lin_vel[2]) - 1e-6
