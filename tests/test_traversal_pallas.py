"""Fused Pallas traversal rollout must agree with the scanned XLA rollout.

Pins ops.traversal_pallas.rollout_traversal_fused (the EPMC MPC fast path:
box-scene contact + traversal cost in one kernel) against
solver.rollout_tasks.rollout_traversal_gait (the tile-layout oracle, itself
pinned to the batch-leading cost oracles in tests/test_task_mpc.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.costs.traversal import TraversalWeights
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.ops import traversal_pallas
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine, engine_tl
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene.boxes import BoxScene
from lifelike_tpu.solver import rollout_tasks, rollout_tl

MODEL = build_max_model()


def _scene(dtype=jnp.float32):
    """Two walls + a hurdle + an elevated hole bar ahead of the robot."""
    center = jnp.asarray(
        [
            [1.0, 1.2, 1.0],
            [1.0, -1.2, 1.0],
            [0.45, 0.0, 0.05],   # hurdle in reach of the first steps
            [0.8, 0.0, 0.42],    # hole bar, bottom at 0.27
        ],
        dtype,
    )
    half = jnp.asarray(
        [
            [5.0, 0.1, 1.0],
            [5.0, 0.1, 1.0],
            [0.05, 1.1, 0.05],
            [0.05, 1.1, 0.15],
        ],
        dtype,
    )
    active = jnp.ones((4,), bool)
    return BoxScene(center=center, half=half, active=active,
                    target_pos=jnp.asarray([4.0, 0.0, 0.0], dtype))


def _setup(H=3, Bs=8, substeps=2, mass_freeze=1):
    clips = motion_lib.pack_clips(
        [motion_lib.make_synthetic_clip(480)], frame_step=1.0 / 120.0
    )
    params = engine.PhysicsParams(substeps=substeps, mass_freeze=mass_freeze)
    c = B.tl_constants(MODEL, dtype=jnp.float32)
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    state = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.array([0.4, 0.0, 0.0], jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand,
        joint_vel=jnp.zeros(12, jnp.float32),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], state))
    tl = jax.tree.map(
        lambda x: jnp.broadcast_to(x, x.shape[:-2] + (Bs, 128)), tl
    )
    policy_dt = params.dt * params.substeps
    ref = rollout_tl.precompute_reference(
        MODEL, clips, jnp.asarray(0), jnp.asarray(0.2, jnp.float32), H,
        policy_dt,
    )
    u = 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (H, 4, 3, Bs, 128), jnp.float32
    )
    scene = _scene()
    return c, params, tl, u, ref, scene


def _oracle(c, params, tl, u, ref, scene, reward_type, weights, gait_weight):
    ts = engine_tl.tl_scene(scene)
    tp = scene.target_pos
    cost, _ = jax.jit(
        lambda s, u: rollout_tasks.rollout_traversal_gait(
            c, params, s, u, ts, ref, tp, jnp.asarray(1.0, jnp.float32),
            reward_type, 1000, weights=weights, gait_weight=gait_weight,
        )
    )(tl, u)
    return cost


@pytest.mark.parametrize("reward_type", ["joystick", "average_speed"])
def test_fused_traversal_matches_scan(reward_type):
    c, params, tl, u, ref, scene = _setup()
    w = TraversalWeights()
    want = _oracle(c, params, tl, u, ref, scene, reward_type, w, 1.0)
    got = traversal_pallas.rollout_traversal_fused(
        MODEL, params, tl, u, scene, ref, scene.target_pos,
        jnp.asarray(1.0, jnp.float32), reward_type, 1000, weights=w,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_traversal_crawl_gap_and_freeze():
    """Crouch-prior weights (crawl_gap) + frozen-mass cadence parity."""
    c, params, tl, u, ref, scene = _setup(substeps=4, mass_freeze=4)
    w = TraversalWeights(height_min=0.08, pose=0.0, crawl_gap=0.18)
    want = _oracle(c, params, tl, u, ref, scene, "joystick", w, 0.7)
    got = traversal_pallas.rollout_traversal_fused(
        MODEL, params, tl, u, scene, ref, scene.target_pos,
        jnp.asarray(1.0, jnp.float32), "joystick", 1000, weights=w,
        gait_weight=0.7,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("role", [True, False])
def test_fused_chase_matches_scan(role):
    """rollout_chase_gait (tile oracle) vs the fused chase kernel, both
    roles through the masked-arithmetic switch."""
    c, params, tl, u, ref, scene = _setup()
    ts = engine_tl.tl_scene(scene)
    H = u.shape[0]
    opp = jnp.stack([
        jnp.linspace(1.0, 1.5, H), jnp.linspace(0.2, 0.0, H), jnp.full((H,), 0.3)
    ], axis=1)[..., None, None]
    flag = jnp.asarray([2.0, -1.0, 0.3], jnp.float32)
    want, _ = jax.jit(
        lambda s, u: rollout_tasks.rollout_chase_gait(
            c, params, s, u, ts, ref, opp, flag,
            jnp.asarray(role), gait_weight=0.8,
        )
    )(tl, u)
    got = traversal_pallas.rollout_chase_fused(
        MODEL, params, tl, u, scene, ref, opp, flag,
        jnp.asarray(1.0 if role else 0.0, jnp.float32), gait_weight=0.8,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_plan_matches_scan():
    """rollout_plan_gait (tile oracle, batch (1,1)) vs the fused plan
    kernel's base-position trajectory."""
    c, params, tl, u, ref, scene = _setup(Bs=1)
    tl1 = jax.tree.map(lambda x: x[..., :1, :1], tl)
    ts = engine_tl.tl_scene(scene)
    u_plan = 0.03 * jax.random.normal(jax.random.PRNGKey(3), (3, 4, 3),
                                      jnp.float32)
    want = jax.jit(
        lambda s, up: rollout_tasks.rollout_plan_gait(
            c, params, s, up, ts, ref
        )
    )(tl1, u_plan)
    got = traversal_pallas.rollout_plan_fused(
        MODEL, params, tl1, u_plan, scene, ref
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_box_contact_actually_fires():
    """The scene must change the fused cost (boxes are in the loop)."""
    c, params, tl, u, ref, scene = _setup(H=5)
    # park a platform under the robot so the feet stand ON a box
    scene = BoxScene(
        scene.center.at[2].set(jnp.asarray([0.0, 0.0, 0.05])),
        scene.half.at[2].set(jnp.asarray([0.4, 0.4, 0.05])),
        scene.active, scene.target_pos,
    )
    w = TraversalWeights()
    got = traversal_pallas.rollout_traversal_fused(
        MODEL, params, tl, u, scene, ref, scene.target_pos,
        jnp.asarray(1.0, jnp.float32), "joystick", 1000, weights=w,
    )
    empty = BoxScene(scene.center, scene.half,
                     jnp.zeros_like(scene.active), scene.target_pos)
    got_empty = traversal_pallas.rollout_traversal_fused(
        MODEL, params, tl, u, empty, ref, scene.target_pos,
        jnp.asarray(1.0, jnp.float32), "joystick", 1000, weights=w,
    )
    assert not np.allclose(np.asarray(got), np.asarray(got_empty))
