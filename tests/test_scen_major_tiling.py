"""Scenario-major tiling parity: grouped kernel blocks == per-scenario calls.

ops.traversal_pallas packs G scenarios per kernel program (per-row
ref/task/box planes via _scen_mix) so tiny-population scenario work does
not pay one sequential H x substeps grid program per scenario. The masked
mixing is exact (own value * 1.0 + 0.0 terms), so the grouped layouts must
reproduce the single-scenario (G=1) path bit-for-bit up to float tolerance.

Shapes chosen to force the grouped paths: plans need S % 8 == 0; the chase
grouping needs S % G == 0 with G * (Bs/S) a multiple of 8 (here S=8,
Bs=16 -> scen_rows=2, G=4).
"""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.motion import motion_lib
from lifelike_tpu.ops import traversal_pallas
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene.boxes import BoxScene

MODEL = build_max_model()
S, H, SUB = 8, 3, 2


def _scenes(key):
    """S random small arenas (K=4 boxes each, all active)."""
    c = jax.random.uniform(key, (S, 4, 3), jnp.float32, -1.5, 1.5)
    c = c.at[..., 2].set(jnp.abs(c[..., 2]) * 0.2 + 0.05)
    h = jax.random.uniform(jax.random.fold_in(key, 1), (S, 4, 3),
                           jnp.float32, 0.05, 0.5)
    return c, h


def _state(rows):
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    st = RobotState(
        base_pos=jnp.array([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand,
        joint_vel=jnp.zeros(12, jnp.float32),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], st))
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, x.shape[:-2] + (rows, 128)), tl
    )


def _refs(key):
    # per-scenario packed refs: the initial pose as target_joint plus
    # noise so scenarios genuinely differ (gait columns too)
    base = jnp.zeros((S, H, 64), jnp.float32)
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    for off in (traversal_pallas._OFF_TARGET, traversal_pallas._OFF_JP):
        base = base.at[:, :, off:off + 12].set(stand)
        base = base.at[:, :, off:off + 12].add(
            0.02 * jax.random.normal(jax.random.fold_in(key, off),
                                     (S, H, 12), jnp.float32)
        )
    return base


def test_grouped_chase_matches_per_scenario():
    params = engine.PhysicsParams(substeps=SUB, mass_freeze=1)
    key = jax.random.PRNGKey(0)
    centers, halves = _scenes(key)
    act = jnp.ones((S, 4, 1), jnp.float32)
    boxes = jnp.concatenate([centers, halves, act, jnp.zeros_like(act)],
                            axis=-1)  # (S, 4, 8)
    refs = _refs(jax.random.fold_in(key, 2))
    Bs = 16  # 2 rows/scenario -> G=4 grouping
    state = _state(Bs)
    u = 0.05 * jax.random.normal(jax.random.fold_in(key, 3),
                                 (H, 4, 3, Bs, 128), jnp.float32)
    opp = jax.random.uniform(jax.random.fold_in(key, 4), (S, H, 2),
                             jnp.float32, -2.0, 2.0)
    flag = jax.random.uniform(jax.random.fold_in(key, 5), (S, 2),
                              jnp.float32, -2.0, 2.0)
    role = (jnp.arange(S) % 2).astype(jnp.float32)

    got = traversal_pallas.rollout_chase_fused(
        MODEL, params, state, u, boxes, refs, opp, flag, role,
        gait_weight=0.8, scen_per_prog=4,
    )  # (16, 128)

    rows = Bs // S
    for s in range(S):
        sl = slice(s * rows, (s + 1) * rows)
        st_s = jax.tree.map(lambda x: x[..., sl, :], state)
        want = traversal_pallas.rollout_chase_fused(
            MODEL, params, st_s, u[..., sl, :], boxes[s], refs[s],
            opp[s], flag[s], role[s], gait_weight=0.8,
        )
        np.testing.assert_allclose(
            np.asarray(got[sl]), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"scenario {s}",
        )


def test_grouped_plan_matches_per_scenario():
    params = engine.PhysicsParams(substeps=SUB, mass_freeze=1)
    key = jax.random.PRNGKey(7)
    centers, halves = _scenes(key)
    act = jnp.ones((S, 4, 1), jnp.float32)
    boxes = jnp.concatenate([centers, halves, act, jnp.zeros_like(act)],
                            axis=-1)
    refs = _refs(jax.random.fold_in(key, 2))
    state = _state(S)  # one row per scenario for the batched plan call
    u_plan = 0.05 * jax.random.normal(jax.random.fold_in(key, 3),
                                      (S, H, 4, 3), jnp.float32)

    got = traversal_pallas.rollout_plan_fused(
        MODEL, params, jax.tree.map(lambda x: x[..., :1], state),
        u_plan, boxes, refs,
    )  # (H, 3, S, 1)

    for s in range(S):
        st_s = jax.tree.map(lambda x: x[..., :1, :1], state)
        want = traversal_pallas.rollout_plan_fused(
            MODEL, params, st_s, u_plan[s], boxes[s], refs[s],
        )  # (H, 3, 1, 1)
        np.testing.assert_allclose(
            np.asarray(got[:, :, s:s + 1]), np.asarray(want),
            rtol=2e-5, atol=2e-5, err_msg=f"scenario {s}",
        )
