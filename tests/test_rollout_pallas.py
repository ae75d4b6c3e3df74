"""Fused Pallas rollout must agree with the scanned XLA rollout."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.motion import motion_lib
from lifelike_tpu.ops import rollout_pallas
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.solver import rollout_tl

MODEL = build_max_model()


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
        base_lin_vel=jnp.zeros(3, jnp.float32),
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
        MODEL, clips, jnp.asarray(0), jnp.asarray(0.2, jnp.float32), H, policy_dt
    )
    u = 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (H, 4, 3, Bs, 128), jnp.float32
    )
    return c, params, tl, u, ref


def test_fused_matches_scan_small():
    """Fast-suite guard on the fused product path: tiny shapes (H=2,
    substeps=1) keep the CPU interpret-mode kernel under ~40 s while still
    exercising the full fused rollout (PD, integration, contact, cost)."""
    c, params, tl, u, ref = _setup(H=2, Bs=8, substeps=1, mass_freeze=1)
    want, _ = jax.jit(
        lambda s, u: rollout_tl.rollout_tracking(c, params, s, u, ref)
    )(tl, u)
    got = rollout_pallas.rollout_tracking_fused(MODEL, params, tl, u, ref)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_fused_matches_scan_exact():
    c, params, tl, u, ref = _setup(mass_freeze=1)
    want, _ = jax.jit(
        lambda s, u: rollout_tl.rollout_tracking(c, params, s, u, ref)
    )(tl, u)
    got = rollout_pallas.rollout_tracking_fused(MODEL, params, tl, u, ref)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_fused_matches_scan_frozen_mass():
    c, params, tl, u, ref = _setup(substeps=4, mass_freeze=4)
    def scan_frozen(s, u):
        def body(carry, x):
            u_t, ref_t = x
            target_q = ref_t.target_joint + u_t
            from lifelike_tpu.physics import engine_tl
            st = engine_tl.control_step(c, params, carry, target_q)
            kin = B.fk(c, st)
            cost = rollout_tl.tracking_cost_step(st, kin.p_foot, ref_t, rollout_tl.TrackingWeights())
            return st, cost
        final, costs = jax.lax.scan(body, s, (u, ref))
        return jnp.sum(costs, axis=0)
    want = jax.jit(scan_frozen)(tl, u)
    got = rollout_pallas.rollout_tracking_fused(MODEL, params, tl, u, ref)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
