"""Scalar-constant dynamics (ops.scalar_phys) vs tile-layout oracle."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.ops import scalar_phys as SP
from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine, engine_tl
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model

MODEL = build_max_model()
SM = SP.build_scalar_model(MODEL)


def realistic_states():
    stand = np.asarray([-0.028, -0.779, 1.687] * 4)
    q0 = np.asarray([0.05, 0.02, 0.1, 0.99])
    q0 /= np.linalg.norm(q0)
    s = RobotState(
        base_pos=jnp.asarray([[0.1, 0.0, 0.33], [0.0, 0.1, 0.30]]),
        base_orn=jnp.asarray([q0, [0.0, 0.0, 0.0, 1.0]]),
        base_lin_vel=jnp.asarray([[0.8, 0.1, 0.0], [-0.3, 0.5, 0.1]]),
        base_ang_vel=jnp.asarray([[0.2, 0.1, 0.3], [0.0, -0.4, 0.2]]),
        joint_pos=jnp.asarray([stand, stand + 0.1]),
        joint_vel=jnp.asarray([np.full(12, 0.5), np.full(12, -1.0)]),
    )
    return B.tl_from_state(s, batch2d=(1, 2)), stand


def _compare(mass_freeze, steps, tol, substeps=5):
    tl, stand = realistic_states()
    c = B.tl_constants(MODEL, dtype=tl.base_pos.dtype)
    params = engine.PhysicsParams(substeps=substeps, mass_freeze=mass_freeze)
    tgt_tl = jnp.broadcast_to(
        jnp.asarray(stand.reshape(4, 3, 1, 1), tl.base_pos.dtype), (4, 3, 1, 2)
    )
    tgt_sc = tuple(
        tuple(tgt_tl[l, j] for j in range(3)) for l in range(4)
    )

    f_tl = jax.jit(lambda s: engine_tl.control_step(c, params, s, tgt_tl))
    def scalar_step(s):
        return SP.to_tl(SP.control_step(SM, params, SP.from_tl(s), tgt_sc))
    f_sc = jax.jit(scalar_step)

    a, b = tl, tl
    for _ in range(steps):
        a, b = f_tl(a), f_sc(b)
    for name in a._fields:
        va, vb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        np.testing.assert_allclose(vb, va, rtol=tol, atol=tol, err_msg=name)


def test_scalar_matches_oracle_small():
    """Fast-suite guard: one substep / one step keeps the scalar-program
    compile under ~20 s while pinning the same algebra the fused kernels
    consume (scalar_phys is their physics front-end)."""
    _compare(mass_freeze=1, steps=1, tol=5e-4, substeps=1)


@pytest.mark.slow
def test_scalar_matches_oracle_exact():
    _compare(mass_freeze=1, steps=3, tol=5e-4)


@pytest.mark.slow
def test_scalar_matches_oracle_frozen():
    _compare(mass_freeze=5, steps=3, tol=5e-4)
