"""Tile-layout physics must agree step-for-step with the oracle layout."""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import dynamics, engine, engine_tl
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model

MODEL = build_max_model()
rng = np.random.default_rng(7)


def rand_states(n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return RobotState(
        base_pos=jnp.asarray(rng.normal(size=(n, 3)) * 0.5 + [0, 0, 0.4]),
        base_orn=jnp.asarray(q),
        base_lin_vel=jnp.asarray(rng.normal(size=(n, 3)) * 0.5),
        base_ang_vel=jnp.asarray(rng.normal(size=(n, 3)) * 0.5),
        joint_pos=jnp.asarray(rng.uniform(-1.0, 1.0, size=(n, 12))),
        joint_vel=jnp.asarray(rng.normal(size=(n, 12))),
    )


def test_roundtrip_layout():
    s = rand_states(6)
    tl = B.tl_from_state(s, batch2d=(2, 3))
    s2 = B.state_from_tl(tl, batch_shape=(6,))
    for a, b in zip(s, s2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_solvers_match_numpy():
    A = rng.normal(size=(5, 3, 3))
    A = A @ A.transpose(0, 2, 1) + np.eye(3) * 0.5
    A_tl = jnp.asarray(np.moveaxis(A, 0, -1)[..., None, :])  # (3,3,1,5)
    inv = np.asarray(B.inv3_sym(A_tl))  # (3,3,1,5)
    for i in range(5):
        np.testing.assert_allclose(inv[..., 0, i], np.linalg.inv(A[i]), atol=1e-7)

    A6 = rng.normal(size=(4, 6, 6))
    A6 = A6 @ A6.transpose(0, 2, 1) + np.eye(6)
    b6 = rng.normal(size=(4, 6))
    A6_tl = jnp.asarray(np.moveaxis(A6, 0, -1)[..., None, :])
    b6_tl = jnp.asarray(np.moveaxis(b6, 0, -1)[..., None, :])
    x = np.asarray(B.solve_spd6(A6_tl, b6_tl))
    for i in range(4):
        np.testing.assert_allclose(
            x[:, 0, i], np.linalg.solve(A6[i], b6[i]), atol=1e-7
        )


def test_fk_matches_oracle():
    s = rand_states(6)
    tl = B.tl_from_state(s, batch2d=(2, 3))
    c = B.tl_constants(MODEL, dtype=s.base_pos.dtype)
    kin_tl = B.fk(c, tl)
    kin = dynamics.forward_kinematics(MODEL, s)
    # p_foot: oracle (6,4,3) vs tl (4,3,2,3)
    got = np.moveaxis(np.asarray(kin_tl.p_foot).reshape(4, 3, 6), -1, 0)
    np.testing.assert_allclose(got, np.asarray(kin.p_foot), atol=1e-10)
    got_v = np.moveaxis(np.asarray(kin_tl.v_foot).reshape(4, 3, 6), -1, 0)
    np.testing.assert_allclose(got_v, np.asarray(kin.v_foot), atol=1e-10)


def test_mass_bias_match_oracle():
    s = rand_states(4)
    tl = B.tl_from_state(s, batch2d=(1, 4))
    c = B.tl_constants(MODEL, dtype=s.base_pos.dtype)
    kin_tl = B.fk(c, tl)
    kin = dynamics.forward_kinematics(MODEL, s)
    Mb, F, Ml = dynamics.mass_matrix_blocks(MODEL, kin, s.base_pos, s.base_pos)
    Mb2, F2, Ml2 = B.mass_blocks(c, kin_tl, tl.base_pos, tl.base_pos)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Mb2).reshape(6, 6, 4), -1, 0), np.asarray(Mb), atol=1e-8
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(F2).reshape(4, 3, 6, 4), -1, 0), np.asarray(F), atol=1e-8
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Ml2).reshape(4, 3, 3, 4), -1, 0), np.asarray(Ml), atol=1e-8
    )
    bb, bj = dynamics.bias_forces(MODEL, kin, s, s.base_pos)
    bb2, bj2 = B.bias_forces(c, kin_tl, tl, tl.base_pos)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(bb2).reshape(6, 4), -1, 0), np.asarray(bb), atol=1e-8
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(bj2).reshape(4, 3, 4), -1, 0), np.asarray(bj), atol=1e-8
    )


def test_control_step_matches_oracle():
    n = 4
    s = rand_states(n)
    # start above ground and also a case in contact
    s = s._replace(base_pos=s.base_pos.at[:2, 2].set(0.30))
    params = engine.PhysicsParams(substeps=10)
    target = jnp.asarray(rng.uniform(-1, 1, size=(n, 12)))

    out = engine.control_step(MODEL, params, s, target)

    tl = B.tl_from_state(s, batch2d=(1, n))
    c = B.tl_constants(MODEL, dtype=s.base_pos.dtype)
    tgt_tl = jnp.moveaxis(target.reshape(n, 4, 3), 0, -1)[..., None, :]
    out_tl = engine_tl.control_step(c, params, tl, tgt_tl)
    back = B.state_from_tl(out_tl, batch_shape=(n,))
    # closed-form cofactor/Cholesky vs LAPACK solves diverge at ~1e-6 after
    # 10 substeps of contact-rich dynamics; that is solver roundoff, not a
    # layout bug (single-substep agreement is ~1e-10).
    for name, a, b in zip(out._fields, out, back):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_grad_through_tl_control_step():
    n = 2
    s = rand_states(n)
    tl = B.tl_from_state(s, batch2d=(1, n))
    c = B.tl_constants(MODEL, dtype=s.base_pos.dtype)
    params = engine.PhysicsParams(substeps=2)

    def loss(tgt):
        out = engine_tl.control_step(c, params, tl, tgt)
        return jnp.sum(out.base_pos**2)

    g = jax.grad(loss)(jnp.zeros((4, 3, 1, n)))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_mass_freeze_fidelity():
    """Frozen-mass fast path (PhysicsParams.mass_freeze=substeps) stays
    within the north-star 1e-2 rad control-fidelity budget of the exact
    per-substep factorization over 10 control steps (0.2 s) from a realistic
    in-envelope state (stand pose, walking-speed base motion). It is a
    sampling-path approximation: pathological states (deep penetration,
    100s rad/s joint rates) are out of scope — the exact path handles those."""
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
    tl = B.tl_from_state(s, batch2d=(1, 2))
    c = B.tl_constants(MODEL, dtype=s.base_pos.dtype)
    tgt = jnp.moveaxis(jnp.broadcast_to(stand.reshape(1, 4, 3), (2, 4, 3)), 0, -1)[
        ..., None, :
    ].astype(s.base_pos.dtype)

    p_exact = engine.PhysicsParams(substeps=5, mass_freeze=1)
    p_froz = engine.PhysicsParams(substeps=5, mass_freeze=5)
    f_e = jax.jit(lambda st: engine_tl.control_step(c, p_exact, st, tgt))
    f_f = jax.jit(lambda st: engine_tl.control_step(c, p_froz, st, tgt))
    se = sf = tl
    for _ in range(10):
        se, sf = f_e(se), f_f(sf)
    assert float(jnp.max(jnp.abs(se.joint_pos - sf.joint_pos))) < 1e-2
    assert float(jnp.max(jnp.abs(se.base_pos - sf.base_pos))) < 5e-3
    assert bool(jnp.all(jnp.isfinite(sf.joint_vel)))
