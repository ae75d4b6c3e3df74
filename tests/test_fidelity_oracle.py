"""COMPLIANT-mode fidelity vs the committed golden traces.

BASELINE.md criterion: control-sequence max joint error < 1e-2 rad vs the
PyBullet-stepped reference (legged_robot.py:260-264 config). The criterion is
MET by the hard-contact impulse mode (physics/impulse.py,
tests/test_impulse_contact.py: < 1e-5 rad in float64, < 1e-2 in float32 over
H=50 on all traces). THIS suite tracks the fast compliant-penalty mode (the
MPPI sampling path) against the same traces as regression ceilings — its
divergence is an accepted speed/fidelity trade, bounded here so contact
changes can't silently widen it.

PyBullet is not installable in this image, so the committed traces
(lifelike_tpu/data/oracle_traces/*.npz, regenerable by
tools/make_oracle_traces.py — which uses real PyBullet when importable) come
from tools.bullet_oracle: an independent hard-contact sequential-impulse
simulator of the same solver family.

What this suite pins, with measured round-2 numbers:

  * contact-free articulated dynamics: engine vs oracle agree to ~1e-7 rad
    over 50 substeps — two independent formulations cross-validate the
    equations of motion exactly (the dynamics half of the criterion).
  * 1-control-step tracking error < 1e-2 rad on the walk/run traces — the
    error bound at the MPC replanning interval (the solver re-measures state
    every 20 ms; single-step model error is what bounds control quality).
  * divergence-vs-horizon: compliant-penalty vs hard-impulse contact diverge
    with horizon (walk: ~0.04 rad @ 10 steps, ~0.33 rad @ 50; run gait with
    flight phases: up to ~1.0 rad as footfall timing shifts). The oracle
    itself is NOT chaotic at these scales (a 1e-6 rad perturbation grows only
    to ~3e-5 over 50 steps), so this is genuine contact-model mismatch —
    tracked here as regression ceilings so contact changes must not widen it.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import build_max_model

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from bullet_oracle import BulletOracle, OracleState  # noqa: E402

TRACE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "lifelike_tpu", "data", "oracle_traces"
)
FIELDS = ("base_pos", "base_orn", "base_lin_vel", "base_ang_vel",
          "joint_pos", "joint_vel")
MODEL = build_max_model()


def _load(name):
    z = np.load(os.path.join(TRACE_DIR, f"{name}.npz"))
    meta = json.loads(str(z["meta"]))
    init = {f: z[f"init_{f}"] for f in FIELDS}
    return z, meta, init


def _engine_errors(name):
    z, meta, init = _load(name)
    params = engine.PhysicsParams(
        kp=meta["kp"], kd=meta["kd"], max_tau=meta["max_tau"],
        dt=meta["dt"], substeps=meta["substeps"],
    )
    s = RobotState(*[jnp.asarray(init[f]) for f in FIELDS])
    step = jax.jit(lambda st, t: engine.control_step(MODEL, params, st, t))
    targets = z["targets"]
    errs = []
    for t in range(targets.shape[0]):
        s = step(s, jnp.asarray(targets[t]))
        errs.append(float(np.max(np.abs(
            np.asarray(s.joint_pos) - z["joint_pos"][t]
        ))))
    return np.asarray(errs)


def test_traces_exist_and_are_labeled():
    for name in ("stand", "walk", "run"):
        _, meta, _ = _load(name)
        assert meta["backend"] in ("pybullet", "bullet_oracle")
        assert meta["horizon"] == 50


def test_contact_free_dynamics_cross_validation():
    """Free flight, no actuation/damping/friction: the two independent
    dynamics implementations must agree to integrator noise."""
    model = build_max_model()
    model.joint_damping[:] = 0.0
    model.joint_friction[:] = 0.0
    rng = np.random.default_rng(0)
    init = dict(
        base_pos=np.array([0.0, 0.0, 5.0]),
        base_orn=np.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=np.array([0.5, -0.3, 0.2]),
        base_ang_vel=np.array([0.4, 0.2, -0.3]),
        joint_pos=rng.uniform(-0.5, 0.5, 12),
        joint_vel=rng.uniform(-1.0, 1.0, 12),
    )
    orc = BulletOracle(model, kp=0.0, kd=0.0, max_tau=0.0)
    s_o = OracleState(**{k: v.copy() for k, v in init.items()})
    params = engine.PhysicsParams(kp=0.0, kd=0.0, max_tau=0.0)
    s_e = RobotState(*[jnp.asarray(v) for v in init.values()])
    for _ in range(50):
        s_o = orc.substep(s_o, np.zeros(12))
        s_e = engine.substep(model, params, s_e, jnp.zeros(12))
    assert float(np.max(np.abs(np.asarray(s_e.joint_vel) - s_o.joint_vel))) < 1e-5
    assert float(np.max(np.abs(np.asarray(s_e.base_pos) - s_o.base_pos))) < 1e-8


@pytest.mark.parametrize("name,e1_max,e10_max,emax_max", [
    # Regression ceilings ~50% above measured round-2 values
    # (walk: e1 0.0069, e10 0.041, max 0.335; run: e1 0.0021, e10 0.233,
    #  max 1.01 — flight-phase footfall timing amplifies model mismatch;
    #  stand: e1 0.027, max 0.123 — compliant sag + no static stick).
    ("walk", 1e-2, 0.07, 0.5),
    ("run", 1e-2, 0.35, 1.4),
    ("stand", 4e-2, 0.08, 0.19),
])
def test_divergence_vs_horizon(name, e1_max, e10_max, emax_max):
    errs = _engine_errors(name)
    assert errs[0] < e1_max, (name, errs[0])
    assert errs[9] < e10_max, (name, errs[:10])
    assert errs.max() < emax_max, (name, errs[[0, 9, 24, 49]])


def test_oracle_not_chaotic():
    """A 1e-6 rad perturbation through the oracle grows < 1e-4 over the walk
    horizon — the engine-vs-oracle divergence is model mismatch, not chaos."""
    z, meta, init = _load("walk")
    a = BulletOracle(MODEL)
    b = BulletOracle(MODEL)
    sa = OracleState(**{k: np.asarray(v, float).copy() for k, v in init.items()})
    sb = OracleState(**{k: np.asarray(v, float).copy() for k, v in init.items()})
    sb.joint_pos = sb.joint_pos + 1e-6
    targets = z["targets"]
    for t in range(targets.shape[0]):
        sa = a.control_step(sa, targets[t])
        sb = b.control_step(sb, targets[t])
    assert float(np.max(np.abs(sa.joint_pos - sb.joint_pos))) < 1e-4
