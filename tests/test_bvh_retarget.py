"""Raw BVH mocap pipeline: parser, FK, leg IK, retargeting, mirroring.

Pins the data-ingest path that replaces the reference's offline retargeting
(reference ships raw BVH at data/raw_mocap_data/ and retargeted output at
data/mocap_data/ but no converter; SURVEY.md section 2.4). The retargeted
walkrun clip doubles as a golden anchor: our retarget of the same raw
capture must land near its root height / travel / joint-range envelope.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.motion import bvh, motion_lib, retarget
from lifelike_tpu.robot import ik
from lifelike_tpu.robot.model import build_max_model

RAW = "/root/reference/data/raw_mocap_data/dog_quad_walkrun_001.bvh"
RET = "/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt"
needs_data = pytest.mark.skipif(
    not os.path.exists(RAW), reason="reference raw mocap not mounted"
)


# ---------- leg IK ----------


def test_ik_roundtrip_against_model_fk():
    """IK inverts the robot model's foot FK for all 4 legs."""
    from lifelike_tpu.physics.dynamics import RobotState, forward_kinematics

    model = build_max_model()
    rng = np.random.default_rng(0)
    # knee-positive branch, away from the straight-leg singularity
    q = np.stack(
        [
            rng.uniform(-0.6, 0.6, size=(400, 4)),
            rng.uniform(-1.8, 0.8, size=(400, 4)),
            rng.uniform(0.2, 2.3, size=(400, 4)),
        ],
        axis=-1,
    )  # (400, 4, 3)
    # leg_ik's branch: foot below the hip axis in the leg plane (z' < -5 cm)
    zp = -(
        ik.L_THIGH * np.cos(q[..., 1])
        + ik.L_SHANK * np.cos(q[..., 1] + q[..., 2])
    )
    q = q[np.all(zp < -0.05, axis=-1)][:64]
    assert len(q) == 64
    state = RobotState(
        base_pos=jnp.zeros((64, 3)),
        base_orn=jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (64, 4)),
        base_lin_vel=jnp.zeros((64, 3)),
        base_ang_vel=jnp.zeros((64, 3)),
        joint_pos=jnp.asarray(q.reshape(64, 12)),
        joint_vel=jnp.zeros((64, 12)),
    )
    kin = forward_kinematics(model, state)
    p_rel = np.asarray(kin.p_foot) - ik.HIP_OFFSET  # (64, 4, 3)
    q_hat = np.asarray(ik.all_legs_ik(jnp.asarray(p_rel)))
    np.testing.assert_allclose(q_hat, q, atol=1e-6)


def test_ik_fk_consistency():
    """ik.leg_fk is the exact inverse map used by leg_ik."""
    rng = np.random.default_rng(1)
    q = np.stack(
        [
            rng.uniform(-0.8, 0.8, 1024),
            rng.uniform(-2.0, 1.0, 1024),
            rng.uniform(0.1, 2.4, 1024),
        ],
        axis=-1,
    )
    zp = -(
        ik.L_THIGH * np.cos(q[..., 1])
        + ik.L_SHANK * np.cos(q[..., 1] + q[..., 2])
    )
    q = q[zp < -0.05][:256]
    assert len(q) == 256
    for sy in (-1.0, 1.0):
        p = ik.leg_fk(jnp.asarray(q), sy)
        q_hat = np.asarray(ik.leg_ik(p, sy))
        np.testing.assert_allclose(q_hat, q, atol=1e-7)


def test_ik_unreachable_targets_are_projected():
    p = jnp.asarray([[2.0, -0.09, -3.0], [0.0, -0.09, -1e-4]])
    q = np.asarray(ik.leg_ik(p, -1.0))
    assert np.all(np.isfinite(q))
    # far target -> straight leg; near target -> fully folded knee
    assert abs(q[0, 2]) < 1e-3
    assert q[1, 2] > 3.0 or np.isclose(q[1, 2], np.pi, atol=0.2)


# ---------- BVH parsing + FK ----------


@needs_data
def test_parse_bvh_header():
    c = bvh.parse_bvh(RAW)
    assert c.num_frames == 1157
    assert np.isclose(c.frame_time, 1.0 / 120.0, rtol=1e-3)
    assert len(c.names) == 61 and c.names[0] == "Bip01"
    assert c.parents[0] == -1 and np.all(c.parents[1:] < np.arange(1, 61))
    assert c.frames.shape == (1157, sum(len(ch) for ch in c.channels))


@needs_data
def test_bvh_fk_geometry():
    c = bvh.parse_bvh(RAW)
    pos, rot = bvh.forward_kinematics(c)
    p = bvh.to_z_up(pos)
    # rotations orthonormal
    RtR = np.einsum("njik,njil->njkl", rot[:5], rot[:5])
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-8)
    hips = p[:, c.index("b_Hips")]
    toe = p[:, c.index("b_LeftToe")]
    assert np.all(hips[:, 2] > toe[:, 2])  # hips above feet
    assert 40 < hips[:, 2].mean() < 70  # cm-scale dog


# ---------- retargeting ----------


@needs_data
def test_retarget_matches_reference_envelope():
    c = bvh.parse_bvh(RAW)
    f = retarget.retarget_clip(c)
    ref = np.asarray(json.load(open(RET))["Frames"], np.float32)
    assert f.shape == (1157, 19)
    # quats normalized
    np.testing.assert_allclose(np.linalg.norm(f[:, 3:7], axis=1), 1.0, atol=1e-5)
    # stance height within 10% of the reference retarget
    assert abs(np.median(f[:, 2]) - np.median(ref[:, 2])) < 0.1 * np.median(ref[:, 2])
    # horizontal travel within 15%
    trav = np.linalg.norm(f[-1, :2] - f[0, :2])
    trav_ref = np.linalg.norm(ref[-1, :2] - ref[0, :2])
    assert abs(trav - trav_ref) < 0.15 * trav_ref
    # all joints within URDF limits
    model = build_max_model()
    lo = np.asarray(model.joint_lower).reshape(12)
    hi = np.asarray(model.joint_upper).reshape(12)
    assert np.all(f[:, 7:] >= lo - 1e-6) and np.all(f[:, 7:] <= hi + 1e-6)
    # knees bent at stance like the reference (not straight-legged)
    assert 1.0 < np.median(f[:, 9]) < 2.2  # FR knee


@needs_data
def test_retarget_foot_positions_consistent():
    """FK of the retargeted angles reproduces the IK foot targets in-reach."""
    from lifelike_tpu.physics.dynamics import RobotState, forward_kinematics

    c = bvh.parse_bvh(RAW)
    f = retarget.retarget_clip(c)
    model = build_max_model()
    n = 50
    state = RobotState(
        base_pos=jnp.zeros((n, 3)),
        base_orn=jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 4)),
        base_lin_vel=jnp.zeros((n, 3)),
        base_ang_vel=jnp.zeros((n, 3)),
        joint_pos=jnp.asarray(f[:n, 7:]),
        joint_vel=jnp.zeros((n, 12)),
    )
    kin = forward_kinematics(model, state)
    p_rel = np.asarray(kin.p_foot) - ik.HIP_OFFSET
    # feet stay below the hips and inside the reachable sphere
    assert np.all(np.linalg.norm(p_rel, axis=-1) <= ik.MAX_REACH + 1e-6)
    assert np.all(p_rel[..., 2] < 0.05)


def test_mirror_involution_and_symmetry():
    rng = np.random.default_rng(2)
    f = rng.normal(size=(10, 19)).astype(np.float32)
    f[:, 3:7] /= np.linalg.norm(f[:, 3:7], axis=1, keepdims=True)
    m = retarget.mirror_frames(f)
    np.testing.assert_allclose(retarget.mirror_frames(m), f, atol=1e-7)
    np.testing.assert_allclose(m[:, 1], -f[:, 1])
    np.testing.assert_allclose(m[:, 7:10], np.concatenate(
        [-f[:, 10:11], f[:, 11:13]], axis=1))


@needs_data
def test_mirror_preserves_dynamics_feasibility():
    """Mirrored frames are a rigid reflection: root height and foot-to-hip
    geometry identical to the original up to left/right swap."""
    from lifelike_tpu.physics.dynamics import RobotState, forward_kinematics

    c = bvh.parse_bvh(RAW)
    f = retarget.retarget_clip(c)[:20]
    m = retarget.mirror_frames(f)
    model = build_max_model()

    def feet(frames):
        n = frames.shape[0]
        st = RobotState(
            base_pos=jnp.zeros((n, 3)),
            base_orn=jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 4)),
            base_lin_vel=jnp.zeros((n, 3)),
            base_ang_vel=jnp.zeros((n, 3)),
            joint_pos=jnp.asarray(frames[:, 7:]),
            joint_vel=jnp.zeros((n, 12)),
        )
        return np.asarray(forward_kinematics(model, st).p_foot)

    pf, pm = feet(f), feet(m)
    # FR <-> FL, HR <-> HL with y negated
    flip = pf[:, [1, 0, 3, 2]].copy()
    flip[..., 1] = -flip[..., 1]
    np.testing.assert_allclose(pm, flip, atol=1e-5)


@needs_data
def test_load_raw_clips_packs_into_motion_lib():
    clips = retarget.load_raw_clips(RAW, mirror=True)
    assert clips.num_clips == 2
    fs = motion_lib.sample_frame(clips, jnp.asarray(0), jnp.asarray(0.5))
    fm = motion_lib.sample_frame(clips, jnp.asarray(1), jnp.asarray(0.5))
    np.testing.assert_allclose(
        np.asarray(fs.base_pos[2]), np.asarray(fm.base_pos[2]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fs.base_pos[1]), -np.asarray(fm.base_pos[1]), atol=1e-5
    )
