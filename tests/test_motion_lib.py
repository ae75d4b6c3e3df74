"""Motion library vs the reference interpolation math (scipy oracle)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp

from lifelike_tpu.motion import motion_lib

REF_DATA = "/root/reference/data/mocap_data"


def _clips():
    frames = [motion_lib.make_synthetic_clip(240, seed=0),
              motion_lib.make_synthetic_clip(300, seed=1)]
    return motion_lib.pack_clips(frames, frame_step=1.0 / 120.0), frames


def _oracle_interp(frames, t, frame_step):
    """Reference motion_lib.py:88-166 re-done with scipy directly."""
    fid = int(np.floor(t / frame_step))
    frac = (t - fid * frame_step) / frame_step
    fc, fn = frames[fid], frames[fid + 1]
    base_pos = fc[0:3] + frac * (fn[0:3] - fc[0:3])
    slerp = Slerp([0, 1], R.from_quat([fc[3:7], fn[3:7]]))
    base_orn = slerp(frac).as_quat()
    base_lin_vel = (fn[0:3] - fc[0:3]) / frame_step
    rv = (R.from_quat(fn[3:7]) * R.from_quat(fc[3:7]).inv()).as_rotvec()
    base_ang_vel = rv / frame_step
    joint_pos = fc[7:] + frac * (fn[7:] - fc[7:])
    joint_vel = (fn[7:] - fc[7:]) / frame_step
    return base_pos, base_orn, base_lin_vel, base_ang_vel, joint_pos, joint_vel


def test_sample_frame_matches_oracle():
    clips, frames = _clips()
    for t in [0.0, 0.0153, 0.5, 1.31]:
        got = motion_lib.sample_frame(clips, jnp.asarray(1), jnp.asarray(t))
        bp, bo, blv, bav, jp, jv = _oracle_interp(frames[1], t, 1.0 / 120.0)
        np.testing.assert_allclose(np.asarray(got.base_pos), bp, atol=1e-5)
        q = np.asarray(got.base_orn)
        sign = np.sign(np.sum(q * bo))
        np.testing.assert_allclose(q * sign, bo, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.base_lin_vel), blv, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.base_ang_vel), bav, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.joint_pos), jp, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.joint_vel), jv, atol=1e-3)


def test_sample_frame_batched():
    clips, frames = _clips()
    ts = jnp.asarray([0.1, 0.2, 0.3])
    idx = jnp.asarray([0, 1, 0])
    got = motion_lib.sample_frame(clips, idx, ts)
    assert got.base_pos.shape == (3, 3)
    single = motion_lib.sample_frame(clips, jnp.asarray(1), jnp.asarray(0.2))
    np.testing.assert_allclose(
        np.asarray(got.base_pos[1]), np.asarray(single.base_pos), atol=1e-7
    )


def test_future_goal_features_shape_and_identity():
    clips, frames = _clips()
    fut = motion_lib.sample_future(clips, jnp.asarray(0), jnp.asarray(0.1))
    assert fut.base_pos.shape == (4, 3)
    feats = motion_lib.future_goal_features(
        fut.base_pos[0], fut.base_orn[0], fut
    )
    assert feats.shape == (72,)
    # first goal relative to itself: zero pos/rot deltas, raw joints
    np.testing.assert_allclose(np.asarray(feats[:6]), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(feats[6:18]), np.asarray(fut.joint_pos[0]), atol=1e-7
    )


def test_future_goal_features_matches_reference_formula():
    """Against the exact reference calculate_future math with scipy."""
    clips, frames = _clips()
    base_pos = np.array([0.3, -0.1, 0.33])
    base_orn = R.from_euler("xyz", [5, -3, 40], degrees=True).as_quat()
    fut = motion_lib.sample_future(clips, jnp.asarray(0), jnp.asarray(0.25))
    feats = np.asarray(
        motion_lib.future_goal_features(jnp.asarray(base_pos), jnp.asarray(base_orn), fut)
    )
    r_b = R.from_quat(base_orn)
    for i in range(4):
        pos_i = np.array(fut.base_pos[i])
        quat_i = np.array(fut.base_orn[i])
        rel = (r_b.inv() * R.from_quat(quat_i)).as_quat()
        rv = R.from_quat(rel).as_rotvec()
        dpos = r_b.inv().apply(pos_i - base_pos)
        np.testing.assert_allclose(feats[18 * i : 18 * i + 3], dpos, atol=1e-5)
        np.testing.assert_allclose(feats[18 * i + 3 : 18 * i + 6], rv, atol=1e-5)


def test_is_ended():
    clips, frames = _clips()
    assert not bool(motion_lib.is_ended(clips, jnp.asarray(0), jnp.asarray(0.1)))
    t_end = float(clips.lengths[0] - clips.margin) * clips.frame_step
    assert bool(motion_lib.is_ended(clips, jnp.asarray(0), jnp.asarray(t_end)))


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_load_reference_clips():
    clips = motion_lib.load_clips(REF_DATA, limit=3)
    assert clips.frames.shape[-1] == 19
    assert clips.frame_step == pytest.approx(1.0 / 120.0)
    assert clips.num_clips == 3
    # quaternions in the data are unit-norm
    q = np.asarray(clips.frames[0, : int(clips.lengths[0]), 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-3)
