"""Mocap motion library: clips as device arrays + batched interpolation.

TPU-native counterpart of the reference MotionLib (reference
primitive_level_env/motion_lib.py): same clip format — JSON files with
`FrameDuration` (1/120 s) and `Frames` of 19 floats
[x, y, z, qx, qy, qz, qw, 12 joint angles], leg order FR, FL, HR, HL — and
the same interpolation semantics (lerp positions/joints, slerp orientation,
finite-difference velocities over one frame step, motion_lib.py:117-166), but
all clips are packed into one padded (num_clips, max_len, 19) array so that
frame lookup and interpolation run batched under jit for thousands of
parallel scenarios.

Prioritized clip re-sampling p ~ (1 - avg_reward)^factor
(reference primitive_level_env.py:236-240) stays host-side in the trainer.
"""
import json
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from lifelike_tpu import _native
from lifelike_tpu.math import quat

# Future-goal horizon offsets in seconds (reference motion_lib.py:44).
TIME_FUTURE = (1.0 / 30.0, 1.0 / 15.0, 1.0 / 3.0, 1.0)


class MotionClips(NamedTuple):
    """Packed clip data (device arrays)."""

    frames: jnp.ndarray  # (C, T_max, 19) zero-padded
    lengths: jnp.ndarray  # (C,) int frame counts
    frame_step: float  # seconds per frame (1/120)
    margin: int  # end-of-clip margin in frames (motion_lib.py:35)

    @property
    def num_clips(self):
        return self.frames.shape[0]

    def max_time(self, clip_idx):
        """Latest time reset may sample: duration minus margin."""
        return (self.lengths[clip_idx] - self.margin - 1) * self.frame_step


class FrameState(NamedTuple):
    """Interpolated reference state, same schema as RobotState kinematics."""

    base_pos: jnp.ndarray  # (..., 3)
    base_orn: jnp.ndarray  # (..., 4)
    base_lin_vel: jnp.ndarray  # (..., 3)
    base_ang_vel: jnp.ndarray  # (..., 3)
    joint_pos: jnp.ndarray  # (..., 12)
    joint_vel: jnp.ndarray  # (..., 12)


def load_clips(data_path, policy_step=1.0 / 50.0, limit=None) -> MotionClips:
    """Load *.txt clips — a directory, one file, or an explicit list of
    files (clip index = position in the list) — into device arrays."""
    if isinstance(data_path, (list, tuple)):
        files = list(data_path)
    elif os.path.isdir(data_path):
        files = sorted(
            os.path.join(data_path, f)
            for f in os.listdir(data_path)
            if f.endswith("txt")
        )
    else:
        files = [data_path]
    if limit:
        files = files[:limit]
    frames, frame_step = [], None
    for f in files:
        parsed = _native.parse_clip_file(f)  # C++ fast path
        if parsed is None:  # no toolchain / nonstandard file: json fallback
            d = json.load(open(f))
            parsed = (np.asarray(d["Frames"], np.float32), d["FrameDuration"])
        frames.append(parsed[0])
        frame_step = frame_step or float(parsed[1])
    return pack_clips(frames, frame_step=frame_step, policy_step=policy_step)


def pack_clips(frame_arrays, frame_step, policy_step=1.0 / 50.0) -> MotionClips:
    lengths = np.array([len(f) for f in frame_arrays], dtype=np.int32)
    T = int(lengths.max())
    packed = np.zeros((len(frame_arrays), T, 19), dtype=np.float32)
    for i, f in enumerate(frame_arrays):
        assert f.shape[1] == 19, f.shape
        packed[i, : len(f)] = f
        packed[i, len(f):] = f[-1]  # pad with last frame (never sampled)
    frame_rate = int(round(1.0 / frame_step))
    margin = int(np.ceil(policy_step / frame_step)) + frame_rate + 2
    # numpy on purpose: clip libraries are closed over by jitted controllers
    # and learners; closed-over *device* arrays put every later dispatch in
    # the process on a slow captured-buffer path (see batched.tl_constants).
    # As numpy they embed as executable literals instead.
    return MotionClips(
        frames=np.ascontiguousarray(packed),
        lengths=np.ascontiguousarray(lengths),
        frame_step=frame_step,
        margin=margin,
    )


def _interp(clips: MotionClips, clip_idx, t):
    """Interpolate clip `clip_idx` at time `t` (both broadcastable arrays)."""
    fs = clips.frame_step
    frames = jnp.asarray(clips.frames)  # host literals -> on-device constants
    lengths = jnp.asarray(clips.lengths)
    frame_id = jnp.floor(t / fs).astype(jnp.int32)
    frac = (t - frame_id * fs) / fs
    max_id = lengths[clip_idx] - 2
    frame_id = jnp.clip(frame_id, 0, max_id)
    fc = frames[clip_idx, frame_id]  # (..., 19)
    fn = frames[clip_idx, frame_id + 1]
    return fc, fn, frac[..., None]


def crouch_variant(frames, hip_delta=0.45, knee_delta=0.9, knee_max=2.50,
                   drop=None, joint_lower=None, joint_upper=None):
    """Synthesize a crouch-walk clip from walk frames (N, 19): fold the hips
    and knees, clamp to joint limits, and lower the base accordingly.

    The reference clip library has walk/run/jump/sit families but no crawl;
    the hole courses (playground_env holes: 0.25-0.3 m gaps under elevated
    blocks) need one, so the skill bank synthesizes it — the gait prior is
    a sampling PRIOR, not a dynamics ground truth, and the MPC's noise +
    physics rollouts adapt it. hip_y is joint index 1 of each leg triple,
    knee index 2 (leg-major FR,FL,HR,HL); drop defaults to the height loss
    implied by the leg geometry (thigh 0.2115 + shank 0.24 chain).
    """
    out = np.array(frames, np.float32, copy=True)
    q = out[:, 7:].reshape(-1, 4, 3)
    q[:, :, 1] -= hip_delta
    q[:, :, 2] = np.minimum(q[:, :, 2] + knee_delta, knee_max)
    if joint_lower is not None and joint_upper is not None:
        # retargeted mocap can slightly exceed URDF limits (Bullet clamps
        # at runtime); a synthesized prior should not add to that
        q[:] = np.clip(q, np.reshape(joint_lower, (4, 3)),
                       np.reshape(joint_upper, (4, 3)))
    if drop is None:
        # average standing-leg extension loss for the MAX geometry at these
        # offsets is ~0.16 m (robot/model FK; see tools/make_eval.py)
        drop = 0.16
    out[:, 2] = np.maximum(out[:, 2] - drop, 0.12)
    return out


def crawl_variant(frames, pose=(0.0, -0.2, 2.25), gain=0.3,
                  base_height=0.13, joint_lower=None, joint_upper=None,
                  knee_cap=2.45):
    """Synthesize a LOW crawl clip: a flat crawl pose plus the walk clip's
    joint oscillation scaled by `gain` (keeps the stepping rhythm at low
    amplitude).

    crouch_variant (fold hips/knees from the walk pose) bottoms out at a
    ~0.25 m total height because the walk's knee/wheel points swing ABOVE
    the base; a static-pose scan over (hip_y, knee) with the MAX FK finds
    poses with total top height ~0.19 m (base ~0.12, knees tucked below) —
    this builds a gait around one. Default pose (q1, q2, q3) = (0, -0.2,
    2.25) at gain 0.3: base ~0.15 m, top mean 0.22 / max 0.23 m over the
    gait cycle — inside the 0.25-0.3 m hole gaps of the reference courses
    (bullet_static_entities.py:366-422).
    knee_cap keeps the oscillation off the 2.544 rad URDF knee limit.
    """
    out = np.array(frames, np.float32, copy=True)
    q = out[:, 7:].reshape(-1, 4, 3)
    mean = q.mean(axis=0, keepdims=True)
    posa = np.reshape(np.asarray(pose, np.float32), (1, 1, 3))
    q[:] = posa + gain * (q - mean)
    q[:, :, 2] = np.minimum(q[:, :, 2], knee_cap)
    if joint_lower is not None and joint_upper is not None:
        q[:] = np.clip(q, np.reshape(joint_lower, (4, 3)),
                       np.reshape(joint_upper, (4, 3)))
    out[:, 2] = base_height
    return out


def highstep_variant(frames, gain=1.6, lift=0.10, joint_lower=None,
                     joint_upper=None):
    """Synthesize a high-stepping climb gait from walk frames (N, 19):
    amplify each leg's hip/knee oscillation about its temporal mean by
    `gain` (taller swing arcs -> foot clearance for 0.1-0.25 m cube steps,
    reference _generate_one_cube_set bullet_static_entities.py:424-500)
    and raise the base by `lift` so the stance legs extend, giving the
    climb headroom. Like crouch_variant this is a sampling PRIOR — MPPI
    noise + the physics rollouts adapt it to the actual cube faces.
    """
    out = np.array(frames, np.float32, copy=True)
    q = out[:, 7:].reshape(-1, 4, 3)
    mean = q.mean(axis=0, keepdims=True)
    q[:, :, 1:] = mean[:, :, 1:] + gain * (q[:, :, 1:] - mean[:, :, 1:])
    if joint_lower is not None and joint_upper is not None:
        q[:] = np.clip(q, np.reshape(joint_lower, (4, 3)),
                       np.reshape(joint_upper, (4, 3)))
    out[:, 2] += lift
    return out


def sample_frame(clips: MotionClips, clip_idx, t) -> FrameState:
    """Reference-state lookup, matching motion_lib.py interpolation exactly."""
    fc, fn, frac = _interp(clips, clip_idx, t)
    fs = clips.frame_step
    base_pos = fc[..., 0:3] + frac * (fn[..., 0:3] - fc[..., 0:3])
    base_orn = quat.slerp(fc[..., 3:7], fn[..., 3:7], frac[..., 0])
    base_lin_vel = (fn[..., 0:3] - fc[..., 0:3]) / fs
    base_ang_vel = quat.diff_rotvec(fn[..., 3:7], fc[..., 3:7]) / fs
    joint_pos = fc[..., 7:] + frac * (fn[..., 7:] - fc[..., 7:])
    joint_vel = (fn[..., 7:] - fc[..., 7:]) / fs
    return FrameState(
        base_pos=base_pos,
        base_orn=base_orn,
        base_lin_vel=base_lin_vel,
        base_ang_vel=base_ang_vel,
        joint_pos=joint_pos,
        joint_vel=joint_vel,
    )


def sample_future(clips: MotionClips, clip_idx, t):
    """Future reference states at t + TIME_FUTURE; stacked on a new axis -2.

    Mirrors motion_lib.py:75-86 (goals at +1/30, +1/15, +1/3, +1 s).
    """
    offsets = jnp.asarray(TIME_FUTURE)
    ts = jnp.asarray(t)[..., None] + offsets
    ci = jnp.asarray(clip_idx)[..., None]
    return sample_frame(clips, ci, ts)


def future_goal_features(base_pos, base_orn, future: FrameState):
    """Relative future-goal features in the robot base frame.

    Per future frame: [delta_pos_base (3), axis*angle of relative rotation (3),
    joint_pos (12)] -> concatenated (..., 4*18 = 72). Matches reference
    primitive_level_env.py:299-317 `calculate_future`.
    """
    q_inv = quat.inv(base_orn)[..., None, :]
    dpos = quat.rotate(q_inv, future.base_pos - base_pos[..., None, :])
    # relative rotation r_b^{-1} * r_goal, expressed as rotvec
    rel = quat.mul(q_inv, future.base_orn)
    rv = quat.to_rotvec(rel)
    feats = jnp.concatenate([dpos, rv, future.joint_pos], axis=-1)
    return feats.reshape(feats.shape[:-2] + (-1,))


def is_ended(clips: MotionClips, clip_idx, t):
    """End-of-clip check (reference motion_lib.py:168-172)."""
    frame_id = jnp.floor(t / clips.frame_step).astype(jnp.int32)
    return frame_id >= jnp.asarray(clips.lengths)[clip_idx] - clips.margin - 1


class ObstacleEvents(NamedTuple):
    """Jump-event obstacles per clip, padded to K_max events (device arrays).

    Built from utils.obstacle.obstacles_in_frames at load time. xy/yaw give
    the ground-projected obstacle pose, time the clip time of the jump peak.
    """

    xy: jnp.ndarray  # (C, K, 2)
    yaw: jnp.ndarray  # (C, K)
    time: jnp.ndarray  # (C, K), padded with +inf
    count: jnp.ndarray  # (C,)


def extract_obstacles(frame_arrays, frame_step, k_max=4) -> ObstacleEvents:
    from lifelike_tpu.utils.obstacle import obstacles_in_frames

    C = len(frame_arrays)
    xy = np.zeros((C, k_max, 2), np.float32)
    yaw = np.zeros((C, k_max), np.float32)
    time = np.full((C, k_max), np.inf, np.float32)
    count = np.zeros((C,), np.int32)
    rate = int(round(1.0 / frame_step))
    for i, f in enumerate(frame_arrays):
        ev = obstacles_in_frames(np.asarray(f), rate)
        if ev is None:
            continue
        k = min(len(ev["time"]), k_max)
        xy[i, :k] = ev["pos"][:k, :2]
        yaw[i, :k] = ev["yaw"][:k]
        time[i, :k] = ev["time"][:k]
        count[i] = k
    # numpy on purpose (closed over by jitted env steps; see pack_clips)
    return ObstacleEvents(xy=xy, yaw=yaw, time=time, count=count)


def current_obstacle(ev: ObstacleEvents, clip_idx, t):
    """Active obstacle pose at clip time t: the event index advances once t
    passes event_time + 0.5 s (reference primitive_level_env.py:262-268).
    Returns (xy (...,2), yaw (...,), active (...,) bool)."""
    ev_time, ev_count = jnp.asarray(ev.time), jnp.asarray(ev.count)
    times = ev_time[clip_idx]  # (..., K)
    idx = jnp.sum(t[..., None] > times + 0.5, axis=-1)
    idx = jnp.minimum(idx, jnp.maximum(ev_count[clip_idx] - 1, 0))
    xy = jnp.take_along_axis(
        jnp.asarray(ev.xy)[clip_idx], idx[..., None, None], axis=-2
    )[..., 0, :]
    yaw = jnp.take_along_axis(jnp.asarray(ev.yaw)[clip_idx], idx[..., None], axis=-1)[
        ..., 0
    ]
    return xy, yaw, ev_count[clip_idx] > 0


def obstacle_collision(xy, yaw, height, points):
    """True when any world point (..., P, 3) is inside the obstacle box
    (half extents [0.025, 0.5, height] at yaw; reference :182-188)."""
    d = points[..., :2] - xy[..., None, :]
    cs, sn = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    local_x = cs * d[..., 0] + sn * d[..., 1]
    local_y = -sn * d[..., 0] + cs * d[..., 1]
    inside = (
        (jnp.abs(local_x) < 0.025)
        & (jnp.abs(local_y) < 0.5)
        & (points[..., 2] < 2.0 * height)
    )
    return jnp.any(inside, axis=-1)


class PrioritizedClipSampler:
    """Host-side prioritized clip re-sampling: p ~ (1 - avg_reward)^factor
    (reference primitive_level_env.py:236-240). Feed per-episode average
    rewards; pass `.probabilities` to envs.primitive.reset."""

    def __init__(self, num_clips, factor=3.0):
        self.factor = factor
        self.avg_reward = np.zeros(num_clips)
        self._p = np.ones(num_clips) / num_clips

    def update(self, clip_idx, episode_avg_reward):
        idx = np.asarray(clip_idx).reshape(-1)
        r = np.asarray(episode_avg_reward).reshape(-1)
        self.avg_reward[idx] = r
        w = (1.0 - self.avg_reward) ** self.factor
        self._p = w / w.sum()

    def update_sums(self, reward_sum, episode_count):
        """Batch update from the learner's per-clip accumulators: for every
        clip with >= 1 ended episode this update, set avg_reward to the mean
        episode-average reward (last-write-wins, like the reference's
        per-episode assignment at primitive_level_env.py:236)."""
        cnt = np.asarray(episode_count)
        rs = np.asarray(reward_sum)
        seen = cnt > 0
        if not seen.any():
            return
        self.avg_reward[seen] = rs[seen] / cnt[seen]
        w = (1.0 - np.clip(self.avg_reward, 0.0, 1.0)) ** self.factor
        self._p = w / w.sum()

    @property
    def probabilities(self):
        return jnp.asarray(self._p)


def make_synthetic_clip(num_frames=240, frame_step=1.0 / 120.0, seed=0):
    """A smooth synthetic walking-ish clip for tests (no reference data needed)."""
    rng = np.random.default_rng(seed)
    t = np.arange(num_frames) * frame_step
    frames = np.zeros((num_frames, 19), dtype=np.float32)
    frames[:, 0] = 0.5 * t  # forward drift
    frames[:, 2] = 0.33 + 0.01 * np.sin(2 * np.pi * 1.5 * t)
    yaw = 0.05 * np.sin(2 * np.pi * 0.2 * t)
    frames[:, 5] = np.sin(yaw / 2)
    frames[:, 6] = np.cos(yaw / 2)
    base = np.array([-0.03, -0.75, 1.6] * 4, dtype=np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=12).astype(np.float32)
    amp = np.array([0.05, 0.25, 0.3] * 4, dtype=np.float32)
    frames[:, 7:] = base + amp * np.sin(
        2 * np.pi * 1.5 * t[:, None] + phase[None, :]
    )
    return frames
