"""Native C++ clip parser vs the json fallback, and load_clips integration."""
import json

import numpy as np

from lifelike_tpu import _native
from lifelike_tpu.motion import motion_lib


def _write_clip(path, n_frames=7, frame_duration=1.0 / 120.0, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.normal(size=(n_frames, 19)).round(6).tolist()
    path.write_text(
        json.dumps(
            {
                "FrameDuration": frame_duration,
                "LegOrder": ["FR", "FL", "HR", "HL"],
                "Frames": frames,
            }
        )
    )
    return np.asarray(frames, np.float32)


def test_native_parse_matches_json(tmp_path):
    p = tmp_path / "clip_ret.txt"
    expect = _write_clip(p, n_frames=11, seed=1)
    parsed = _native.parse_clip_file(str(p))
    assert parsed is not None, "g++ is in the image; native build must work"
    frames, fd = parsed
    assert frames.shape == (11, 19)
    np.testing.assert_allclose(frames, expect, rtol=1e-6)
    assert abs(fd - 1.0 / 120.0) < 1e-12


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("{not json at all")
    assert _native.parse_clip_file(str(p)) is None


def test_load_clips_uses_same_data_either_path(tmp_path):
    for i in range(3):
        _write_clip(tmp_path / f"c{i}_ret.txt", n_frames=5 + i, seed=i)
    clips = motion_lib.load_clips(str(tmp_path))
    assert clips.num_clips == 3
    assert list(np.asarray(clips.lengths)) == [5, 6, 7]
    assert abs(clips.frame_step - 1.0 / 120.0) < 1e-12
    # padded region repeats the final frame
    f = np.asarray(clips.frames)
    np.testing.assert_array_equal(f[0, 5], f[0, 4])
