"""Trajectory dump roundtrip + plot tool smoke."""
import subprocess
import sys

import numpy as np

from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.utils import trajectory


def _state(t):
    return RobotState(
        base_pos=np.asarray([0.1 * t, 0.0, 0.3]),
        base_orn=np.asarray([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=np.zeros(3),
        base_ang_vel=np.zeros(3),
        joint_pos=np.full(12, 0.1 * t),
        joint_vel=np.zeros(12),
    )


def test_dump_roundtrip_and_plot(tmp_path):
    path = str(tmp_path / "traj.npz")
    d = trajectory.TrajectoryDump(path)
    for t in range(5):
        d.add(_state(t), reward=np.asarray(0.9), episode=np.asarray(0))
    assert d.save() == path

    data = trajectory.load(path)
    assert data["base_pos"].shape == (5, 3)
    assert data["joint_pos"].shape == (5, 12)
    np.testing.assert_allclose(data["base_pos"][:, 0], 0.1 * np.arange(5))
    assert data["reward"].shape == (5,)

    out = str(tmp_path / "traj.png")
    r = subprocess.run(
        [sys.executable, "tools/plot_traj.py", path, "-o", out],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    import os

    assert os.path.getsize(out) > 10_000


def test_empty_dump_is_noop(tmp_path):
    d = trajectory.TrajectoryDump(str(tmp_path / "x.npz"))
    assert d.save() is None
