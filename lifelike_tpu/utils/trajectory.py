"""Offline trajectory dump — the rendering replacement.

The reference renders through the PyBullet GUI and logs mp4 state files
(reference primitive_level_env.py:58-95, legged_robot.py:181-197). A TPU
program has no GUI; SURVEY §2.2 maps that capability to an offline
trajectory dump + host-side visualizer. `TrajectoryDump` collects RobotState
snapshots (+ rewards/extras) during an eval/MPC run and writes one
compressed .npz; `tools/plot_traj.py` renders it.
"""
import numpy as np


class TrajectoryDump:
    def __init__(self, path: str):
        self.path = path
        self._rows = {}
        self.n = 0

    def add(self, robot_state, reward=None, **extras):
        """Append one control-step snapshot. robot_state: any NamedTuple with
        base_pos/base_orn/joint_pos/... leaves (batch/agent axes kept)."""
        row = {f: np.asarray(getattr(robot_state, f))
               for f in robot_state._fields}
        if reward is not None:
            row["reward"] = np.asarray(reward)
        for k, v in extras.items():
            row[k] = np.asarray(v)
        for k, v in row.items():
            self._rows.setdefault(k, []).append(v)
        self.n += 1

    def save(self):
        if not self.n:
            return None
        arrays = {k: np.stack(v) for k, v in self._rows.items()}
        np.savez_compressed(self.path, **arrays)
        return self.path


def load(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
