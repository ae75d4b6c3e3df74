#!/usr/bin/env python
"""Render a trajectory dump (.npz from --dump) to a PNG diagnostic sheet.

Host-side visualizer replacing the reference's PyBullet GUI (SURVEY §2.2):
four small multiples — top-down base path, base position components, joint
positions over time, per-step reward. One y-axis per panel; three-series
panels use the fixed colorblind-validated categorical order.

  python tools/plot_traj.py traj.npz [-o traj.png]
"""
import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# categorical slots 1-3 (all-pairs CVD-validated), text/grid inks
C1, C2, C3 = "#2a78d6", "#eb6834", "#1baf7a"
INK, MUTED = "#0b0b0b", "#52514e"


def _squeeze(a):
    """(T, ..., k) -> (T, k) by flattening/selecting the first batch/agent."""
    a = np.asarray(a)
    while a.ndim > 2:
        a = a[:, 0]
    return a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    out = args.out or args.npz.rsplit(".", 1)[0] + ".png"

    with np.load(args.npz) as z:
        data = {k: z[k] for k in z.files}
    pos = _squeeze(data["base_pos"])  # (T, 3)
    jq = _squeeze(data["joint_pos"])  # (T, 12)
    rew = _squeeze(data["reward"]).reshape(len(pos), -1)[:, 0] if "reward" in data else None
    t = np.arange(len(pos))

    fig, axes = plt.subplots(2, 2, figsize=(10, 7), facecolor="#fcfcfb")
    for ax in axes.flat:
        ax.set_facecolor("#fcfcfb")
        ax.grid(True, color="#e4e3de", linewidth=0.6)
        ax.tick_params(colors=MUTED, labelsize=8)
        for s in ax.spines.values():
            s.set_color("#e4e3de")

    ax = axes[0, 0]
    ax.plot(pos[:, 0], pos[:, 1], color=C1, linewidth=1.8)
    ax.plot(pos[0, 0], pos[0, 1], "o", color=C1, markersize=6)
    ax.annotate("start", (pos[0, 0], pos[0, 1]), color=MUTED, fontsize=8,
                xytext=(4, 4), textcoords="offset points")
    ax.set_title("base path (top-down)", color=INK, fontsize=10)
    ax.set_xlabel("x [m]", color=MUTED, fontsize=8)
    ax.set_ylabel("y [m]", color=MUTED, fontsize=8)
    ax.set_aspect("equal", adjustable="datalim")

    ax = axes[0, 1]
    for i, (lbl, c) in enumerate((("x", C1), ("y", C2), ("z", C3))):
        ax.plot(t, pos[:, i], color=c, linewidth=1.8, label=lbl)
    ax.legend(frameon=False, fontsize=8, labelcolor=MUTED)
    ax.set_title("base position", color=INK, fontsize=10)
    ax.set_xlabel("control step", color=MUTED, fontsize=8)
    ax.set_ylabel("[m]", color=MUTED, fontsize=8)

    ax = axes[1, 0]
    im = ax.imshow(jq.T, aspect="auto", cmap="Blues", interpolation="nearest")
    ax.set_title("joint positions [rad]", color=INK, fontsize=10)
    ax.set_xlabel("control step", color=MUTED, fontsize=8)
    ax.set_yticks(range(12))
    legs = [f"{l}{j}" for l in ("FR", "FL", "HR", "HL") for j in (1, 2, 3)]
    ax.set_yticklabels(legs, fontsize=7)
    ax.grid(False)
    fig.colorbar(im, ax=ax, shrink=0.85).ax.tick_params(
        colors=MUTED, labelsize=7
    )

    ax = axes[1, 1]
    if rew is not None:
        ax.plot(t, rew, color=C2, linewidth=1.8)
        ax.set_title("reward / step", color=INK, fontsize=10)
    else:
        ax.set_title("(no reward in dump)", color=MUTED, fontsize=10)
    ax.set_xlabel("control step", color=MUTED, fontsize=8)

    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(out)


if __name__ == "__main__":
    main()
