"""Distill imported EPMC policies into solver gait-prior clips.

The reference's environmental-level models
(/root/reference/data/models/environmental_level_{hole,cube}.model) traverse
hole bars and cube steps with maneuvers the mocap library does not contain
(no crawl or mantle clips ship with the reference; its EPMC learns them
end-to-end through the codebook, epmc_net.py:166-174). The solver-side MPC
needs those maneuvers as gait priors (solver/mpc_tasks.
make_multigait_traversal_controller). This tool closes the loop:

  1. roll the imported model closed-loop in envs.playground under the
     REFERENCE eval config (tools/make_eval.EVAL_ENV_CONFIG);
  2. mine the trajectory for the element's maneuver —
       holes: the fastest sustained crouch-crawl window (base z < z_max
              throughout, forward speed maximized);
       cubes: the cleanest mantle (base z rises >= 0.18 m while advancing);
  3. re-origin the window (start at x=y=0, heading +x), resample the 50 Hz
     control-step states to 120 Hz clip frames, and write a reference-format
     clip JSON {"FrameDuration": 1/120, "Frames": [[pos(3), quat xyzw(4),
     joints(12)], ...]} to lifelike_tpu/data/priors/.

The distilled clips plug into the same clip bank as the mocap priors
(tools/make_eval.eval_traversal loads them when present); the gait prior is
consumed joint-space-only (rollout_tasks.rollout_traversal_gait), so the
base columns only document the recorded maneuver.

  python tools/distill_prior.py --task hole --episodes 3
  python tools/distill_prior.py --task cube --episodes 3
"""
import argparse
import ast
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # tunnel is single-tenant

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
PRIOR_DIR = os.path.join(REPO, "lifelike_tpu", "data", "priors")
MODELS = {
    "hole": "/root/reference/data/models/environmental_level_hole.model",
    "cube": "/root/reference/data/models/environmental_level_cube.model",
}


def roll_policy(task, episodes, max_steps, seed):
    """Argmax closed-loop episodes; returns per-episode state dicts."""
    from tools.make_eval import EVAL_ENV_CONFIG

    from lifelike_tpu.compat import tleague_import
    from lifelike_tpu.envs import factory
    from lifelike_tpu.models.epmc import EPMCNet

    env_config = ast.literal_eval(EVAL_ENV_CONFIG[f"epmc_{task}"])
    env_config["max_steps"] = max_steps
    bundle = factory.create_playground_game(**env_config)
    net = EPMCNet()
    key = jax.random.PRNGKey(seed)
    env_state, obs = bundle.reset(key)
    hs = net.initial_state(())
    params = net.init({"params": key, "z": key}, obs._asdict(), hs,
                      jnp.zeros(()))
    params = tleague_import.import_epmc(MODELS[task], params)
    fwd = jax.jit(lambda p, o, h, k: net.apply(p, o._asdict(), h,
                                               jnp.zeros(()), rngs={"z": k}))
    step = jax.jit(lambda s, a, k: bundle.step(s, a, k))

    eps = []
    for ep in range(episodes):
        key, k = jax.random.split(key)
        env_state, obs = bundle.reset(k)
        hs = net.initial_state(())
        rows = []
        fell = False
        for _ in range(max_steps):
            key, k1, k2 = jax.random.split(key, 3)
            out = fwd(params, obs, hs, k1)
            hs = out.hs
            env_state, obs, r, done, info = step(
                env_state, {"A_Z": out.z_idx, "A_LLC": out.mean}, k2
            )
            rb = env_state.robot
            rows.append(np.concatenate([
                np.asarray(rb.base_pos), np.asarray(rb.base_orn),
                np.asarray(rb.joint_pos),
            ]))
            if bool(done):
                fell = bool(info["fall"])
                break
        eps.append(dict(states=np.stack(rows), fell=fell))
        print(f"  {task} ep {ep}: {len(rows)} steps, "
              f"x {eps[-1]['states'][-1][0]:.1f} m, fell={fell}", flush=True)
    return eps


def find_crawl(eps, z_max=0.26, z_min=0.10, widths=(60, 75, 100, 125)):
    """Fastest sustained-crouch window across episodes: (ep, t0, W, speed)."""
    best = None
    for ei, ep in enumerate(eps):
        s = ep["states"]
        x, z = s[:, 0], s[:, 2]
        for W in widths:
            for t0 in range(0, len(s) - W):
                zz = z[t0:t0 + W]
                if zz.max() < z_max and zz.min() > z_min:
                    spd = (x[t0 + W - 1] - x[t0]) / (W * 0.02)
                    if best is None or spd > best[3]:
                        best = (ei, t0, W, spd)
    return best


def find_mantle(eps, rise_min=0.18, span=(10, 60), pre=12, post=15):
    """Cleanest mantle: base z rises >= rise_min within `span` steps while
    advancing; window padded by pre/post approach/landing steps. Picks the
    FASTEST qualifying mount (max forward speed over the window)."""
    best = None
    for ei, ep in enumerate(eps):
        s = ep["states"]
        x, z = s[:, 0], s[:, 2]
        n = len(s)
        for t0 in range(pre, n - span[0] - post):
            for dt in range(span[0], min(span[1], n - t0 - post)):
                rise = z[t0 + dt] - z[t0]
                if rise >= rise_min and x[t0 + dt] > x[t0] + 0.2:
                    a, b = t0 - pre, t0 + dt + post
                    spd = (x[b - 1] - x[a]) / ((b - a) * 0.02)
                    if best is None or spd > best[3]:
                        best = (ei, a, b - a, spd)
                    break  # smallest qualifying dt for this t0
    return best


def _yaw_of(q):
    """Heading yaw of quaternion(s) xyzw: forward = R @ [1,0,0]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    fx = 1.0 - 2.0 * (y * y + z * z)
    fy = 2.0 * (x * y + w * z)
    return np.arctan2(fy, fx)


def _quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def reorient_resample(states, fps_in=50.0, fps_out=120.0):
    """Re-origin to x=y=0 / heading +x at frame 0, resample to clip rate."""
    pos = states[:, 0:3].copy()
    quat = states[:, 3:7].copy()
    joints = states[:, 7:19]
    yaw0 = float(_yaw_of(quat[0]))
    c, s = np.cos(-yaw0), np.sin(-yaw0)
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    pos = (pos - [pos[0, 0], pos[0, 1], 0.0]) @ rot.T
    qz = np.array([0.0, 0.0, np.sin(-yaw0 / 2.0), np.cos(-yaw0 / 2.0)])
    quat = _quat_mul(np.broadcast_to(qz, quat.shape), quat)

    t_in = np.arange(len(states)) / fps_in
    t_out = np.arange(int(np.floor(t_in[-1] * fps_out)) + 1) / fps_out
    cols = []
    for arr in (pos, quat, joints):
        cols.append(np.stack([
            np.interp(t_out, t_in, arr[:, i]) for i in range(arr.shape[1])
        ], axis=1))
    pos_o, quat_o, joints_o = cols
    quat_o /= np.linalg.norm(quat_o, axis=-1, keepdims=True)  # nlerp
    return np.concatenate([pos_o, quat_o, joints_o], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=("hole", "cube"), required=True)
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--max_steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    eps = roll_policy(args.task, args.episodes, args.max_steps, args.seed)
    if args.task == "hole":
        hit = find_crawl(eps)
        name = "hole_crawl"
    else:
        hit = find_mantle(eps)
        name = "cube_mantle"
    assert hit is not None, "no qualifying maneuver window found"
    ei, t0, W, spd = hit
    print(f"selected ep {ei} steps [{t0}, {t0 + W}) speed {spd:.2f} m/s",
          flush=True)
    frames = reorient_resample(eps[ei]["states"][t0:t0 + W])
    out = args.out or os.path.join(PRIOR_DIR, f"{name}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({
            "FrameDuration": 1.0 / 120.0,
            "Frames": [[round(float(v), 6) for v in row] for row in frames],
            "Distilled": {
                "source_model": MODELS[args.task],
                "episode": int(ei), "window_steps": [int(t0), int(t0 + W)],
                "mean_speed_mps": round(float(spd), 3),
            },
        }, f)
    print(f"wrote {out}: {len(frames)} frames @120 Hz "
          f"({len(frames) / 120.0:.2f} s), z range "
          f"[{frames[:, 2].min():.2f}, {frames[:, 2].max():.2f}]", flush=True)


if __name__ == "__main__":
    main()
