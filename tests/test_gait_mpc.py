"""Gait-prior MPC: closed-loop locomotion regression.

Round-3 finding (EVAL.md): MPPI over raw joint-target deltas cannot
synthesize a quadruped gait — closed-loop it sinks to the ground (the
posture costs alone don't fix it) and creeps ~0.3 m before falling. The
gait-prior controllers (mpc_tasks.make_gait_traversal_controller /
make_gait_chase_solver) mirror the reference's LLC/MLC split: controls are
deltas on a walk-clip joint trajectory (epmc_net drives the frozen
mocap-prior PMC decoder the same way, epmc_net.py:166-174).

This pins the architectural claim at small sizes: driving the playground
env closed-loop for 50 steps, the gait controller stays upright and makes
forward progress.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.envs import playground
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import batched as B
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import playground_gen
from lifelike_tpu.solver import mpc_tasks
from lifelike_tpu.solver.mppi import MPPIConfig

MODEL = build_max_model()
CLIP = "/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt"


@pytest.mark.slow
def test_gait_traversal_walks_closed_loop():
    clips = motion_lib.load_clips(CLIP)
    # joystick course (element 0): flat ground + corridor walls
    cfg = playground.PlaygroundConfig(
        scene=playground_gen.PlaygroundConfig(element_id=0)
    )
    c = B.tl_constants(MODEL, dtype=jnp.float32)
    mcfg = MPPIConfig(horizon=5, population=128, iterations=1, sigma=0.12)
    ctrl = mpc_tasks.make_gait_traversal_controller(
        MODEL, c, cfg.params, mcfg, clips, reward_type=cfg.reward_type,
    )
    step = jax.jit(lambda st, a, k: playground.step(MODEL, cfg, st, a, k))
    key = jax.random.PRNGKey(4)
    key, kr = jax.random.split(key)
    s, obs = playground.reset(MODEL, cfg, kr)
    start = np.asarray(s.robot.base_pos).copy()
    tgt_dir = np.asarray(s.target_pos)[:2] - start[:2]
    tgt_dir /= np.linalg.norm(tgt_dir) + 1e-9
    u = jnp.zeros((mcfg.horizon, 4, 3))
    t_clip = 0.5
    fell = False
    zs = []
    for t in range(100):
        key, k, ke = jax.random.split(key, 3)
        tgt, u, _ = ctrl(k, s.robot, s.scene, s.target_pos, s.target_spd,
                         jnp.asarray(t_clip, jnp.float32), u)
        s, obs, r, done, info = step(s, tgt - s.robot.joint_pos, ke)
        t_clip = 0.5 if t_clip + 0.02 > 4.5 else t_clip + 0.02
        zs.append(float(s.robot.base_pos[2]))
        if bool(done) and bool(info["fall"]):
            fell = True
            break
    end = np.asarray(s.robot.base_pos)
    moved = float(np.linalg.norm((end - start)[:2]))
    assert not fell, "gait controller fell within 100 steps"
    # upright for the whole 2 s: the raw-delta failure mode is a slow
    # collapse to z ~ 0.02 ("lie flat" local optimum)
    assert min(zs[20:]) > 0.15, min(zs[20:])
    assert end[2] > 0.2, end
    # and the gait actually moves the base (turn-in-place + first steps;
    # raw-delta MPPI stays glued near the origin while sinking)
    assert moved > 0.08, moved


def test_multigait_bank_selects_and_executes():
    """Two-prior bank (walk + jump): both solves run, selection is by
    weighted cost, and the executed target is consistent with the selected
    prior's reference joints."""
    clips = motion_lib.load_clips([
        CLIP, "/root/reference/data/mocap_data/dog_jump_002_ret.txt",
    ])
    assert clips.num_clips == 2
    cfg = playground.PlaygroundConfig(
        scene=playground_gen.PlaygroundConfig(element_id=1)
    )
    c = B.tl_constants(MODEL, dtype=jnp.float64)
    mcfg = MPPIConfig(horizon=4, population=32, iterations=1, sigma=0.12)
    ctrl = mpc_tasks.make_multigait_traversal_controller(
        MODEL, c, cfg.params, mcfg, clips, priors=[(0,), (1,)],
        reward_type=cfg.reward_type,
    )
    key = jax.random.PRNGKey(0)
    key, kr = jax.random.split(key)
    s, obs = playground.reset(MODEL, cfg, kr)
    u_exec, u_next, sel, diag = ctrl(
        key, s.robot, s.scene, s.target_pos, s.target_spd,
        jnp.asarray([0.5, 0.7]), jnp.zeros((2, 4, 4, 3)),
    )
    costs = np.asarray(diag["prior_costs"])
    assert costs.shape == (2,) and np.all(np.isfinite(costs))
    assert int(sel) == int(np.argmin(costs))
    assert u_exec.shape == (12,) and u_next.shape == (2, 4, 4, 3)


def test_crouch_variant_geometry():
    """Synthesized crouch-walk (motion_lib.crouch_variant): joints stay
    inside URDF limits and the implied standing height drops to fit the
    0.25-0.3 m hole gaps (base ~0.19 m, trunk top ~0.25 m)."""
    import json

    from lifelike_tpu.physics import dynamics
    from lifelike_tpu.physics.dynamics import RobotState

    fr = np.asarray(json.load(open(CLIP))["Frames"], np.float32)
    cr = motion_lib.crouch_variant(
        fr, joint_lower=MODEL.joint_lower, joint_upper=MODEL.joint_upper
    )
    q = cr[:, 7:]
    assert np.all(q <= MODEL.joint_upper_flat + 1e-6)
    assert np.all(q >= MODEL.joint_lower_flat - 1e-6)
    # FK height with feet on the ground for a mid-clip crouch pose
    s = RobotState(
        jnp.zeros(3), jnp.asarray([0, 0, 0, 1.0]), jnp.zeros(3),
        jnp.zeros(3), jnp.asarray(q[len(q) // 2], jnp.float64),
        jnp.zeros(12),
    )
    kin = dynamics.forward_kinematics(MODEL, s)
    height = -float(jnp.min(kin.p_foot[:, 2])) + MODEL.foot_radius
    assert height < 0.24, height  # crouched well below the 0.25 m gap
    assert height > 0.12, height  # but not collapsed
    # and the recorded base z in the frames is consistent with the drop
    assert np.all(cr[:, 2] <= fr[:, 2] - 0.1)
