"""Generate golden fidelity traces for tests/test_fidelity_oracle.py.

Backend preference (recorded in each trace's metadata):
  1. REAL PyBullet, when importable — steps the reference's own LeggedRobot
     configuration (10 solver iterations, 1 substep, g=9.80665, PD kp 50 /
     kd 0.5 / tau 18, reference legged_robot.py:240-264) on max.urdf.
  2. tools.bullet_oracle.BulletOracle — an independent sequential-impulse
     implementation of the same solver family (this image has no network
     egress, so pybullet cannot be installed; see bullet_oracle.py docstring).

Scenarios (all 50 Hz control, 10 x 500 Hz substeps):
  * stand:  hold STATES_INFO_12_RUN_0 joints for 50 steps (1 s)
  * walk:   track dog_quad_walkrun_001_ret joint targets from t0=0.5 s
  * run:    same clip from t0=6.0 s (the run section)

Each .npz: init_* arrays, targets (H, 12), oracle joint_pos/base_pos/
base_orn/joint_vel/base_lin_vel/base_ang_vel per control step, and metadata.

  python tools/make_oracle_traces.py --out lifelike_tpu/data/oracle_traces
"""
import argparse
import json
import os

import numpy as np

CLIP = "/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt"
STAND = np.array([
    -0.0278, -0.7790, 1.6873, -0.0276, -0.7777, 1.6838,
    -0.0278, -0.7334, 1.5669, -0.0276, -0.7319, 1.5632,
])
FIELDS = ("base_pos", "base_orn", "base_lin_vel", "base_ang_vel",
          "joint_pos", "joint_vel")


def _try_pybullet():
    try:
        import pybullet  # noqa: F401

        return True
    except ImportError:
        return False


def run_pybullet(init, targets, scene=None):
    """Step the reference LeggedRobot config under real PyBullet.
    scene: optional (centers (K, 3), halves (K, 3)) static boxes."""
    import pybullet
    import pybullet_data
    from pybullet_utils import bullet_client

    urdf = ("/root/reference/src/lifelike/sim_envs/pybullet_envs/"
            "legged_robot/data/urdf/max.urdf")
    bc = bullet_client.BulletClient(connection_mode=pybullet.DIRECT)
    bc.setAdditionalSearchPath(pybullet_data.getDataPath())
    bc.loadURDF("plane.urdf")
    if scene is not None:
        for c, h in zip(*scene):
            col = bc.createCollisionShape(pybullet.GEOM_BOX, halfExtents=list(h))
            bc.createMultiBody(baseCollisionShapeIndex=col, basePosition=list(c))
    rid = bc.loadURDF(urdf, init["base_pos"], init["base_orn"],
                      flags=pybullet.URDF_USE_SELF_COLLISION)
    # actuated joints by name (reference constants.py joint groups)
    names = [f"joint_{leg}{i}" for leg in ("FR", "FL", "HR", "HL")
             for i in (1, 2, 3)]
    idx = {}
    for j in range(bc.getNumJoints(rid)):
        idx[bc.getJointInfo(rid, j)[1].decode()] = j
    joints = [idx[n] for n in names]
    for k, j in enumerate(joints):
        bc.resetJointState(rid, j, init["joint_pos"][k],
                           init["joint_vel"][k])
    bc.resetBaseVelocity(rid, init["base_lin_vel"], init["base_ang_vel"])
    bc.setJointMotorControlArray(
        rid, joints, pybullet.POSITION_CONTROL,
        targetPositions=[0] * 12, targetVelocities=[0] * 12,
        forces=[0.0] * 12, positionGains=[0.0] * 12, velocityGains=[0.0] * 12,
    )
    bc.setGravity(0, 0, -9.80665)
    bc.setPhysicsEngineParameter(numSolverIterations=10, numSubSteps=1)
    bc.setTimeStep(1.0 / 500.0)
    out = {f: [] for f in FIELDS}
    for t in range(targets.shape[0]):
        tgt = np.clip(targets[t], -3.0, 3.0)
        for _ in range(10):
            q = np.array([bc.getJointState(rid, j)[0] for j in joints])
            qd = np.array([bc.getJointState(rid, j)[1] for j in joints])
            tau = np.clip(50.0 * (tgt - q) + 0.5 * (0.0 - qd), -18.0, 18.0)
            bc.setJointMotorControlArray(
                rid, joints, pybullet.TORQUE_CONTROL, forces=tau
            )
            bc.stepSimulation()
        p, o = bc.getBasePositionAndOrientation(rid)
        lv, av = bc.getBaseVelocity(rid)
        out["base_pos"].append(p)
        out["base_orn"].append(o)
        out["base_lin_vel"].append(lv)
        out["base_ang_vel"].append(av)
        out["joint_pos"].append(
            [bc.getJointState(rid, j)[0] for j in joints])
        out["joint_vel"].append(
            [bc.getJointState(rid, j)[1] for j in joints])
    bc.disconnect()
    return {k: np.asarray(v) for k, v in out.items()}, "pybullet"


def run_fallback(init, targets, scene=None):
    from lifelike_tpu.robot.model import build_max_model
    from tools.bullet_oracle import BulletOracle, OracleState

    orc = BulletOracle(build_max_model(), scene=scene)
    s = OracleState(**{k: np.asarray(v, float).copy() for k, v in init.items()})
    out = {f: [] for f in FIELDS}
    for t in range(targets.shape[0]):
        s = orc.control_step(s, targets[t])
        for f in FIELDS:
            out[f].append(getattr(s, f).copy())
    return {k: np.asarray(v) for k, v in out.items()}, "bullet_oracle"


def scenarios(H):
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon
    import jax.numpy as jnp

    from lifelike_tpu.motion import motion_lib

    clips = motion_lib.load_clips(CLIP)

    def clip_scenario(t0):
        fr0 = motion_lib.sample_frame(clips, jnp.asarray(0), jnp.asarray(t0))
        init = {f: np.asarray(getattr(fr0, f), float) for f in FIELDS}
        targets = np.asarray(jax.vmap(
            lambda i: motion_lib.sample_frame(
                clips, jnp.asarray(0), t0 + i * 0.02
            ).joint_pos
        )(jnp.arange(H)))
        return init, targets

    stand_init = dict(
        base_pos=np.array([0.0, 0.0, 0.33]),
        base_orn=np.array([0.0, 0.0, 0.0, 1.0]),
        base_lin_vel=np.zeros(3), base_ang_vel=np.zeros(3),
        joint_pos=STAND.copy(), joint_vel=np.zeros(12),
    )
    yield "stand", stand_init, np.tile(STAND, (H, 1)), None
    yield ("walk",) + clip_scenario(0.5) + (None,)
    yield ("run",) + clip_scenario(6.0) + (None,)
    # hurdle-contact transition: the robot walks on a low platform with a
    # 12 cm hurdle at its front edge (reference _generate_one_hurdle
    # geometry family, bullet_static_entities.py:310-364) — the open-loop
    # walk drifts across the platform edge and into the hurdle face, so the
    # trace exercises +z box normals, lateral face normals AND the
    # transition off the box (567 active box impulses over H=50, measured)
    hurdle = (np.array([[0.0, 0.0, 0.025], [0.28, 0.0, 0.06]]),
              np.array([[0.6, 1.0, 0.025], [0.04, 1.0, 0.06]]))
    yield ("hurdle",) + clip_scenario(0.5) + (hurdle,)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lifelike_tpu/data/oracle_traces")
    ap.add_argument("--horizon", type=int, default=50)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    use_pb = _try_pybullet()
    for name, init, targets, scene in scenarios(args.horizon):
        if use_pb and scene is None:
            traj, backend = run_pybullet(init, targets)
        elif use_pb and scene is not None:
            traj, backend = run_pybullet(init, targets, scene=scene)
        else:
            traj, backend = run_fallback(init, targets, scene=scene)
        path = os.path.join(args.out, f"{name}.npz")
        np.savez_compressed(
            path,
            targets=targets,
            meta=json.dumps(dict(
                backend=backend, scenario=name, horizon=args.horizon,
                kp=50.0, kd=0.5, max_tau=18.0, mu=0.5, dt=1.0 / 500.0,
                substeps=10, clip=CLIP,
            )),
            **{f"init_{k}": v for k, v in init.items()},
            **({"scene_centers": scene[0], "scene_halves": scene[1]}
               if scene is not None else {}),
            **traj,
        )
        print(f"{path}: backend={backend} H={args.horizon}")


if __name__ == "__main__":
    main()
