"""MPC evaluation CLI: closed-loop mocap tracking with the MPPI solver.

The solver-side counterpart of the reference eval script
(test_scripts/primitive_level/test_primitive_level_env.py): instead of a
pretrained policy, the tile-layout MPPI solves the tracking problem online
and reports per-episode reward statistics.

  python -m lifelike_tpu.bin.run_mpc \
    --clip=/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt \
    --steps=100 --population=512 --horizon=10
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("clip", "/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt",
                    "mocap clip file or directory")
flags.DEFINE_integer("steps", 50, "control steps to run")
flags.DEFINE_integer("population", 512, "MPPI population")
flags.DEFINE_integer("horizon", 10, "MPC horizon (control steps)")
flags.DEFINE_integer("iterations", 1, "MPPI iterations per solve")
flags.DEFINE_integer("seed", 0, "prng seed")
flags.DEFINE_bool("cpu", False, "force CPU backend")
flags.DEFINE_string("dump", "", "write the closed-loop trajectory to this .npz")


def main(argv):
    del argv
    if FLAGS.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lifelike_tpu.envs import primitive
    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi, mppi_tl

    model = build_max_model()
    clips = motion_lib.load_clips(FLAGS.clip)
    cfg = primitive.PrimitiveEnvConfig()
    mcfg = mppi.MPPIConfig(
        horizon=FLAGS.horizon, population=FLAGS.population,
        iterations=FLAGS.iterations,
    )
    c = B.tl_constants(model)

    key = jax.random.PRNGKey(FLAGS.seed)
    env, obs = primitive.reset(model, clips, cfg, key)
    ctrl = mppi_tl.make_mpc_controller(model, c, cfg.params, clips, mcfg)
    step = jax.jit(lambda e, a: primitive.step(model, clips, cfg, e, a))

    u = jnp.zeros((mcfg.horizon, 4, 3))
    from lifelike_tpu.utils.trajectory import TrajectoryDump

    dump = TrajectoryDump(FLAGS.dump) if FLAGS.dump else None
    rewards, ep_rewards, ep_lens = [], [], []
    t_solve = []
    for i in range(FLAGS.steps):
        key, k, kr = jax.random.split(key, 3)
        t0 = time.perf_counter()
        tgt, u, diag = ctrl(k, env.robot, env.clip_idx, env.t, u)
        jax.block_until_ready(tgt)
        t_solve.append(time.perf_counter() - t0)
        action = tgt - env.robot.joint_pos
        env, obs, r, done, info = step(env, action)
        rewards.append(float(r))
        if dump:
            dump.add(env.robot, reward=r, solve_ms=1e3 * t_solve[-1])
        if bool(done):
            ep_rewards.append(sum(rewards))
            ep_lens.append(len(rewards))
            logging.info(
                "episode end at step %d: reward_sum=%.2f len=%d (%s)",
                i, ep_rewards[-1], ep_lens[-1],
                {k2: bool(v) for k2, v in info.items()},
            )
            rewards = []
            env, obs = primitive.reset(model, clips, cfg, kr)
            u = jnp.zeros_like(u)
    if rewards:
        ep_rewards.append(sum(rewards))
        ep_lens.append(len(rewards))
    logging.info(
        "MPC eval: %d episodes | mean reward/step %.4f | mean ep len %.1f | "
        "solve p50 %.1f ms",
        len(ep_rewards),
        float(np.sum(ep_rewards) / max(np.sum(ep_lens), 1)),
        float(np.mean(ep_lens)),
        1e3 * float(np.percentile(t_solve[1:], 50)) if len(t_solve) > 1 else -1,
    )
    if FLAGS.dump:
        logging.info("trajectory written to %s", dump.save())


if __name__ == "__main__":
    app.run(main)
