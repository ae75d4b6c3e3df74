"""MPC evaluation CLI: closed-loop solves for all three task levels.

The solver-side counterpart of the reference eval scripts
(test_scripts/{primitive,environmental,strategic}_level/): instead of a
pretrained policy, the tile-layout MPPI solves the task online and reports
per-episode statistics.

  # PMC mocap tracking (reference test_primitive_level_env.py)
  python -m lifelike_tpu.bin.run_mpc --task=pmc \
    --clip=/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt

  # EPMC terrain traversal (reference test_environmental_level_env.py)
  python -m lifelike_tpu.bin.run_mpc --task=epmc --element_id=1

  # SEPMC two-robot Chase Tag (reference test_strategic_level_env.py)
  python -m lifelike_tpu.bin.run_mpc --task=sepmc
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_enum("task", "pmc", ["pmc", "epmc", "sepmc"],
                  "which level's MPC problem to solve")
flags.DEFINE_string("clip", "/root/reference/data/mocap_data/dog_quad_walkrun_001_ret.txt",
                    "mocap clip file or directory (pmc)")
flags.DEFINE_integer("element_id", 1, "playground element (epmc): 0 joystick, "
                     "1 hurdles, 2 holes, 3 cubes")
flags.DEFINE_integer("steps", 50, "control steps to run")
flags.DEFINE_integer("population", 512, "MPPI population")
flags.DEFINE_integer("horizon", 10, "MPC horizon (control steps)")
flags.DEFINE_integer("iterations", 1, "MPPI iterations per solve")
flags.DEFINE_integer("best_response", 1, "alternating best-response rounds (sepmc)")
flags.DEFINE_bool("hybrid", False,
                  "MPPI->iLQR hybrid solver (all three tasks)")
flags.DEFINE_integer("ilqr_iterations", 2, "iLQR polish iterations (--hybrid)")
flags.DEFINE_integer("n_refine", 7, "top raw candidates refined (--hybrid)")
flags.DEFINE_integer("seed", 0, "prng seed")
flags.DEFINE_bool("cpu", False, "force CPU backend")
flags.DEFINE_string("dump", "", "write the closed-loop trajectory to this .npz")


def _report(name, ep_rewards, ep_lens, t_solve):
    logging.info(
        "%s MPC eval: %d episodes | mean reward/step %.4f | mean ep len %.1f"
        " | solve p50 %.1f ms",
        name, len(ep_rewards),
        float(np.sum(ep_rewards) / max(np.sum(ep_lens), 1)),
        float(np.mean(ep_lens)) if ep_lens else 0.0,
        1e3 * float(np.percentile(t_solve[1:], 50)) if len(t_solve) > 1 else -1,
    )


def run_pmc(key):
    from lifelike_tpu.envs import primitive
    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi, mppi_tl
    from lifelike_tpu.utils.trajectory import TrajectoryDump

    model = build_max_model()
    clips = motion_lib.load_clips(FLAGS.clip)
    cfg = primitive.PrimitiveEnvConfig()
    mcfg = mppi.MPPIConfig(horizon=FLAGS.horizon, population=FLAGS.population,
                           iterations=FLAGS.iterations)
    c = B.tl_constants(model)
    env, obs = primitive.reset(model, clips, cfg, key)
    if FLAGS.hybrid:
        from lifelike_tpu.solver import hybrid, ilqr

        ctrl = hybrid.make_hybrid_controller(
            model, c, cfg.params, clips, mcfg,
            ilqr.ILQRConfig(iterations=FLAGS.ilqr_iterations),
            n_refine=FLAGS.n_refine,
        )
    else:
        ctrl = mppi_tl.make_mpc_controller(model, c, cfg.params, clips, mcfg)
    step = jax.jit(lambda e, a: primitive.step(model, clips, cfg, e, a))

    u = jnp.zeros((mcfg.horizon, 4, 3))
    dump = TrajectoryDump(FLAGS.dump) if FLAGS.dump else None
    rewards, ep_rewards, ep_lens, t_solve = [], [], [], []
    for i in range(FLAGS.steps):
        key, k, kr = jax.random.split(key, 3)
        t0 = time.perf_counter()
        tgt, u, diag = ctrl(k, env.robot, env.clip_idx, env.t, u)
        jax.block_until_ready(tgt)
        t_solve.append(time.perf_counter() - t0)
        env, obs, r, done, info = step(env, tgt - env.robot.joint_pos)
        rewards.append(float(r))
        if dump:
            dump.add(env.robot, reward=r, solve_ms=1e3 * t_solve[-1])
        if bool(done):
            ep_rewards.append(sum(rewards))
            ep_lens.append(len(rewards))
            logging.info("episode end at step %d: reward_sum=%.2f len=%d (%s)",
                         i, ep_rewards[-1], ep_lens[-1],
                         {k2: bool(v) for k2, v in info.items()})
            rewards = []
            env, obs = primitive.reset(model, clips, cfg, kr)
            u = jnp.zeros_like(u)
    if rewards:
        ep_rewards.append(sum(rewards))
        ep_lens.append(len(rewards))
    _report("PMC", ep_rewards, ep_lens, t_solve)
    if dump:
        logging.info("trajectory written to %s", dump.save())


def run_epmc(key):
    from lifelike_tpu.envs import playground
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.scene import playground_gen
    from lifelike_tpu.solver import mpc_tasks
    from lifelike_tpu.solver.mppi import MPPIConfig
    from lifelike_tpu.utils.trajectory import TrajectoryDump

    model = build_max_model()
    cfg = playground.PlaygroundConfig(
        scene=playground_gen.PlaygroundConfig(element_id=FLAGS.element_id)
    )
    c = B.tl_constants(model)
    mcfg = MPPIConfig(horizon=FLAGS.horizon, population=FLAGS.population,
                      iterations=FLAGS.iterations, sigma=0.15)
    if FLAGS.hybrid:
        from lifelike_tpu.solver import hybrid, ilqr

        ctrl = hybrid.make_hybrid_traversal_controller(
            model, c, cfg.params, mcfg,
            ilqr.ILQRConfig(iterations=FLAGS.ilqr_iterations),
            n_refine=FLAGS.n_refine, reward_type=cfg.reward_type,
        )
    else:
        ctrl = mpc_tasks.make_traversal_controller(
            model, c, cfg.params, mcfg, reward_type=cfg.reward_type,
            max_steps=cfg.max_steps,
        )
    s, obs = playground.reset(model, cfg, key)
    step = jax.jit(lambda st, a, k: playground.step(model, cfg, st, a, k))

    u = jnp.zeros((mcfg.horizon, 4, 3))
    dump = TrajectoryDump(FLAGS.dump) if FLAGS.dump else None
    rewards, ep_rewards, ep_lens, t_solve = [], [], [], []
    for i in range(FLAGS.steps):
        key, k, ke, kr = jax.random.split(key, 4)
        t0 = time.perf_counter()
        tgt, u, diag = ctrl(k, s.robot, s.scene, s.target_pos, s.target_spd, u)
        jax.block_until_ready(tgt)
        t_solve.append(time.perf_counter() - t0)
        s, obs, r, done, info = step(s, tgt - s.robot.joint_pos, ke)
        rewards.append(float(r))
        if dump:
            dump.add(s.robot, reward=r, solve_ms=1e3 * t_solve[-1])
        if bool(done):
            ep_rewards.append(sum(rewards))
            ep_lens.append(len(rewards))
            logging.info(
                "episode end at step %d: reward_sum=%.4f len=%d fall=%s "
                "reached=%s ave_spd=%.2f", i, ep_rewards[-1], ep_lens[-1],
                bool(info["fall"]), bool(info["reached"]),
                float(info["ave_spd"]),
            )
            rewards = []
            s, obs = playground.reset(model, cfg, kr)
            u = jnp.zeros_like(u)
    if rewards:
        ep_rewards.append(sum(rewards))
        ep_lens.append(len(rewards))
    _report("EPMC", ep_rewards, ep_lens, t_solve)
    if dump:
        logging.info("trajectory written to %s", dump.save())


def run_sepmc(key):
    from lifelike_tpu.envs import chase_tag
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mpc_tasks
    from lifelike_tpu.solver.mppi import MPPIConfig

    model = build_max_model()
    cfg = chase_tag.ChaseTagConfig()
    c = B.tl_constants(model)
    mcfg = MPPIConfig(horizon=FLAGS.horizon, population=FLAGS.population,
                      iterations=FLAGS.iterations, sigma=0.15)
    if FLAGS.hybrid:
        from lifelike_tpu.solver import hybrid, ilqr

        solver = hybrid.make_hybrid_chase_solver(
            model, c, cfg.params, mcfg,
            ilqr.ILQRConfig(iterations=FLAGS.ilqr_iterations),
            n_refine=FLAGS.n_refine, n_best_response=FLAGS.best_response,
        )
    else:
        solver = mpc_tasks.make_chase_solver(
            model, c, cfg.params, mcfg, n_best_response=FLAGS.best_response
        )
    s, obs = chase_tag.reset(model, cfg, key)
    step = jax.jit(lambda st, a, k: chase_tag.step(model, cfg, st, a, k))

    u = jnp.zeros((2, mcfg.horizon, 4, 3))
    t_solve, games = [], []
    rew_sum = np.zeros(2)
    for i in range(FLAGS.steps):
        key, k, ke, kr = jax.random.split(key, 4)
        t0 = time.perf_counter()
        tgt, u, diag = solver(k, s.robots, s.scene, s.flag_pos, s.with_flag, u)
        jax.block_until_ready(tgt)
        t_solve.append(time.perf_counter() - t0)
        s, obs, r, done, info = step(s, tgt - s.robots.joint_pos, ke)
        rew_sum += np.asarray(r)
        if bool(done):
            games.append(dict(
                rewards=rew_sum.tolist(),
                with_flag=np.asarray(s.with_flag).tolist(),
                len=i + 1,
            ))
            logging.info("game end at step %d: %s", i, games[-1])
            rew_sum = np.zeros(2)
            s, obs = chase_tag.reset(model, cfg, kr)
            u = jnp.zeros_like(u)
    logging.info(
        "SEPMC MPC eval: %d games | final dist %.2f m | solve p50 %.1f ms",
        len(games),
        float(jnp.linalg.norm(
            (s.robots.base_pos[0] - s.robots.base_pos[1])[:2]
        )),
        1e3 * float(np.percentile(t_solve[1:], 50)) if len(t_solve) > 1 else -1,
    )


def main(argv):
    del argv
    if FLAGS.cpu:
        jax.config.update("jax_platforms", "cpu")
    key = jax.random.PRNGKey(FLAGS.seed)
    {"pmc": run_pmc, "epmc": run_epmc, "sepmc": run_sepmc}[FLAGS.task](key)


if __name__ == "__main__":
    app.run(main)
