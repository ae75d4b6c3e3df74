"""Policy evaluation CLI for the three stages (test_scripts parity).

Mirrors the reference eval scripts (test_scripts/*/test_*_env.py): load a
model from a pool/path, run episodes with argmax actions, print per-episode
reward sum / length / running averages. Without a model, runs the randomly
initialized policy (smoke mode).
"""
import ast

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("task", "pmc", "one of {pmc, epmc, sepmc}")
flags.DEFINE_string("env_config", "{}", "env config dict literal")
flags.DEFINE_string("model_path", "", "pickled model file (empty = random init)")
flags.DEFINE_integer("episodes", 2, "episodes to run")
flags.DEFINE_integer("max_steps", 200, "step cap per episode")
flags.DEFINE_integer("seed", 0, "prng seed")
flags.DEFINE_bool("cpu", False, "force CPU backend")
flags.DEFINE_string("dump", "", "write eval trajectories to this .npz")


def _load_params(path, template_params, tleague_importer):
    """Checkpoint dispatch: a ``.model`` suffix suggests a reference TLeague
    pickle, but a native ModelPool file may carry the same name — so when the
    TLeague import rejects the payload (wrong variable count / shapes /
    blocked globals), fall back to the native loader instead of failing."""
    from lifelike_tpu.learning import registry

    if path.endswith(".model"):
        try:
            params = tleague_importer(path, template_params)
            logging.info("imported reference checkpoint %s", path)
            return params
        except Exception as e:  # not a TLeague checkpoint after all
            logging.warning(
                "TLeague import of %s failed (%s); trying native ModelPool",
                path, e,
            )
    return registry.ModelPool().load_file("eval", path)


def main(argv):
    del argv
    if FLAGS.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lifelike_tpu.envs import factory
    from lifelike_tpu.utils.trajectory import TrajectoryDump

    env_config = ast.literal_eval(FLAGS.env_config) if FLAGS.env_config else {}
    key = jax.random.PRNGKey(FLAGS.seed)
    dump = TrajectoryDump(FLAGS.dump) if FLAGS.dump else None

    if FLAGS.task == "pmc":
        from lifelike_tpu.models.pmc import PMCNet

        env_config.setdefault("data_path", "/root/reference/data/mocap_data")
        bundle = factory.create_tracking_game(**env_config)
        net = PMCNet()
        env_state, obs = bundle.reset(key)
        params = net.init(key, obs.prop, obs.prop_a, obs.future)
        if FLAGS.model_path:
            from lifelike_tpu.compat import tleague_import

            params = _load_params(
                FLAGS.model_path, params, tleague_import.import_pmc
            )
        fwd = jax.jit(lambda p, o: net.apply(p, o.prop, o.prop_a, o.future))
        step = jax.jit(lambda s, a: bundle.step(s, a))

        ep_rets, ep_lens = [], []
        for ep in range(FLAGS.episodes):
            key, k = jax.random.split(key)
            env_state, obs = bundle.reset(k)
            ret, t = 0.0, 0
            for t in range(FLAGS.max_steps):
                out = fwd(params, obs)
                env_state, obs, r, done, info = step(env_state, out.mean)
                ret += float(r)
                if dump:
                    dump.add(env_state.robot, reward=r, episode=ep)
                if bool(done):
                    break
            ep_rets.append(ret)
            ep_lens.append(t + 1)
            logging.info(
                "episode %d: reward_sum %.3f len %d | running avg %.3f",
                ep, ret, t + 1, float(np.mean(ep_rets)),
            )
    elif FLAGS.task == "epmc":
        from lifelike_tpu.models.epmc import EPMCNet

        bundle = factory.create_playground_game(**env_config)
        net = EPMCNet()
        env_state, obs = bundle.reset(key)
        hs = net.initial_state(())
        params = net.init({"params": key, "z": key}, obs._asdict(), hs,
                          jnp.zeros(()))
        if FLAGS.model_path:
            from lifelike_tpu.compat import tleague_import

            params = _load_params(
                FLAGS.model_path, params, tleague_import.import_epmc
            )
        fwd = jax.jit(
            lambda p, o, h, k: net.apply(p, o._asdict(), h, jnp.zeros(()),
                                         rngs={"z": k})
        )
        step = jax.jit(lambda s, a, k: bundle.step(s, a, k))
        for ep in range(FLAGS.episodes):
            key, k = jax.random.split(key)
            env_state, obs = bundle.reset(k)
            hs = net.initial_state(())
            ret = 0.0
            for t in range(FLAGS.max_steps):
                key, k1, k2 = jax.random.split(key, 3)
                out = fwd(params, obs, hs, k1)
                hs = out.hs
                env_state, obs, r, done, info = step(
                    env_state, {"A_Z": out.z_idx, "A_LLC": out.mean}, k2
                )
                ret += float(r)
                if dump:
                    dump.add(env_state.robot, reward=r, episode=ep)
                if bool(done):
                    break
            logging.info("episode %d: reward_sum %.4f len %d info %s",
                         ep, ret, t + 1,
                         {k3: float(v) for k3, v in jax.device_get(info).items()})
    elif FLAGS.task == "sepmc":
        from lifelike_tpu.models.sepmc import SEPMCNet

        bundle = factory.create_chase_tag_game(**env_config)
        net = SEPMCNet()
        env_state, obs = bundle.reset(key)
        hs = net.initial_state((2,))
        flat = lambda o: {f: getattr(o, f) for f in o._fields}
        params = net.init(
            {"params": key, "hlc": key, "z": key},
            flat(obs), hs, jnp.zeros(2),
        )
        if FLAGS.model_path:
            from lifelike_tpu.compat import tleague_import

            params = _load_params(
                FLAGS.model_path, params, tleague_import.import_sepmc
            )
        fwd = jax.jit(
            lambda p, o, h, k1, k2: net.apply(
                p, o, h, jnp.zeros(2), rngs={"hlc": k1, "z": k2}
            )
        )
        step = jax.jit(lambda s, a, k: bundle.step(s, a, k))
        for ep in range(FLAGS.episodes):
            key, k = jax.random.split(key)
            env_state, obs = bundle.reset(k)
            hs = net.initial_state((2,))
            rets = np.zeros(2)
            for t in range(FLAGS.max_steps):
                key, k1, k2, k3 = jax.random.split(key, 4)
                out = fwd(params, flat(obs), hs, k1, k2)
                hs = out.hs
                env_state, obs, r, done, info = step(
                    env_state, {"A_LLC": out.mean}, k3
                )
                rets += np.asarray(r)
                if dump:
                    dump.add(env_state.robots, reward=r, episode=ep)
                if bool(done):
                    break
            logging.info("episode %d: rewards %s len %d info %s",
                         ep, rets.tolist(), t + 1,
                         {k4: float(np.asarray(v)) for k4, v in
                          jax.device_get(info).items()})
    else:
        raise ValueError(FLAGS.task)

    if dump:
        logging.info("trajectory written to %s", dump.save())


if __name__ == "__main__":
    app.run(main)
