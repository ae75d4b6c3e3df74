"""Learner entry point: on-device PPO training for any of the three stages.

CLI parity with reference bin/run_pg_learner.py: absl flags, env/policy
configs as Python-dict string literals (the reference's read_config_dict
convention), periodic model publication to the pool and league checkpointing
— but the actor farm is gone: rollouts happen on-device inside the jitted
learner step, and data parallelism is the mesh, not Horovod ranks.

Examples (see train_scripts/*.sh):
  python -m lifelike_tpu.bin.run_learner --task=pmc \
    --env_config="{'data_path': '/root/reference/data/mocap_data'}" \
    --num_envs=256 --total_updates=1000
"""
import ast
import time

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("task", "pmc", "one of {pmc, epmc, sepmc}")
flags.DEFINE_integer("update_opponent_freq", 20,
                     "(sepmc) re-sample the PFSP opponent every N updates")
flags.DEFINE_string("env_config", "{}", "env config as a python dict literal")
flags.DEFINE_string("policy_config", "{}", "net config overrides (dict literal)")
flags.DEFINE_string("learner_config", "{}", "PPOConfig overrides (dict literal)")
flags.DEFINE_integer("num_envs", 64, "parallel on-device environments")
flags.DEFINE_integer("total_updates", 100, "learner iterations")
flags.DEFINE_integer("pub_interval", 5, "publish model every N updates")
flags.DEFINE_integer("log_interval", 4, "log metrics every N updates")
flags.DEFINE_string("model_pool_dir", "", "model pool persistence dir")
flags.DEFINE_string("checkpoint_dir", "", "league checkpoint dir")
flags.DEFINE_string("init_model", "", "seed model file (stage hand-off)")
flags.DEFINE_string("init_model_subtree", "params/llc",
                    "comma-separated /-paths to load frozen from init_model")
flags.DEFINE_bool("freeze_init_subtree", True, "freeze loaded subtrees")
flags.DEFINE_integer("seed", 0, "prng seed")
flags.DEFINE_bool(
    "pmc_replay", False,
    "PMC: stage unrolls through the device replay and run "
    "cfg.num_updates optimizer steps per unroll (the reference "
    "rm_size/rollout_len/batch pipeline, run_pg_learner.py:36,42-43) "
    "instead of one step per unroll. Size learner_config accordingly: an "
    "unroll yields (unroll_length//rollout_length)*num_envs window slots, "
    "so replay_size should hold >= 1-2 unrolls.")
flags.DEFINE_bool("cpu", False, "force CPU backend (debug)")
flags.DEFINE_string(
    "matmul_precision", "highest",
    "jax_default_matmul_precision for training. TPU defaults to bfloat16 "
    "matmuls, which destabilize the in-rollout physics (measured: penalty-"
    "contact blowups within 5 updates at 256 envs); training is physics-"
    "accuracy-bound and the policy nets are tiny, so f32 costs ~23%% "
    "throughput for sane numerics. Set '' to keep the backend default.")
# Multi-host (reference run_pg_learner.py:76-85 Horovod ranks -> one SPMD
# program over jax.distributed; see parallel/distributed.py). Flags default
# to the LIFELIKE_* env contract set by tools/launch_multihost.py.
flags.DEFINE_string("coordinator", "", "host:port of process 0")
flags.DEFINE_integer("num_processes", 0, "total processes (0: env or 1)")
flags.DEFINE_integer("process_id", -1, "this process's id (-1: env or 0)")
flags.DEFINE_string("train_checkpoint", "",
                    "file for full learner-state checkpoints (resume-able)")
flags.DEFINE_integer("save_interval", 50,
                     "save the train checkpoint every N updates")


def _cfgd(s):
    return ast.literal_eval(s) if s else {}


def _fit_burn_in(cfg):
    """Shrink burn_in when the unroll is too short for a full burn-in window
    (smoke runs with tiny unrolls); full-scale runs keep the reference 12."""
    if cfg.unroll_length < cfg.rollout_length:
        logging.warning("rollout_length %d > unroll_length %d; shrinking",
                        cfg.rollout_length, cfg.unroll_length)
        cfg = cfg._replace(rollout_length=cfg.unroll_length)
    window = cfg.burn_in + cfg.rollout_length
    if cfg.unroll_length < window:
        fit = max(0, cfg.unroll_length - cfg.rollout_length)
        logging.warning(
            "unroll_length %d < burn_in %d + rollout_length %d; "
            "shrinking burn_in to %d",
            cfg.unroll_length, cfg.burn_in, cfg.rollout_length, fit,
        )
        cfg = cfg._replace(burn_in=fit)
    return cfg


def _make_ckpt(registry, mesh=None):
    """Single-process: one pickle file. Multi-process: per-rank shard files
    re-placed onto the global mesh at restore (registry.
    ShardedTrainCheckpoint) — the regime where preemption recovery actually
    matters. League/PFSP bookkeeping is persisted separately by
    league.checkpoint(); after a resume the opponent rotation restarts from
    the deterministic seed, which every rank replays identically."""
    if not FLAGS.train_checkpoint:
        return None
    if mesh is not None:
        return registry.ShardedTrainCheckpoint(FLAGS.train_checkpoint, mesh)
    return registry.TrainCheckpoint(FLAGS.train_checkpoint)


def _resume(ckpt, key, **live):
    """Restore live pytrees from the checkpoint; returns (start, key, live)."""
    import jax

    if ckpt is None or (st := ckpt.load()) is None:
        return 0, key, live
    live = {k: st["trees"].get(k, v) for k, v in live.items()}
    start = st["step"] + 1
    logging.info("resumed %s at update %d", ckpt.path, start)
    return start, jax.random.fold_in(key, start), live


def _maybe_save(ckpt, i, **trees):
    if ckpt and (i + 1) % FLAGS.save_interval == 0:
        ckpt.save(i, **trees)


def main(argv):
    del argv
    from lifelike_tpu.parallel import distributed as dist

    multi = dist.initialize(
        coordinator=FLAGS.coordinator or None,
        num_processes=FLAGS.num_processes or None,
        process_id=FLAGS.process_id if FLAGS.process_id >= 0 else None,
        cpu=FLAGS.cpu,
    )
    if FLAGS.cpu and not multi:
        jax.config.update("jax_platforms", "cpu")
    if FLAGS.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          FLAGS.matmul_precision)
    import optax

    from lifelike_tpu.envs import factory
    from lifelike_tpu.learning import freeze as freeze_lib
    from lifelike_tpu.learning import learner, recurrent, registry
    from lifelike_tpu.learning.learner import PPOConfig

    env_config = _cfgd(FLAGS.env_config)
    pol_config = _cfgd(FLAGS.policy_config)
    lrn_config = {
        k: v for k, v in _cfgd(FLAGS.learner_config).items()
        if k in PPOConfig._fields
    }
    cfg = PPOConfig(**lrn_config)
    key = jax.random.PRNGKey(FLAGS.seed)
    B = FLAGS.num_envs

    pool = registry.ModelPool(root=FLAGS.model_pool_dir or None)
    league = registry.LeagueManager(
        pool, checkpoint_dir=FLAGS.checkpoint_dir or None
    )
    if FLAGS.checkpoint_dir:
        league.restore()

    if FLAGS.task == "pmc":
        from lifelike_tpu.models.pmc import PMCConfig, PMCNet
        from lifelike_tpu.motion import motion_lib

        env_config.setdefault("data_path", "/root/reference/data/mocap_data")
        bundle = factory.create_tracking_game(**env_config)
        net = PMCNet(PMCConfig(**{k: v for k, v in pol_config.items()
                                  if k in PMCConfig._fields}))
        optimizer = learner.make_optimizer(cfg)
        nproc = jax.process_count()
        if nproc > 1:
            # Each process resets its local env shard (distinct seeds), the
            # global batch is assembled across hosts, params replicated; the
            # jitted learner step runs as ONE program over the global mesh
            # with XLA inserting the DCN gradient all-reduce.
            assert B % nproc == 0, (B, nproc)
            mesh = dist.global_mesh()
            env_state, obs = bundle.reset(
                jax.random.fold_in(key, jax.process_index()),
                batch=(B // nproc,),
            )
            params = net.init(key, obs.prop, obs.prop_a, obs.future)
            opt_state = optimizer.init(params)
            env_state = dist.host_local_batch(mesh, env_state)
            params = dist.replicate(mesh, params)
            opt_state = dist.replicate(mesh, opt_state)
        else:
            env_state, obs = bundle.reset(key, batch=(B,))
            params = net.init(key, obs.prop, obs.prop_a, obs.future)
            opt_state = optimizer.init(params)
        # prioritized clip resampling p ~ (1 - avg_reward)^factor (reference
        # primitive_level_env.py:236-240): probs updated host-side from the
        # per-clip episode stats the learner step accumulates on device
        sampler = motion_lib.PrioritizedClipSampler(bundle.clips.num_clips)

        if FLAGS.pmc_replay:
            assert nproc == 1, "pmc_replay is single-process for now"
            replay = learner.replay_init(
                net, bundle.model, bundle.clips, bundle.cfg, cfg, env_state
            )

            @jax.jit
            def train(params, opt_state, env_state, replay, key, clip_probs):
                return learner.learner_step_replayed(
                    net, bundle.model, bundle.clips, bundle.cfg, cfg,
                    optimizer, params, opt_state, env_state, replay, key,
                    clip_probs=clip_probs,
                )
        else:
            replay = None

            @jax.jit
            def train(params, opt_state, env_state, key, clip_probs):
                return learner.learner_step(
                    net, bundle.model, bundle.clips, bundle.cfg, cfg,
                    optimizer, params, opt_state, env_state, key,
                    clip_probs=clip_probs,
                )

        ckpt = _make_ckpt(registry, mesh if nproc > 1 else None)
        live_trees = dict(params=params, opt_state=opt_state,
                          env_state=env_state)
        if replay is not None:
            live_trees["replay"] = replay
        start, key, live = _resume(ckpt, key, **live_trees)
        replay = live.get("replay", replay)
        params, opt_state, env_state = (
            live["params"], live["opt_state"], live["env_state"]
        )
        # VQ codebook health: EMA of per-code usage + periodic dead-code
        # restarts (models.pmc.restart_dead_codes — plain VQ collapsed to
        # perplexity 1.6 within 3k updates without this)
        from lifelike_tpu.models.pmc import restart_dead_codes

        code_usage = np.zeros(net.cfg.num_embeddings)
        restart_rng = np.random.default_rng(FLAGS.seed + 7777)
        for i in range(start, FLAGS.total_updates):
            key, k = jax.random.split(key)
            t0 = time.time()
            if replay is not None:
                params, opt_state, env_state, replay, metrics = train(
                    params, opt_state, env_state, replay, k,
                    sampler.probabilities
                )
            else:
                params, opt_state, env_state, metrics = train(
                    params, opt_state, env_state, k, sampler.probabilities
                )
            sampler.update_sums(
                dist.fetch(metrics.pop("clip_reward_sum")),
                dist.fetch(metrics.pop("clip_ep_count")),
            )
            code_usage = 0.98 * code_usage + dist.fetch(
                metrics.pop("code_counts")
            )
            if (i + 1) % 100 == 0:
                params, n_restart = restart_dead_codes(
                    params, code_usage, restart_rng
                )
                if n_restart:
                    if nproc > 1:
                        params = dist.replicate(mesh, params)
                    logging.info("restarted %d dead VQ codes", n_restart)
            _log_publish(i, metrics, t0, cfg, B, params, pool, league)
            extra = {} if replay is None else {"replay": replay}
            _maybe_save(ckpt, i, params=params, opt_state=opt_state,
                        env_state=env_state, **extra)

    elif FLAGS.task == "epmc":
        from lifelike_tpu.models.epmc import EPMCConfig, EPMCNet

        bundle = factory.create_playground_game(**env_config)
        net = EPMCNet(EPMCConfig(**{k: v for k, v in pol_config.items()
                                    if k in EPMCConfig._fields}))
        # Multi-process: the pmc host-local-batch pattern extended to the
        # recurrent learner state — env_state/obs/hs/prev_done shard on
        # their leading batch axis, and the replay's per-env-window
        # (slots, W, ...) data leaves on the slot axis, so the global
        # buffer aggregates every process's windows (the reference's
        # per-learner replay + Horovod grad allreduce collapses into one
        # SPMD program; run_pg_learner.py:76-85).
        nproc = jax.process_count()
        assert B % nproc == 0, (B, nproc)
        Bl = B // nproc
        mesh = dist.global_mesh() if nproc > 1 else None
        env_state, obs = bundle.reset(
            jax.random.fold_in(key, jax.process_index()) if nproc > 1
            else key,
            batch=(Bl,),
        )
        hs = net.initial_state((Bl,))
        params = net.init({"params": key, "z": key}, obs._asdict(), hs,
                          jnp.zeros(Bl))
        if FLAGS.init_model:
            donor = pool.load_file("init", FLAGS.init_model)
            paths = [tuple(p.split("/")) for p in FLAGS.init_model_subtree.split(",")]
            params = freeze_lib.load_subtree(params, donor, paths)
            logging.info("loaded frozen subtrees %s from %s", paths, FLAGS.init_model)
            base_tx = learner.make_optimizer(cfg)
            optimizer = (
                freeze_lib.frozen_optimizer(base_tx, params, paths)
                if FLAGS.freeze_init_subtree else base_tx
            )
        else:
            optimizer = learner.make_optimizer(cfg)
        opt_state = optimizer.init(params)
        prev_done = jnp.zeros(Bl, bool)
        cfg = _fit_burn_in(cfg)
        replay = recurrent.recurrent_replay_init(
            cfg, recurrent.rollout_example(cfg, obs, hs)
        )
        if nproc > 1:
            env_state = dist.host_local_batch(mesh, env_state)
            obs = dist.host_local_batch(mesh, obs)
            hs = dist.host_local_batch(mesh, hs)
            prev_done = dist.host_local_batch(mesh, prev_done)
            replay = dist.host_local_axis(mesh, replay, 0)
            params = dist.replicate(mesh, params)
            opt_state = dist.replicate(mesh, opt_state)

        @jax.jit
        def train(params, opt_state, env_state, obs, hs, prev_done, replay,
                  key):
            return recurrent.epmc_learner_step_replayed(
                net, bundle, cfg, optimizer,
                params, opt_state, env_state, obs, hs, prev_done, replay, key,
            )

        ckpt = _make_ckpt(registry, mesh)
        start, key, live = _resume(
            ckpt, key, params=params, opt_state=opt_state,
            env_state=env_state, obs=obs, hs=hs, prev_done=prev_done,
            replay=replay,
        )
        params, opt_state, env_state, obs, hs, prev_done, replay = (
            live["params"], live["opt_state"], live["env_state"],
            live["obs"], live["hs"], live["prev_done"], live["replay"],
        )
        for i in range(start, FLAGS.total_updates):
            key, k = jax.random.split(key)
            t0 = time.time()
            (params, opt_state, env_state, obs, hs, prev_done, replay,
             metrics) = train(
                params, opt_state, env_state, obs, hs, prev_done, replay, k
            )
            _log_publish(i, metrics, t0, cfg, B, params, pool, league)
            _maybe_save(ckpt, i, params=params, opt_state=opt_state,
                        env_state=env_state, obs=obs, hs=hs,
                        prev_done=prev_done, replay=replay)
    elif FLAGS.task == "sepmc":
        # Self-play Chase Tag (reference example_sepmc_train.sh: PFSPGameMgr
        # over frozen historical models, init from the EPMC stage model).
        from lifelike_tpu.models.sepmc import SEPMCConfig, SEPMCNet

        bundle = factory.create_chase_tag_game(**env_config)
        net = SEPMCNet(SEPMCConfig(**{k: v for k, v in pol_config.items()
                                      if k in SEPMCConfig._fields}))
        league.game_mgr_type = "pfsp"
        # Multi-process: same sharding pattern as epmc; the league/PFSP
        # bookkeeping stays host-side and deterministic (same seed -> every
        # process samples the same opponent), so only rank 0 persists.
        nproc = jax.process_count()
        assert B % nproc == 0, (B, nproc)
        Bl = B // nproc
        mesh = dist.global_mesh() if nproc > 1 else None
        env_state, obs = bundle.reset(
            jax.random.fold_in(key, jax.process_index()) if nproc > 1
            else key,
            batch=(Bl,),
        )
        hs = net.initial_state((Bl, 2))
        obs0 = recurrent._agent_obs(obs, 0)
        flat = {f: getattr(obs0, f) for f in obs0._fields}
        params = net.init(
            {"params": key, "hlc": key, "z": key}, flat, hs[:, 0],
            jnp.zeros(Bl),
        )
        if FLAGS.init_model:
            donor = pool.load_file("init", FLAGS.init_model)
            paths = [tuple(p.split("/"))
                     for p in FLAGS.init_model_subtree.split(",")]
            params = freeze_lib.load_subtree(params, donor, paths)
            logging.info("loaded frozen subtrees %s from %s", paths,
                         FLAGS.init_model)
            base_tx = learner.make_optimizer(cfg)
            optimizer = (
                freeze_lib.frozen_optimizer(base_tx, params, paths)
                if FLAGS.freeze_init_subtree else base_tx
            )
        else:
            optimizer = learner.make_optimizer(cfg)
        opt_state = optimizer.init(params)
        prev_done = jnp.zeros(Bl, bool)
        cfg = _fit_burn_in(cfg)
        replay = recurrent.recurrent_replay_init(
            cfg, recurrent.rollout_example(cfg, recurrent._agent_obs(obs, 0),
                                           hs[:, 0])
        )
        if nproc > 1:
            env_state = dist.host_local_batch(mesh, env_state)
            obs = dist.host_local_batch(mesh, obs)
            hs = dist.host_local_batch(mesh, hs)
            prev_done = dist.host_local_batch(mesh, prev_done)
            replay = dist.host_local_axis(mesh, replay, 0)
            params = dist.replicate(mesh, params)
            opt_state = dist.replicate(mesh, opt_state)

        pool.push("model_0000000", params, meta={"update": 0},
                  persist=bool(FLAGS.model_pool_dir) and dist.is_main())
        league.add_to_population("model_0000000")
        rng = np.random.default_rng(FLAGS.seed)
        opp_key = league.sample_opponent(rng)
        params_opp = pool.pull(opp_key)
        if nproc > 1:
            params_opp = dist.replicate(mesh, params_opp)

        @jax.jit
        def train(params, params_opp, opt_state, env_state, obs, hs,
                  prev_done, replay, key):
            return recurrent.sepmc_learner_step_replayed(
                net, bundle, cfg, optimizer, params, params_opp,
                opt_state, env_state, obs, hs, prev_done, replay, key,
            )

        ckpt = _make_ckpt(registry, mesh)
        start, key, live = _resume(
            ckpt, key, params=params, opt_state=opt_state,
            env_state=env_state, obs=obs, hs=hs, prev_done=prev_done,
            replay=replay,
        )
        params, opt_state, env_state, obs, hs, prev_done, replay = (
            live["params"], live["opt_state"], live["env_state"],
            live["obs"], live["hs"], live["prev_done"], live["replay"],
        )
        for i in range(start, FLAGS.total_updates):
            key, k = jax.random.split(key)
            t0 = time.time()
            (params, opt_state, env_state, obs, hs, prev_done, replay,
             metrics) = train(
                params, params_opp, opt_state, env_state, obs, hs,
                prev_done, replay, k
            )
            _log_publish(i, metrics, t0, cfg, B, params, pool, league)
            _maybe_save(ckpt, i, params=params, opt_state=opt_state,
                        env_state=env_state, obs=obs, hs=hs,
                        prev_done=prev_done, replay=replay)
            # per-EPISODE game outcomes for PFSP (reference counts actual
            # match results, chase_tag_game_env.py:412-419)
            league.report_games(
                opp_key, int(metrics["wins"]), int(metrics["games"])
            )
            if (i + 1) % FLAGS.update_opponent_freq == 0:
                opp_key = league.sample_opponent(rng)
                params_opp = pool.pull(opp_key)
                if nproc > 1:
                    params_opp = dist.replicate(mesh, params_opp)
                logging.info("PFSP opponent -> %s (win rate %.2f)",
                             opp_key, league.win_rate(opp_key))
    else:
        raise ValueError(f"unknown task {FLAGS.task}")

    if FLAGS.checkpoint_dir and dist.is_main():
        league.checkpoint()
    logging.info("done: %d updates", FLAGS.total_updates)


def _log_publish(i, metrics, t0, cfg, B, params, pool, league):
    from lifelike_tpu.parallel import distributed as dist

    if i % FLAGS.log_interval == 0:
        m = {k: float(dist.fetch(v).ravel()[0])
             for k, v in metrics.items()}
        sps = cfg.unroll_length * B / (time.time() - t0)
        logging.info("update %d: %s | env steps/s %.0f", i, m, sps)
    if i % FLAGS.pub_interval == 0:
        # every process mirrors the pool/league bookkeeping (params are
        # replicated, so the entries are identical and PFSP opponent
        # sampling stays in lockstep); only rank 0 persists to disk
        key_name = f"model_{i:07d}"
        pool.push(key_name, params, meta={"update": i},
                  persist=bool(FLAGS.model_pool_dir) and dist.is_main())
        league.add_to_population(key_name)


if __name__ == "__main__":
    app.run(main)
