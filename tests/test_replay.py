"""Replay memory: window staging, circular writes, sampled-minibatch PPO.

Pins the TPU-native replacement for the reference learner's replay pipeline
(rm_size unrolls -> rollout_len windows -> batch sampling, reference
run_pg_learner.py:36,42-43) implemented as a device-resident circular buffer
in learning/replay.py + learner.learner_step_replayed.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.learning import replay as rp


def _unroll(T=8, B=3, f=4, offset=0.0):
    x = jnp.arange(T * B * f, dtype=jnp.float32).reshape(T, B, f) + offset
    r = jnp.arange(T * B, dtype=jnp.float32).reshape(T, B) + offset
    return {"x": x, "r": r}


def test_windows_from_unroll_layout():
    u = _unroll(T=8, B=3)
    w = rp.windows_from_unroll(u, window=4)
    assert w["x"].shape == (6, 4, 4) and w["r"].shape == (6, 4)
    # slot 0 = env 0, steps 0..3; slot 3 = env 0, steps 4..7
    np.testing.assert_array_equal(np.asarray(w["x"][0]), np.asarray(u["x"][:4, 0]))
    np.testing.assert_array_equal(np.asarray(w["x"][3]), np.asarray(u["x"][4:, 0]))
    np.testing.assert_array_equal(np.asarray(w["r"][1]), np.asarray(u["r"][:4, 1]))


def test_replay_circular_write_and_fill():
    example = {"x": jnp.zeros((4, 4)), "r": jnp.zeros((4,))}
    rep = rp.replay_init(example, size=8)
    assert int(rep.filled) == 0

    w1 = rp.windows_from_unroll(_unroll(), window=4)  # 6 slots
    rep = rp.replay_add(rep, w1)
    assert int(rep.filled) == 6 and int(rep.cursor) == 6

    w2 = rp.windows_from_unroll(_unroll(offset=1000.0), window=4)  # wraps
    rep = rp.replay_add(rep, w2)
    assert int(rep.filled) == 8 and int(rep.cursor) == 4
    # slots 6,7 and 0..3 hold the new data; 4,5 still the old
    np.testing.assert_array_equal(np.asarray(rep.data["x"][6]), np.asarray(w2["x"][0]))
    np.testing.assert_array_equal(np.asarray(rep.data["x"][3]), np.asarray(w2["x"][5]))
    np.testing.assert_array_equal(np.asarray(rep.data["x"][4]), np.asarray(w1["x"][4]))


def test_replay_sample_shapes_and_bounds():
    example = {"x": jnp.zeros((4, 4)), "r": jnp.zeros((4,))}
    rep = rp.replay_init(example, size=16)
    rep = rp.replay_add(rep, rp.windows_from_unroll(_unroll(), window=4))
    batch = rp.replay_sample(rep, jax.random.PRNGKey(0), 32)
    assert batch["x"].shape == (32, 4, 4)
    # only filled slots sampled: every sampled row matches one of the 6 live slots
    live = np.asarray(rep.data["x"][:6]).reshape(6, -1)
    got = np.asarray(batch["x"]).reshape(32, -1)
    assert all(any(np.allclose(g, l) for l in live) for g in got)
    tm = rp.as_time_major(batch)
    assert tm["x"].shape == (4, 32, 4)


@pytest.mark.slow
def test_learner_step_replayed_end_to_end():
    from lifelike_tpu.envs import primitive
    from lifelike_tpu.learning import learner
    from lifelike_tpu.models.pmc import PMCNet
    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.physics import engine
    from lifelike_tpu.robot.model import build_max_model

    model = build_max_model()
    clips = motion_lib.pack_clips(
        [motion_lib.make_synthetic_clip(240)], frame_step=1.0 / 120.0
    )
    env_cfg = primitive.PrimitiveEnvConfig(params=engine.PhysicsParams(substeps=2))
    cfg = learner.PPOConfig(
        unroll_length=4, rollout_length=2, replay_size=16,
        batch_windows=4, num_updates=3,
    )
    net = PMCNet()
    optimizer = learner.make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    env_state, obs = primitive.reset(model, clips, env_cfg, key, batch=(2,))
    params = net.init(key, obs.prop, obs.prop_a, obs.future)
    opt_state = optimizer.init(params)
    replay = learner.replay_init(net, model, clips, env_cfg, cfg, env_state)

    @jax.jit
    def step(params, opt_state, env_state, replay, key):
        return learner.learner_step_replayed(
            net, model, clips, env_cfg, cfg, optimizer,
            params, opt_state, env_state, replay, key,
        )

    p0 = jax.tree.leaves(params)[0]
    for i in range(2):
        key, sk = jax.random.split(key)
        params, opt_state, env_state, replay, metrics = step(
            params, opt_state, env_state, replay, sk
        )
    assert np.isfinite(float(metrics["loss"]))
    assert int(replay.filled) == 2 * 2 * 2  # 2 iters x T//W=2 x B=2
    assert not np.allclose(np.asarray(p0), np.asarray(jax.tree.leaves(params)[0]))
