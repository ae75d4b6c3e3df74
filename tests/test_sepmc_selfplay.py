"""SEPMC self-play training step + league integration."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.envs import factory
from lifelike_tpu.learning import recurrent, registry
from lifelike_tpu.learning.learner import PPOConfig, make_optimizer
from lifelike_tpu.models.sepmc import SEPMCNet


def test_sepmc_loss_grad_synthetic():
    """Fast-suite guard on the 3-head SEPMC PPO gradient: synthetic
    RecurrentRollout (no physics compile) through sepmc_loss_fn's grad —
    finite loss and a nonzero gradient through all three action heads."""
    bundle = factory.create_chase_tag_game(control_freq=250.0, max_steps=30)
    net = SEPMCNet()
    cfg = PPOConfig(unroll_length=3)
    key = jax.random.PRNGKey(0)
    B = 2
    _, obs = bundle.reset(key, batch=(B,))
    hs = net.initial_state((B, 2))
    obs0 = recurrent._agent_obs(obs, 0)
    flat = {f: getattr(obs0, f) for f in obs0._fields}
    params = net.init(
        {"params": key, "hlc": key, "z": key}, flat, hs[:, 0], jnp.zeros(B)
    )
    ex = recurrent.rollout_example(cfg, obs0, hs[:, 0])
    leaves, treedef = jax.tree.flatten(ex)
    ks = jax.random.split(key, len(leaves))
    roll = jax.tree.unflatten(treedef, [
        x if jnp.issubdtype(x.dtype, jnp.integer)
        else 0.01 * jax.random.normal(k, x.shape, x.dtype)
        for k, x in zip(ks, leaves)
    ])
    roll = roll._replace(discount=jnp.full_like(roll.discount, 0.95),
                         mask=jnp.zeros_like(roll.mask))
    (loss, metrics), grads = jax.jit(
        lambda p, r: jax.value_and_grad(
            lambda q: recurrent.sepmc_loss_fn(net, cfg, q, r, burn_in=1),
            has_aux=True,
        )(p)
    )(params, roll)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads),
    )
    assert np.isfinite(gnorm) and gnorm > 0.0


@pytest.mark.slow
def test_sepmc_selfplay_learner_step():
    bundle = factory.create_chase_tag_game(
        control_freq=250.0,  # substeps=2 for CPU speed
        max_steps=30,
    )
    net = SEPMCNet()
    cfg = PPOConfig(unroll_length=3)
    optimizer = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    B = 2
    env_state, obs = bundle.reset(key, batch=(B,))
    hs = net.initial_state((B, 2))
    obs0 = recurrent._agent_obs(obs, 0)
    flat = {f: getattr(obs0, f) for f in obs0._fields}
    params = net.init(
        {"params": key, "hlc": key, "z": key}, flat, hs[:, 0], jnp.zeros(B)
    )
    params_opp = jax.tree.map(lambda x: x + 0.0, params)  # frozen copy
    opt_state = optimizer.init(params)
    prev_done = jnp.zeros(B, bool)

    step = jax.jit(
        lambda p, po, o_s, e_s, ob, h, d, k: recurrent.sepmc_learner_step(
            net, bundle, cfg, optimizer, p, po, o_s, e_s, ob, h, d, k
        )
    )
    for i in range(2):
        key, k = jax.random.split(key)
        params, opt_state, env_state, obs, hs, prev_done, metrics = step(
            params, params_opp, opt_state, env_state, obs, hs, prev_done, k
        )
    m = {k2: float(v) for k2, v in jax.device_get(metrics).items()}
    assert np.isfinite(m["loss"]), m
    assert np.isfinite(m["learner_return"]), m

    # league round trip: outcome reporting drives PFSP sampling
    pool = registry.ModelPool()
    league = registry.LeagueManager(pool, game_mgr_type="pfsp")
    pool.push("opp0", params_opp)
    league.add_to_population("opp0")
    league.report_outcome("opp0", m["learner_return"] > 0)
    assert league.sample_opponent(np.random.default_rng(0)) == "opp0"
