"""Recurrent PPO end-to-end: EPMC policy trains on the playground env."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.envs import factory, playground
from lifelike_tpu.learning import recurrent
from lifelike_tpu.learning.learner import PPOConfig, make_optimizer
from lifelike_tpu.models.epmc import EPMCNet
from lifelike_tpu.scene import playground_gen


def test_epmc_recurrent_train_step_synthetic():
    """Fast-suite guard on the recurrent PPO gradient path: a synthetic
    RecurrentRollout (no physics-rollout compile) through
    epmc_train_step with burn-in — finite loss and parameters move."""
    bundle = factory.create_playground_game(
        control_freq=250.0,
        env_randomize_config={"element_id": 1, "friction_range": (0.5, 0.6),
                              "target_spd_range": (0.5, 1.0)},
        max_steps=40,
    )
    net = EPMCNet()
    cfg = PPOConfig(unroll_length=4)
    key = jax.random.PRNGKey(0)
    B = 2
    _, obs = bundle.reset(key, batch=(B,))
    hs = net.initial_state((B,))
    params = net.init({"params": key, "z": key}, obs._asdict(), hs,
                      jnp.zeros(B))
    ex = recurrent.rollout_example(cfg, obs, hs)
    leaves, treedef = jax.tree.flatten(ex)
    ks = jax.random.split(key, len(leaves))
    roll = jax.tree.unflatten(treedef, [
        x if jnp.issubdtype(x.dtype, jnp.integer)
        else 0.01 * jax.random.normal(k, x.shape, x.dtype)
        for k, x in zip(ks, leaves)
    ])
    roll = roll._replace(discount=jnp.full_like(roll.discount, 0.95),
                         mask=jnp.zeros_like(roll.mask))
    from lifelike_tpu.learning.learner import make_optimizer

    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    params2, _, metrics = jax.jit(
        lambda p, o, r: recurrent.epmc_train_step(net, opt, cfg, p, o, r,
                                                  burn_in=1)
    )(params, opt_state, roll)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["pg_loss"]))
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))),
                     params, params2),
    )
    assert delta > 0.0


@pytest.mark.slow
def test_epmc_recurrent_learner_step_runs():
    bundle = factory.create_playground_game(
        control_freq=250.0,  # substeps=2 to keep the CPU test fast
        env_randomize_config={"element_id": 1, "friction_range": (0.5, 0.6),
                              "target_spd_range": (0.5, 1.0)},
        max_steps=40,
    )
    assert bundle.cfg.params.substeps == 2
    net = EPMCNet()
    cfg = PPOConfig(unroll_length=4)
    optimizer = make_optimizer(cfg)

    key = jax.random.PRNGKey(0)
    B = 4
    env_state, obs = bundle.reset(key, batch=(B,))
    hs = net.initial_state((B,))
    params = net.init(
        {"params": key, "z": key}, obs._asdict(), hs, jnp.zeros(B)
    )
    opt_state = optimizer.init(params)
    prev_done = jnp.zeros(B, bool)

    step = jax.jit(
        lambda p, o_s, e_s, ob, h, d, k: recurrent.epmc_learner_step(
            net, bundle, cfg, optimizer, p, o_s, e_s, ob, h, d, k
        )
    )
    metrics_hist = []
    for i in range(2):
        key, k = jax.random.split(key)
        params, opt_state, env_state, obs, hs, prev_done, metrics = step(
            params, opt_state, env_state, obs, hs, prev_done, k
        )
        metrics_hist.append({k2: float(v) for k2, v in metrics.items()})
    for m in metrics_hist:
        assert np.isfinite(m["loss"]), m
        assert np.isfinite(m["pg_loss"]), m
    # hidden state actually evolves through collection
    assert float(jnp.max(jnp.abs(hs))) > 0.0
