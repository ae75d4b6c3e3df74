"""Learning stack: registry/PFSP, freeze/hand-off, z-net, distillation, PPO."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lifelike_tpu.learning import distill, freeze, learner, ppo, registry
from lifelike_tpu.models.z_net import ZNet, ZNetConfig, ar1_prior_loss


def test_model_pool_roundtrip(tmp_path):
    pool = registry.ModelPool(root=str(tmp_path))
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    pool.push("m1", params, meta={"stage": "pmc"}, persist=True)
    pool2 = registry.ModelPool(root=str(tmp_path))
    got = pool2.pull("m1")
    np.testing.assert_allclose(got["w"], np.ones((3, 3)))
    assert os.path.exists(tmp_path / "m1.model")


def test_league_pfsp_prefers_hard_opponents(tmp_path):
    pool = registry.ModelPool(root=str(tmp_path))
    lm = registry.LeagueManager(pool, game_mgr_type="pfsp", pfsp_power=2.0,
                                checkpoint_dir=str(tmp_path))
    for k in ["g0", "g1", "g2"]:
        pool.push(k, {"w": jnp.zeros(1)})
        lm.add_to_population(k)
    # we beat g0 always, lose to g2 always
    for _ in range(20):
        lm.report_outcome("g0", True)
        lm.report_outcome("g2", False)
    rng = np.random.default_rng(0)
    picks = [lm.sample_opponent(rng) for _ in range(300)]
    assert picks.count("g2") > picks.count("g0")
    # checkpoint/restore
    lm.checkpoint()
    lm2 = registry.LeagueManager(pool, checkpoint_dir=str(tmp_path))
    assert lm2.restore()
    assert lm2.population == ["g0", "g1", "g2"]


def test_self_play_mgr_returns_latest(tmp_path):
    pool = registry.ModelPool()
    lm = registry.LeagueManager(pool, game_mgr_type="self_play")
    lm.add_to_population("a")
    lm.add_to_population("b")
    assert lm.sample_opponent(np.random.default_rng(0)) == "b"


def test_freeze_subtree_handoff():
    """PMC LLC weights load into EPMC params and stay frozen under training."""
    from lifelike_tpu.models.epmc import EPMCNet
    from lifelike_tpu.models.pmc import PMCNet

    pmc = PMCNet()
    pp = pmc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 99)), jnp.zeros((1, 36)), jnp.zeros((1, 72))
    )
    net = EPMCNet()
    obs = dict(
        prop=jnp.zeros((1, 99)), prop_a=jnp.zeros((1, 36)),
        percep_2d=jnp.zeros((1, 25, 13)), percep_1d=jnp.zeros((1, 128)),
        percep_front=jnp.zeros((1, 25, 13)), target=jnp.zeros((1, 3)),
    )
    ep = net.init(
        {"params": jax.random.PRNGKey(1), "z": jax.random.PRNGKey(2)},
        obs, jnp.zeros((1, 192)), jnp.zeros((1,)),
    )
    # hand-off
    ep2 = freeze.load_subtree(ep, pp, [("params", "llc")])
    np.testing.assert_allclose(
        np.asarray(ep2["params"]["llc"]["embedding"]),
        np.asarray(pp["params"]["llc"]["embedding"]),
    )
    # frozen optimizer zeroes llc updates
    tx = freeze.frozen_optimizer(optax.sgd(1.0), ep2, [("params", "llc")])
    opt_state = tx.init(ep2)
    grads = jax.tree.map(jnp.ones_like, ep2)
    updates, _ = tx.update(grads, opt_state, ep2)
    assert float(jnp.max(jnp.abs(updates["params"]["llc"]["embedding"]))) == 0.0
    assert float(jnp.max(jnp.abs(updates["params"]["z_out"]["kernel"]))) > 0.0


def test_znet_forward_and_prior():
    cfg = ZNetConfig(prop_dim=10)
    net = ZNet(cfg)
    T, B, D = 4, 3, 10 + 20
    obs = jnp.asarray(np.random.default_rng(0).normal(size=(T, B, D)), jnp.float32)
    z0 = jnp.zeros((B, cfg.z_len))
    masks = jnp.zeros((T, B)).at[0].set(1.0)
    params = net.init(
        {"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)}, obs, z0, masks
    )
    out = net.apply(params, obs, z0, masks, rngs={"z": jax.random.PRNGKey(2)})
    assert out.mean.shape == (T, B, 12)
    assert out.z.shape == (T, B, cfg.z_len)
    # episode start masked: first-step z_prev must be zero
    np.testing.assert_allclose(np.asarray(out.z_prev[0]), 0.0, atol=0)
    prior = ar1_prior_loss(cfg, out)
    assert np.isfinite(float(prior))


def test_distill_losses_and_mixing():
    cfg = distill.DistillConfig()
    sm = jnp.zeros((5, 12))
    sl = jnp.full((5, 12), -1.0)
    tm = jnp.ones((5, 12)) * 0.1
    tl = jnp.full((5, 12), -1.0)
    l_std = distill.distill_loss(cfg, sm, sl, tm, teacher_logstd=tl)
    assert float(l_std) > 0.0
    # identical distributions -> zero KL
    l_zero = distill.distill_loss(cfg, tm, tl, tm, teacher_logstd=tl)
    np.testing.assert_allclose(float(l_zero), 0.0, atol=1e-6)
    l_sup = distill.distill_loss(
        cfg._replace(loss_type="supervised"), sm, sl, tm, teacher_action=tm
    )
    np.testing.assert_allclose(float(l_sup), float(jnp.sum(tm[0] ** 2)), rtol=1e-5)
    # ratio anneal: all-teacher at step 0, all-student at the end
    np.testing.assert_allclose(float(distill.teacher_ratio(cfg, 0)), 1.0)
    np.testing.assert_allclose(
        float(distill.teacher_ratio(cfg, cfg.teacher_ratio_decay_steps)), 0.0
    )
    a = distill.mix_actions(jax.random.PRNGKey(0), cfg, 0, tm, sm)
    np.testing.assert_allclose(np.asarray(a), np.asarray(tm))


def test_znet_distill_step_improves():
    cfg = ZNetConfig(prop_dim=10)
    net = ZNet(cfg)
    dcfg = distill.DistillConfig(loss_type="supervised", learning_rate=1e-2, beta=0.0)
    T, B, D = 4, 8, 30
    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.normal(size=(T, B, D)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(T, B, 12)) * 0.1, jnp.float32)
    batch = {
        "obs": obs,
        "teacher_action": target,
        "masks": jnp.zeros((T, B)),
        "z_init": jnp.zeros((B, cfg.z_len)),
    }
    params = net.init(
        {"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)},
        obs, batch["z_init"], batch["masks"],
    )
    tx = distill.make_distill_optimizer(dcfg)
    opt_state = tx.init(params)
    step = jax.jit(
        lambda p, o, b, k: distill.znet_distill_step(net, dcfg, tx, p, o, b, k)
    )
    losses = []
    for i in range(30):
        params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["distill_loss"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_ppo_lambda_return():
    T, B = 4, 2
    reward = jnp.ones((T, B))
    discount = jnp.full((T, B), 0.9)
    vnext = jnp.zeros((T, B))
    G = ppo.lambda_return(reward, discount, vnext, lam=1.0)
    # all-ones reward, gamma .9, lam 1: G_t = sum_{k} .9^k
    np.testing.assert_allclose(float(G[0, 0]), 1 + 0.9 + 0.81 + 0.729, rtol=1e-6)
    np.testing.assert_allclose(float(G[-1, 0]), 1.0, rtol=1e-6)
