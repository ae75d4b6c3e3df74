"""Recurrent PPO: on-device rollouts and TD-lambda updates for LSTM policies.

The EPMC/SEPMC training path (reference PPOLearner with use_lstm=True,
rollout_len 8, burn-in 12, hidden state stored per unroll —
example_pmc_train.sh:119-125): collection scans the env with the policy
carrying its LSTM state; training replays the unroll through the net
(unrolled over the small rollout axis) from the stored initial hidden state,
with done-masks resetting the LSTM exactly as during collection.

Actions are multi-head: EPMC = (A_Z categorical 256, A_LLC diag-Gaussian 12);
SEPMC adds A_HLC (Gaussian 1). Head neglogps add (independent heads), as the
reference's per-head ppo losses are summed.
"""
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from lifelike_tpu.learning import ppo
from lifelike_tpu.learning.learner import PPOConfig, make_optimizer
from lifelike_tpu.models import layers


class RecurrentRollout(NamedTuple):
    obs: Any  # pytree, leaves (T, B, ...)
    a_z: jnp.ndarray  # (T, B) int
    a_llc: jnp.ndarray  # (T, B, 12)
    a_hlc: jnp.ndarray  # (T, B, 1) (zeros for EPMC)
    neglogp: jnp.ndarray  # (T, B) summed heads
    reward: jnp.ndarray  # (T, B)
    discount: jnp.ndarray  # (T, B)
    mask: jnp.ndarray  # (T, B) 1.0 at episode starts
    hs0: jnp.ndarray  # (B, hs_len) hidden state at unroll start


def collect_epmc_rollout(
    net, env_bundle, cfg: PPOConfig, params, env_state, obs, hs, prev_done, key
):
    """Scan `unroll_length` steps of the playground env with the EPMC policy.

    Returns (env_state', obs', hs', done', RecurrentRollout).
    """
    hs0 = hs

    def body(carry, key_t):
        env_state, obs, hs, prev_done = carry
        k_z, k_a, k_env = jax.random.split(key_t, 3)
        mask = prev_done.astype(hs.dtype)
        out = net.apply(params, obs._asdict(), hs, mask, rngs={"z": k_z})
        a_llc = layers.gaussian_sample(k_a, out.mean, out.logstd)
        neglogp = layers.categorical_neglogp(out.z_logits, out.z_idx)
        neglogp = neglogp + layers.gaussian_neglogp(out.mean, out.logstd, a_llc)
        action = {"A_Z": out.z_idx, "A_LLC": a_llc}
        env_state2, obs2, reward, done, _ = env_bundle.step_autoreset(
            env_state, action, k_env
        )
        data = dict(
            obs=obs,
            a_z=out.z_idx,
            a_llc=a_llc,
            neglogp=neglogp,
            reward=reward,
            discount=cfg.gamma * (1.0 - done.astype(reward.dtype)),
            mask=mask,
        )
        return (env_state2, obs2, out.hs, done), data

    keys = jax.random.split(key, cfg.unroll_length)
    (env_state, obs, hs, done), data = jax.lax.scan(
        body, (env_state, obs, hs, prev_done), keys
    )
    roll = RecurrentRollout(
        obs=data["obs"],
        a_z=data["a_z"],
        a_llc=data["a_llc"],
        a_hlc=jnp.zeros(data["a_z"].shape + (1,), data["neglogp"].dtype),
        neglogp=data["neglogp"],
        reward=data["reward"],
        discount=data["discount"],
        mask=data["mask"],
        hs0=hs0,
    )
    return env_state, obs, hs, done, roll


def epmc_loss_fn(net, cfg: PPOConfig, params, roll: RecurrentRollout, axis_name=None):
    """Replay the unroll through the net (unrolled over T) and compute the
    TD-lambda PPO loss with per-head entropy."""
    T = roll.neglogp.shape[0]
    hs = roll.hs0
    neglogps, values, ents, rms_losses = [], [], [], []
    for t in range(T):
        obs_t = jax.tree.map(lambda x: x[t], roll.obs)
        out = net.apply(params, obs_t._asdict() if hasattr(obs_t, "_asdict") else obs_t,
                        hs, roll.mask[t], z_idx=roll.a_z[t])
        hs = out.hs
        nlp = layers.categorical_neglogp(out.z_logits, roll.a_z[t])
        nlp = nlp + layers.gaussian_neglogp(out.mean, out.logstd, roll.a_llc[t])
        neglogps.append(nlp)
        values.append(out.value[..., 0])
        ents.append(
            layers.categorical_entropy(out.z_logits)
            + layers.gaussian_entropy(out.logstd)
        )
        rms_losses.append(out.rms_loss)
    neglogp = jnp.stack(neglogps)
    vpred = jnp.stack(values)
    entropy = jnp.mean(jnp.stack(ents))
    rms_loss = jnp.mean(jnp.stack(rms_losses))

    pg_loss, value_loss, mean_return = ppo.ppo2_loss(
        neglogp,
        roll.neglogp,
        vpred,
        roll.reward,
        roll.discount,
        lam=cfg.lam,
        clip_range=cfg.clip_range,
        clip_range_lower=cfg.clip_range_lower,
        axis_name=axis_name,
    )
    loss = (
        pg_loss
        + cfg.vf_coef * value_loss
        - cfg.ent_coef * entropy
        + cfg.rms_loss_coef * rms_loss
    )
    metrics = {
        "pg_loss": pg_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "return": mean_return,
        "rms_loss": rms_loss,
        "reward_mean": jnp.mean(roll.reward),
    }
    return loss, metrics


def epmc_train_step(
    net, optimizer, cfg: PPOConfig, params, opt_state, roll, axis_name=None
):
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: epmc_loss_fn(net, cfg, p, roll, axis_name), has_aux=True
    )(params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean(metrics, axis_name)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics["loss"] = loss
    return params, opt_state, metrics


def _agent_obs(obs, i):
    """Slice agent i out of a ChaseTagObs (leaves (..., 2, k))."""
    return jax.tree.map(lambda x: x[..., i, :] if x.ndim >= 2 else x, obs)


def collect_sepmc_rollout(
    net, env_bundle, cfg: PPOConfig, params_learner, params_opponent,
    env_state, obs, hs, prev_done, key,
):
    """Self-play collection on the chase-tag env: agent 0 is the learner,
    agent 1 a frozen opponent (PFSP-sampled params). Only agent 0's
    transitions are recorded for training; rewards are zero-sum (..., 2).

    hs: (B, 2, hs_len). Returns (env_state', obs', hs', done', roll,
    learner_return (B,)) where learner_return accumulates agent-0 reward for
    league win statistics.
    """
    hs0 = hs[..., 0, :]

    def agent_forward(params, obs_i, hs_i, mask, k):
        k1, k2 = jax.random.split(k)
        flat = {f: getattr(obs_i, f) for f in obs_i._fields}
        return net.apply(params, flat, hs_i, mask, rngs={"hlc": k1, "z": k2})

    def body(carry, key_t):
        env_state, obs, hs, prev_done, ret = carry
        k0, k1, ka, k_env = jax.random.split(key_t, 4)
        mask = prev_done.astype(hs.dtype)
        out0 = agent_forward(params_learner, _agent_obs(obs, 0), hs[..., 0, :], mask, k0)
        out1 = agent_forward(params_opponent, _agent_obs(obs, 1), hs[..., 1, :], mask, k1)
        a_llc0 = layers.gaussian_sample(ka, out0.mean, out0.logstd)
        neglogp = (
            layers.gaussian_neglogp(out0.hlc_mean, out0.hlc_logstd, out0.hlc_angle)
            + layers.categorical_neglogp(out0.z_logits, out0.z_idx)
            + layers.gaussian_neglogp(out0.mean, out0.logstd, a_llc0)
        )
        a_llc = jnp.stack([a_llc0, out1.mean], axis=-2)  # (..., 2, 12)
        env_state2, obs2, rewards, done, _ = env_bundle.step_autoreset(
            env_state, {"A_LLC": a_llc}, k_env
        )
        hs_new = jnp.stack([out0.hs, out1.hs], axis=-2)
        data = dict(
            obs=_agent_obs(obs, 0),
            a_hlc=out0.hlc_angle,
            a_z=out0.z_idx,
            a_llc=a_llc0,
            neglogp=neglogp,
            reward=rewards[..., 0],
            discount=cfg.gamma * (1.0 - done.astype(rewards.dtype)),
            mask=mask,
        )
        return (env_state2, obs2, hs_new, done, ret + rewards[..., 0]), data

    keys = jax.random.split(key, cfg.unroll_length)
    (env_state, obs, hs, done, ret), data = jax.lax.scan(
        body, (env_state, obs, hs, prev_done, jnp.zeros(prev_done.shape)), keys
    )
    roll = RecurrentRollout(
        obs=data["obs"],
        a_z=data["a_z"],
        a_llc=data["a_llc"],
        a_hlc=data["a_hlc"],
        neglogp=data["neglogp"],
        reward=data["reward"],
        discount=data["discount"],
        mask=data["mask"],
        hs0=hs0,
    )
    return env_state, obs, hs, done, roll, ret


def sepmc_loss_fn(net, cfg: PPOConfig, params, roll: RecurrentRollout, axis_name=None):
    """Replay + TD-lambda PPO for the 3-head SEPMC policy."""
    T = roll.neglogp.shape[0]
    hs = roll.hs0
    neglogps, values, ents, rms_losses = [], [], [], []
    for t in range(T):
        obs_t = jax.tree.map(lambda x: x[t], roll.obs)
        flat = {f: getattr(obs_t, f) for f in obs_t._fields}
        out = net.apply(
            params, flat, hs, roll.mask[t],
            a_hlc=roll.a_hlc[t], a_z=roll.a_z[t],
        )
        hs = out.hs
        nlp = (
            layers.gaussian_neglogp(out.hlc_mean, out.hlc_logstd, roll.a_hlc[t])
            + layers.categorical_neglogp(out.z_logits, roll.a_z[t])
            + layers.gaussian_neglogp(out.mean, out.logstd, roll.a_llc[t])
        )
        neglogps.append(nlp)
        values.append(out.value[..., 0])
        ents.append(
            layers.gaussian_entropy(out.hlc_logstd)
            + layers.categorical_entropy(out.z_logits)
            + layers.gaussian_entropy(out.logstd)
        )
        rms_losses.append(out.rms_loss)
    neglogp = jnp.stack(neglogps)
    vpred = jnp.stack(values)
    entropy = jnp.mean(jnp.stack(ents))
    rms_loss = jnp.mean(jnp.stack(rms_losses))
    pg_loss, value_loss, mean_return = ppo.ppo2_loss(
        neglogp, roll.neglogp, vpred, roll.reward, roll.discount,
        lam=cfg.lam, clip_range=cfg.clip_range,
        clip_range_lower=cfg.clip_range_lower, axis_name=axis_name,
    )
    loss = (
        pg_loss + cfg.vf_coef * value_loss - cfg.ent_coef * entropy
        + cfg.rms_loss_coef * rms_loss
    )
    metrics = {
        "pg_loss": pg_loss, "value_loss": value_loss, "entropy": entropy,
        "return": mean_return, "rms_loss": rms_loss,
        "reward_mean": jnp.mean(roll.reward),
    }
    return loss, metrics


def sepmc_learner_step(
    net, env_bundle, cfg: PPOConfig, optimizer,
    params, params_opponent, opt_state, env_state, obs, hs, prev_done, key,
    axis_name=None,
):
    """One self-play PPO iteration: collect vs the frozen opponent, update
    the learner. Returns learner episode return for league statistics."""
    k1, _ = jax.random.split(key)
    env_state, obs, hs, done, roll, ret = collect_sepmc_rollout(
        net, env_bundle, cfg, params, params_opponent,
        env_state, obs, hs, prev_done, k1,
    )
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: sepmc_loss_fn(net, cfg, p, roll, axis_name), has_aux=True
    )(params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean(metrics, axis_name)
    import optax as _optax

    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = _optax.apply_updates(params, updates)
    metrics["loss"] = loss
    metrics["learner_return"] = jnp.mean(ret)
    return params, opt_state, env_state, obs, hs, done, metrics


def epmc_learner_step(
    net, env_bundle, cfg: PPOConfig, optimizer,
    params, opt_state, env_state, obs, hs, prev_done, key, axis_name=None,
):
    """One full on-device recurrent PPO iteration for the EPMC task."""
    k1, _ = jax.random.split(key)
    env_state, obs, hs, done, roll = collect_epmc_rollout(
        net, env_bundle, cfg, params, env_state, obs, hs, prev_done, k1
    )
    params, opt_state, metrics = epmc_train_step(
        net, optimizer, cfg, params, opt_state, roll, axis_name
    )
    return params, opt_state, env_state, obs, hs, done, metrics
