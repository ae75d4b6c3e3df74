"""Recurrent PPO: on-device rollouts and TD-lambda updates for LSTM policies.

The EPMC/SEPMC training path (reference PPOLearner with use_lstm=True,
rollout_len 8, burn-in 12, hidden state stored per unroll —
example_pmc_train.sh:119-125): collection scans the env with the policy
carrying its LSTM state; training replays the unroll through the net with a
`lax.scan` over the time axis from the stored per-step hidden states, with
done-masks resetting the LSTM exactly as during collection. Burn-in replays
the first `burn_in` steps gradient-free to re-warm stale hidden states
(R2D2-style; the reference's burn_in 12), and the replay-staged variants run
the reference's rm_size/rollout_len/batch pipeline fully on device
(learning/replay.py, overlapping burn-in windows).

Actions are multi-head: EPMC = (A_Z categorical 256, A_LLC diag-Gaussian 12);
SEPMC adds A_HLC (Gaussian 1). Head neglogps add (independent heads), as the
reference's per-head ppo losses are summed.
"""
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from lifelike_tpu.learning import ppo
from lifelike_tpu.learning import replay as rp
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
    hs: jnp.ndarray  # (T, B, hs_len) hidden state BEFORE each step


def collect_epmc_rollout(
    net, env_bundle, cfg: PPOConfig, params, env_state, obs, hs, prev_done, key
):
    """Scan `unroll_length` steps of the playground env with the EPMC policy.

    Returns (env_state', obs', hs', done', RecurrentRollout).
    """

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
            hs=hs,
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
        hs=data["hs"],
    )
    return env_state, obs, hs, done, roll


def _replay_net(step, hs0, inputs, burn_in):
    """Scan `step(hs, inp) -> (hs', outs)` over the time axis of `inputs`.

    The first `burn_in` steps only warm the hidden state: they run under the
    current params but the carried state is stop-gradiented at the boundary,
    so no gradient flows through (or loss is taken from) the burn-in segment
    (the reference's burn_in 12, example_pmc_train.sh:119-125)."""
    if burn_in:
        warm = jax.tree.map(lambda x: x[:burn_in], inputs)
        train = jax.tree.map(lambda x: x[burn_in:], inputs)
        hs0, _ = jax.lax.scan(step, hs0, warm)
        hs0 = jax.lax.stop_gradient(hs0)
    else:
        train = inputs
    _, outs = jax.lax.scan(step, hs0, train)
    return outs


def _train_slice(roll: RecurrentRollout, burn_in):
    """The post-burn-in targets the loss is computed on."""
    if not burn_in:
        return roll
    return roll._replace(
        **{
            f: jax.tree.map(lambda x: x[burn_in:], getattr(roll, f))
            for f in ("a_z", "a_llc", "a_hlc", "neglogp", "reward", "discount")
        }
    )


def epmc_loss_fn(net, cfg: PPOConfig, params, roll: RecurrentRollout,
                 axis_name=None, burn_in=0):
    """Replay the unroll through the net (lax.scan over T) and compute the
    TD-lambda PPO loss with per-head entropy on the post-burn-in steps."""

    def step(hs, inp):
        obs_t, mask_t, a_z_t, a_llc_t = inp
        flat = obs_t._asdict() if hasattr(obs_t, "_asdict") else obs_t
        out = net.apply(params, flat, hs, mask_t, z_idx=a_z_t)
        nlp = layers.categorical_neglogp(out.z_logits, a_z_t)
        nlp = nlp + layers.gaussian_neglogp(out.mean, out.logstd, a_llc_t)
        ent = layers.categorical_entropy(out.z_logits) + layers.gaussian_entropy(
            out.logstd
        )
        return out.hs, (nlp, out.value[..., 0], ent, out.rms_loss)

    inputs = (roll.obs, roll.mask, roll.a_z, roll.a_llc)
    neglogp, vpred, ents, rms_losses = _replay_net(step, roll.hs[0], inputs, burn_in)
    entropy = jnp.mean(ents)
    rms_loss = jnp.mean(rms_losses)
    tr = _train_slice(roll, burn_in)

    pg_loss, value_loss, mean_return = ppo.ppo2_loss(
        neglogp,
        tr.neglogp,
        vpred,
        tr.reward,
        tr.discount,
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
        "reward_mean": jnp.mean(tr.reward),
    }
    return loss, metrics


def epmc_train_step(
    net, optimizer, cfg: PPOConfig, params, opt_state, roll, axis_name=None,
    burn_in=0,
):
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: epmc_loss_fn(net, cfg, p, roll, axis_name, burn_in),
        has_aux=True,
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
            hs=hs[..., 0, :],
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
        hs=data["hs"],
    )
    return env_state, obs, hs, done, roll, ret


def sepmc_loss_fn(net, cfg: PPOConfig, params, roll: RecurrentRollout,
                  axis_name=None, burn_in=0):
    """Replay (lax.scan over T) + TD-lambda PPO for the 3-head SEPMC policy."""

    def step(hs, inp):
        obs_t, mask_t, a_hlc_t, a_z_t, a_llc_t = inp
        flat = {f: getattr(obs_t, f) for f in obs_t._fields}
        out = net.apply(params, flat, hs, mask_t, a_hlc=a_hlc_t, a_z=a_z_t)
        nlp = (
            layers.gaussian_neglogp(out.hlc_mean, out.hlc_logstd, a_hlc_t)
            + layers.categorical_neglogp(out.z_logits, a_z_t)
            + layers.gaussian_neglogp(out.mean, out.logstd, a_llc_t)
        )
        ent = (
            layers.gaussian_entropy(out.hlc_logstd)
            + layers.categorical_entropy(out.z_logits)
            + layers.gaussian_entropy(out.logstd)
        )
        return out.hs, (nlp, out.value[..., 0], ent, out.rms_loss)

    inputs = (roll.obs, roll.mask, roll.a_hlc, roll.a_z, roll.a_llc)
    neglogp, vpred, ents, rms_losses = _replay_net(step, roll.hs[0], inputs, burn_in)
    entropy = jnp.mean(ents)
    rms_loss = jnp.mean(rms_losses)
    tr = _train_slice(roll, burn_in)
    pg_loss, value_loss, mean_return = ppo.ppo2_loss(
        neglogp, tr.neglogp, vpred, tr.reward, tr.discount,
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
        "reward_mean": jnp.mean(tr.reward),
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
    metrics.update(_game_outcomes(roll))
    return params, opt_state, env_state, obs, hs, done, metrics


def _game_outcomes(roll: RecurrentRollout):
    """Per-EPISODE game results inside the unroll, for PFSP statistics: a
    game ends where discount hits zero; the learner's terminal reward sign
    is the outcome (+1 catch/win, -1 caught/loss, 0 fall/timeout draw).
    The reference league counts actual match results
    (chase_tag_game_env.py:412-419), not per-update return signs."""
    ended = roll.discount == 0.0
    return {
        "games": jnp.sum(ended.astype(jnp.float32)),
        "wins": jnp.sum((ended & (roll.reward > 0)).astype(jnp.float32)),
        "losses": jnp.sum((ended & (roll.reward < 0)).astype(jnp.float32)),
    }


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


# ---------------------------------------------------------------------------
# Replay-staged variants: the reference learner pipeline (rm_size unrolls,
# rollout_len windows, burn-in, multiple optimizer steps per unroll —
# run_pg_learner.py:36,42-43 + example_pmc_train.sh:119-125) as one jit.
# ---------------------------------------------------------------------------


def _stage_windows(cfg: PPOConfig, roll: RecurrentRollout):
    window = cfg.burn_in + cfg.rollout_length
    assert cfg.unroll_length >= window, (
        f"unroll_length {cfg.unroll_length} < burn_in {cfg.burn_in} + "
        f"rollout_length {cfg.rollout_length}"
    )
    return rp.windows_overlapping(roll, window, cfg.rollout_length)


def rollout_example(cfg: PPOConfig, obs, hs, n_act=12):
    """Zero-filled RecurrentRollout with (T, B) leaves, for replay_init.
    obs: one observation pytree with (B, ...) leaves (agent-sliced for
    SEPMC); hs: the learner's hidden state (B, hs_len)."""
    T = cfg.unroll_length
    batch = hs.shape[:-1]
    dt = hs.dtype

    def tile(x):
        return jnp.zeros((T,) + jnp.shape(x), jnp.asarray(x).dtype)

    def z(*trail):
        return jnp.zeros((T,) + batch + trail, dt)

    return RecurrentRollout(
        obs=jax.tree.map(tile, obs),
        a_z=jnp.zeros((T,) + batch, jnp.int32),
        a_llc=z(n_act),
        a_hlc=z(1),
        neglogp=z(),
        reward=z(),
        discount=z(),
        mask=z(),
        hs=z(hs.shape[-1]),
    )


def recurrent_replay_init(cfg: PPOConfig, roll_example: RecurrentRollout):
    """Empty replay shaped after one (burn_in + rollout_length)-step window.
    roll_example: any rollout with (T, B) leaves from the same env/net."""
    windows = _stage_windows(cfg, roll_example)
    one = jax.tree.map(lambda x: jnp.zeros(x.shape[1:], x.dtype), windows)
    return rp.replay_init(one, cfg.replay_size)


def _replayed_updates(train_step_fn, cfg: PPOConfig, params, opt_state,
                      replay, roll, key):
    replay = rp.replay_add(replay, _stage_windows(cfg, roll))

    def upd(carry, key_u):
        params, opt_state = carry
        batch = rp.as_time_major(rp.replay_sample(replay, key_u, cfg.batch_windows))
        params, opt_state, metrics = train_step_fn(params, opt_state, batch)
        return (params, opt_state), metrics

    (params, opt_state), metrics = jax.lax.scan(
        upd, (params, opt_state), jax.random.split(key, cfg.num_updates)
    )
    return params, opt_state, replay, jax.tree.map(lambda m: m[-1], metrics)


def epmc_learner_step_replayed(
    net, env_bundle, cfg: PPOConfig, optimizer,
    params, opt_state, env_state, obs, hs, prev_done, replay, key,
    axis_name=None,
):
    """Collect one unroll, stage burn-in windows into the replay, run
    cfg.num_updates sampled-minibatch PPO updates with burn-in replay."""
    k1, k2 = jax.random.split(key)
    env_state, obs, hs, done, roll = collect_epmc_rollout(
        net, env_bundle, cfg, params, env_state, obs, hs, prev_done, k1
    )
    params, opt_state, replay, metrics = _replayed_updates(
        lambda p, o, b: epmc_train_step(
            net, optimizer, cfg, p, o, b, axis_name, burn_in=cfg.burn_in
        ),
        cfg, params, opt_state, replay, roll, k2,
    )
    return params, opt_state, env_state, obs, hs, done, replay, metrics


def sepmc_learner_step_replayed(
    net, env_bundle, cfg: PPOConfig, optimizer,
    params, params_opponent, opt_state, env_state, obs, hs, prev_done,
    replay, key, axis_name=None,
):
    """Self-play collection + replay-staged burn-in PPO updates."""
    k1, k2 = jax.random.split(key)
    env_state, obs, hs, done, roll, ret = collect_sepmc_rollout(
        net, env_bundle, cfg, params, params_opponent,
        env_state, obs, hs, prev_done, k1,
    )

    def train_once(p, o, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda q: sepmc_loss_fn(net, cfg, q, batch, axis_name,
                                    burn_in=cfg.burn_in),
            has_aux=True,
        )(p)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        metrics["loss"] = loss
        return p, o, metrics

    params, opt_state, replay, metrics = _replayed_updates(
        train_once, cfg, params, opt_state, replay, roll, k2
    )
    metrics["learner_return"] = jnp.mean(ret)
    metrics.update(_game_outcomes(roll))
    return params, opt_state, env_state, obs, hs, done, replay, metrics
