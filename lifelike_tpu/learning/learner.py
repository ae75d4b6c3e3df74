"""On-device PPO learner for the PMC task: batched rollouts + TD-lambda PPO.

Replaces the reference's TLeague actor/learner split (ZMQ unroll shipping,
Horovod allreduce — reference run_pg_learner.py, SURVEY.md section 3.2-3.3)
with a single jitted program: a scan over env steps collects (T, B) unrolls
straight on device, and the train step computes the PPO2 loss and psums
gradients over the data-parallel mesh axis. Hyperparameters mirror
reference example_pmc_train.sh (lr 1e-5, gamma=lam=0.95, clip 0.1,
vf_coef 1, ent_coef 0, q_latent 1.0, e_latent 0.25, rms 1.0, grad clip 0.5).
"""
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from lifelike_tpu.envs import primitive
from lifelike_tpu.learning import ppo
from lifelike_tpu.models import layers
from lifelike_tpu.models.pmc import PMCNet


class PPOConfig(NamedTuple):
    learning_rate: float = 1e-5
    gamma: float = 0.95
    lam: float = 0.95
    clip_range: float = 0.1
    clip_range_lower: float = 0.1
    vf_coef: float = 1.0
    ent_coef: float = 0.0
    q_latent_coef: float = 1.0
    e_latent_coef: float = 0.25
    rms_loss_coef: float = 1.0
    max_grad_norm: float = 0.5
    unroll_length: int = 16  # reference uses 128; shorter default for tests
    # replay staging (reference: rollout_len 8, rm_size 1024, batch 256)
    rollout_length: int = 8  # window length sampled from the replay
    replay_size: int = 256  # window slots held in HBM
    batch_windows: int = 32  # slots per sampled minibatch
    num_updates: int = 4  # optimizer steps per collected unroll
    # LSTM-state warmup steps replayed gradient-free before each sampled
    # window (recurrent replayed paths only; reference burn_in 12,
    # example_pmc_train.sh:119-125)
    burn_in: int = 12


class Rollout(NamedTuple):
    """(T, B, ...) unroll tensors."""

    prop: jnp.ndarray
    prop_a: jnp.ndarray
    future: jnp.ndarray
    action: jnp.ndarray
    neglogp: jnp.ndarray
    reward: jnp.ndarray
    discount: jnp.ndarray  # gamma * (1 - done)


def make_optimizer(cfg: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate),
    )


def collect_rollout(
    net: PMCNet, model, clips, env_cfg, cfg: PPOConfig, params, env_state, key,
    clip_probs=None,
):
    """Scan `unroll_length` env steps with the stochastic policy.

    Returns (env_state', Rollout with (T, B) leaves, clip_stats) where
    clip_stats = (reward_sum (n_clips,), episode_count (n_clips,)) holds the
    per-clip episode-average-reward sums of episodes that ENDED inside the
    unroll — the device-side half of the reference's prioritized clip
    resampling (primitive_level_env.py:236-240)."""
    n_clips = clips.num_clips

    def body(carry, key_t):
        env_state = carry
        obs = primitive._observe(clips, env_cfg, env_state)
        out = net.apply(params, obs.prop, obs.prop_a, obs.future)
        k_act, k_reset = jax.random.split(key_t)
        action = layers.gaussian_sample(k_act, out.mean, out.logstd)
        neglogp = layers.gaussian_neglogp(out.mean, out.logstd, action)
        ep_clip = env_state.clip_idx  # the episode's clip (pre-reset)
        env_state, _, reward, done, info = primitive.step_autoreset(
            model, clips, env_cfg, env_state, action, k_reset, clip_probs
        )
        ended = done.astype(reward.dtype)
        data = Rollout(
            prop=obs.prop,
            prop_a=obs.prop_a,
            future=obs.future,
            action=action,
            neglogp=neglogp,
            reward=reward,
            discount=cfg.gamma * (1.0 - ended),
        )
        stats = (
            jax.ops.segment_sum(
                (info["ep_avg_reward"] * ended).reshape(-1),
                ep_clip.reshape(-1), num_segments=n_clips,
            ),
            jax.ops.segment_sum(
                ended.reshape(-1), ep_clip.reshape(-1), num_segments=n_clips
            ),
            # per-code selection counts for host-side dead-code restarts
            # (models.pmc.restart_dead_codes)
            jax.ops.segment_sum(
                jnp.ones(out.z_idx.size, jnp.float32),
                out.z_idx.reshape(-1),
                num_segments=net.cfg.num_embeddings,
            ),
        )
        return env_state, (data, stats)

    keys = jax.random.split(key, cfg.unroll_length)
    env_state, (rollout, stats) = jax.lax.scan(body, env_state, keys)
    clip_stats = jax.tree.map(lambda x: jnp.sum(x, axis=0), stats)
    return env_state, rollout, clip_stats


def ppo_loss_fn(net: PMCNet, cfg: PPOConfig, params, rollout: Rollout, axis_name=None):
    out = net.apply(params, rollout.prop, rollout.prop_a, rollout.future)
    neglogp = layers.gaussian_neglogp(out.mean, out.logstd, rollout.action)
    vpred = out.value[..., 0]  # (T, B)
    pg_loss, value_loss, mean_return = ppo.ppo2_loss(
        neglogp,
        rollout.neglogp,
        vpred,
        rollout.reward,
        rollout.discount,
        lam=cfg.lam,
        clip_range=cfg.clip_range,
        clip_range_lower=cfg.clip_range_lower,
        axis_name=axis_name,
    )
    entropy = jnp.mean(layers.gaussian_entropy(out.logstd))
    loss = (
        pg_loss
        + cfg.vf_coef * value_loss
        - cfg.ent_coef * entropy
        + cfg.q_latent_coef * out.q_latent_loss
        + cfg.e_latent_coef * out.e_latent_loss
        + cfg.rms_loss_coef * out.rms_loss
    )
    metrics = {
        "pg_loss": pg_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "return": mean_return,
        "rms_loss": out.rms_loss,
        "q_latent_loss": out.q_latent_loss,
        "e_latent_loss": out.e_latent_loss,
        "perplexity": out.perplexity,
        "reward_mean": jnp.mean(rollout.reward),
    }
    return loss, metrics


def train_step(
    net: PMCNet,
    optimizer,
    cfg: PPOConfig,
    params,
    opt_state,
    rollout: Rollout,
    axis_name=None,
):
    grad_fn = jax.value_and_grad(
        lambda p: ppo_loss_fn(net, cfg, p, rollout, axis_name), has_aux=True
    )
    (loss, metrics), grads = grad_fn(params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean(metrics, axis_name)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics["loss"] = loss
    return params, opt_state, metrics


def learner_step(
    net, model, clips, env_cfg, cfg: PPOConfig, optimizer,
    params, opt_state, env_state, key, axis_name=None, clip_probs=None,
):
    """Collect one unroll and apply one PPO update — the full on-device
    actor+learner iteration. clip_stats (per-clip reward sums / episode
    counts) ride along in metrics for host-side prioritized resampling."""
    k_roll, _ = jax.random.split(key)
    env_state, rollout, clip_stats = collect_rollout(
        net, model, clips, env_cfg, cfg, params, env_state, k_roll, clip_probs
    )
    params, opt_state, metrics = train_step(
        net, optimizer, cfg, params, opt_state, rollout, axis_name
    )
    (metrics["clip_reward_sum"], metrics["clip_ep_count"],
     metrics["code_counts"]) = clip_stats
    return params, opt_state, env_state, metrics


def replay_init(net, model, clips, env_cfg, cfg: PPOConfig, env_state):
    """Empty replay buffer shaped after one (rollout_length, B) window."""
    from lifelike_tpu.learning import replay as rp

    obs = primitive._observe(clips, env_cfg, env_state)
    dt = obs.prop.dtype
    example = Rollout(
        prop=jnp.zeros((cfg.rollout_length,) + obs.prop.shape[1:], dt),
        prop_a=jnp.zeros((cfg.rollout_length,) + obs.prop_a.shape[1:], dt),
        future=jnp.zeros((cfg.rollout_length,) + obs.future.shape[1:], dt),
        action=jnp.zeros((cfg.rollout_length, 12), dt),
        neglogp=jnp.zeros((cfg.rollout_length,), dt),
        reward=jnp.zeros((cfg.rollout_length,), dt),
        discount=jnp.zeros((cfg.rollout_length,), dt),
    )
    return rp.replay_init(example, cfg.replay_size)


def learner_step_replayed(
    net, model, clips, env_cfg, cfg: PPOConfig, optimizer,
    params, opt_state, env_state, replay, key, axis_name=None, clip_probs=None,
):
    """Collect one unroll, stage it in the replay, and run
    cfg.num_updates sampled-minibatch PPO updates — the reference's
    pull-worker / replay-memory / batch-worker pipeline as one jit program
    (run_pg_learner.py:36,42-43 semantics, device-resident)."""
    from lifelike_tpu.learning import replay as rp

    k_roll, k_upd = jax.random.split(key)
    env_state, rollout, clip_stats = collect_rollout(
        net, model, clips, env_cfg, cfg, params, env_state, k_roll, clip_probs
    )
    replay = rp.replay_add(replay, rp.windows_from_unroll(rollout, cfg.rollout_length))

    def upd(carry, key_u):
        params, opt_state = carry
        batch = rp.as_time_major(rp.replay_sample(replay, key_u, cfg.batch_windows))
        params, opt_state, metrics = train_step(
            net, optimizer, cfg, params, opt_state, batch, axis_name
        )
        return (params, opt_state), metrics

    (params, opt_state), metrics = jax.lax.scan(
        upd, (params, opt_state), jax.random.split(k_upd, cfg.num_updates)
    )
    metrics = jax.tree.map(lambda m: m[-1], metrics)
    (metrics["clip_reward_sum"], metrics["clip_ep_count"],
     metrics["code_counts"]) = clip_stats
    return params, opt_state, env_state, replay, metrics
