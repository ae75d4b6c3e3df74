"""Teacher-student distillation: losses, on-device actor mixing, learner step.

Replaces the reference PureDistillActor/PureDistillLearner pair (reference
learning/actors/distill_actor.py, learning/learners/distill_learner.py): a
frozen teacher policy and a live student both run on the batched env; which
one acts is sampled per-step with an annealed teacher ratio (:214-244), and
the student is trained supervised/KL against the teacher's action
distribution — no ZMQ shipping, one jitted loop.

Distill loss modes match the reference z_mlp 'distill' family (:167-191):
  'standard'   — KL(teacher || student) from teacher (mean, logstd)
  'action_var' — KL with teacher mean = executed action, fixed variance
  'supervised' — plain MSE to the teacher action
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from lifelike_tpu.models import layers


class DistillConfig(NamedTuple):
    loss_type: str = "standard"  # {'standard', 'action_var', 'supervised'}
    action_var: float = 1.0
    teacher_ratio_start: float = 1.0
    teacher_ratio_end: float = 0.0
    teacher_ratio_decay_steps: int = 100_000
    learning_rate: float = 1e-4
    max_grad_norm: float = 0.5
    beta: float = 1.0  # AR(1) prior weight when distilling a ZNet


def teacher_ratio(cfg: DistillConfig, step):
    frac = jnp.clip(step / cfg.teacher_ratio_decay_steps, 0.0, 1.0)
    return cfg.teacher_ratio_start + frac * (
        cfg.teacher_ratio_end - cfg.teacher_ratio_start
    )


def mix_actions(key, cfg: DistillConfig, step, teacher_action, student_action):
    """Per-env-step choice of which policy acts (reference :214-244)."""
    ratio = teacher_ratio(cfg, step)
    use_teacher = jax.random.bernoulli(
        key, ratio, shape=teacher_action.shape[:-1]
    )
    return jnp.where(use_teacher[..., None], teacher_action, student_action)


def distill_loss(
    cfg: DistillConfig,
    student_mean,
    student_logstd,
    teacher_mean,
    teacher_logstd=None,
    teacher_action=None,
):
    if cfg.loss_type == "standard":
        assert teacher_logstd is not None
        kl = layers.gaussian_kl(teacher_mean, teacher_logstd, student_mean, student_logstd)
        return jnp.mean(kl)
    if cfg.loss_type == "action_var":
        assert teacher_action is not None
        t_logstd = jnp.full_like(student_logstd, 0.5 * jnp.log(cfg.action_var))
        kl = layers.gaussian_kl(teacher_action, t_logstd, student_mean, student_logstd)
        return jnp.mean(kl)
    if cfg.loss_type == "supervised":
        assert teacher_action is not None
        return jnp.mean(jnp.sum((student_mean - teacher_action) ** 2, axis=-1))
    raise ValueError(cfg.loss_type)


def make_distill_optimizer(cfg: DistillConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate),
    )


def znet_distill_step(
    znet, cfg: DistillConfig, optimizer, params, opt_state, batch, key, axis_name=None
):
    """One supervised update of a ZNet on teacher rollout data.

    batch: dict with obs (T, B, D), teacher_mean/teacher_logstd (T, B, 12)
    or teacher_action, masks (T, B), z_init (B, z_len).
    """
    from lifelike_tpu.models.z_net import ar1_prior_loss

    def loss_fn(p):
        out = znet.apply(
            p, batch["obs"], batch["z_init"], batch["masks"], rngs={"z": key}
        )
        d = distill_loss(
            cfg,
            out.mean,
            out.logstd,
            batch.get("teacher_mean", batch.get("teacher_action")),
            batch.get("teacher_logstd"),
            batch.get("teacher_action"),
        )
        prior = ar1_prior_loss(znet.cfg, out)
        loss = d + cfg.beta * prior + out.rms_loss
        return loss, {"distill_loss": d, "prior_loss": prior, "rms_loss": out.rms_loss}

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics["loss"] = loss
    return params, opt_state, metrics
