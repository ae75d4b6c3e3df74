"""Shared network layers: trainable running-mean-std, initializers, heads.

The reference's `rms` layer (reference networks/layers.py:5-60) implements
running normalization as *trainable* mean/std variables regressed toward the
batch statistics with a least-squares "rms loss" so the update rides the
optimizer — which makes the statistics sync for free under data parallelism
(psum of grads). We keep exactly that trick: it is already the TPU-idiomatic
design (no assign ops, no separate allreduce).
"""
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def normc_init(scale=1.0):
    """Column-normalized initializer (reference networks/utils.py:10-16)."""

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.normal(key, shape, dtype)
        w = w * scale / jnp.sqrt(jnp.sum(w**2, axis=0, keepdims=True))
        return w

    return init


class RMS(nn.Module):
    """Running mean/std as trainable params + auxiliary least-squares loss.

    Returns (normalized, rms_loss). Normalized output is stop-gradiented and
    clipped to +-5 like the reference (pmc_net.py:131-135).
    """

    momentum: float = 1e-4

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        mean = self.param("moving_mean", nn.initializers.zeros, (dim,))
        std = self.param("moving_std", nn.initializers.ones, (dim,))
        out = (x - mean) / (std + 1e-8)
        out = jnp.clip(jax.lax.stop_gradient(out), -5.0, 5.0)
        b_mean = jax.lax.stop_gradient(jnp.mean(x, axis=tuple(range(x.ndim - 1))))
        b_std = jax.lax.stop_gradient(jnp.std(x, axis=tuple(range(x.ndim - 1))))
        rms_loss = 0.5 * self.momentum * (
            jnp.mean((mean - b_mean) ** 2) + jnp.mean((std - b_std) ** 2)
        )
        return out, rms_loss


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "relu"
    final_activation: bool = True
    kernel_init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=normc_init(self.kernel_init_scale))(x)
            if self.final_activation or i < len(self.features) - 1:
                x = act(x)
        return x


class DiagGaussianHead(nn.Module):
    """12-d diagonal Gaussian action head with learned state-independent
    logstd (reference pmc_net.py:99-114)."""

    action_dim: int = 12
    logstd_init: float = -2.0
    mean_init_scale: float = 0.01

    @nn.compact
    def __call__(self, x):
        mean = nn.Dense(
            self.action_dim, kernel_init=normc_init(self.mean_init_scale), name="mean"
        )(x)
        logstd = self.param(
            "logstd",
            lambda key, shape: jnp.full(shape, self.logstd_init),
            (self.action_dim,),
        )
        logstd = jnp.broadcast_to(logstd, mean.shape)
        return mean, logstd


def gaussian_neglogp(mean, logstd, x):
    return 0.5 * jnp.sum(((x - mean) / jnp.exp(logstd)) ** 2, axis=-1) + 0.5 * jnp.log(
        2.0 * jnp.pi
    ) * x.shape[-1] + jnp.sum(logstd, axis=-1)


def gaussian_entropy(logstd):
    return jnp.sum(logstd + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def gaussian_sample(key, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape, mean.dtype)


def gaussian_kl(mean_a, logstd_a, mean_b, logstd_b):
    var_a, var_b = jnp.exp(2 * logstd_a), jnp.exp(2 * logstd_b)
    return jnp.sum(
        logstd_b - logstd_a + (var_a + (mean_a - mean_b) ** 2) / (2 * var_b) - 0.5,
        axis=-1,
    )


def categorical_neglogp(logits, idx):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, idx[..., None], axis=-1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)
