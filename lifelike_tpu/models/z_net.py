"""Z pretraining net: temporal VAE distilling mocap tracking into latents.

Flax re-design of the reference z_mlp (reference z/z_mlp.py:103-221): per
rollout step, an encoder maps [future_rms, z_prev] -> (mu, logvar), the
reparameterized z feeds an MLP decoder with prop_rms to produce the 12-d
action mean; the latent prior is AR(1): z_t ~ N(alpha * z_{t-1}, 1-alpha^2)
with z_prev masked to zero at episode starts. The reference unrolls a Python
loop in-graph (:130-149); here it is a lax.scan over the rollout axis.

The dead-in-tree z_lstm_mlp variant (stale tairlearning imports,
z/rnn/z_lstm_mlp.py:13-16) is represented by the `use_lstm_encoder` switch.
"""
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lifelike_tpu.models.epmc import LayerNormLSTMCell
from lifelike_tpu.models.layers import MLP, RMS, normc_init


class ZNetConfig(NamedTuple):
    z_len: int = 32
    embed_dim: int = 256
    prop_dim: int = 135  # prop (99) + prop_a (36)
    alpha: float = 0.95  # AR(1) coefficient (reference pmc_net_data.py:86)
    beta: float = 1.0  # KL weight
    logstd_init: float = -2.0
    activation: str = "relu"
    use_lstm_encoder: bool = False
    nlstm: int = 32

    @property
    def logvar_prior(self):
        import math

        return math.log(1.0 - self.alpha**2)


class ZNetOutputs(NamedTuple):
    mean: jnp.ndarray  # (T, B, 12)
    logstd: jnp.ndarray  # (T, B, 12)
    z: jnp.ndarray  # (T, B, z_len)
    mu: jnp.ndarray
    logvar: jnp.ndarray
    z_prev: jnp.ndarray  # (T, B, z_len)
    hs: jnp.ndarray  # (B, z_len) final latent for carry-over
    rms_loss: jnp.ndarray


def log_normal_pdf(x, mean, logvar):
    log2pi = jnp.log(2.0 * jnp.pi)
    return jnp.sum(
        -0.5 * ((x - mean) ** 2 * jnp.exp(-logvar) + logvar + log2pi), axis=-1
    )


class ZNet(nn.Module):
    cfg: ZNetConfig = ZNetConfig()

    def setup(self):
        c = self.cfg
        self.rms = RMS()
        self.encoder = MLP([c.embed_dim, c.embed_dim], activation=c.activation)
        self.enc_mu = nn.Dense(c.z_len, kernel_init=normc_init(1.0))
        self.enc_logvar = nn.Dense(c.z_len, kernel_init=normc_init(1.0))
        self.decoder = MLP([c.embed_dim, c.embed_dim], activation=c.activation)
        self.dec_mean = nn.Dense(12, kernel_init=normc_init(0.01))
        self.logstd = self.param(
            "logstd", lambda k, s: jnp.full(s, c.logstd_init), (12,)
        )
        if c.use_lstm_encoder:
            self.enc_lstm = LayerNormLSTMCell(c.nlstm)

    def __call__(self, obs, z_init, masks):
        """obs: (T, B, prop_dim + future_dim); z_init: (B, z_len); masks:
        (T, B) 1.0 at episode starts. Returns ZNetOutputs with (T, B, ...)."""
        c = self.cfg
        ob_rms, rms_loss = self.rms(obs)
        prop = ob_rms[..., : c.prop_dim]
        future = ob_rms[..., c.prop_dim :]
        rng = self.make_rng("z")
        T = obs.shape[0]
        eps = jax.random.normal(rng, (T,) + z_init.shape, obs.dtype)
        z_last, (mean, z, mu, logvar, z_prev) = self._unrolled(
            z_init, future, prop, masks, eps
        )
        logstd = jnp.broadcast_to(self.logstd, mean.shape)
        return ZNetOutputs(
            mean=mean, logstd=logstd, z=z, mu=mu, logvar=logvar,
            z_prev=z_prev, hs=z_last, rms_loss=rms_loss,
        )

    def _unrolled(self, z_init, future, prop, masks, eps):
        """Unrolled loop over the rollout axis (as the reference does
        in-graph, :130-149; rollout_len is small, and flax submodule calls
        inside lax.scan leak tracers during init)."""
        z_prev = z_init
        ys = []
        for t in range(future.shape[0]):
            z_in = z_prev * (1.0 - masks[t][..., None])
            enc = self.encoder(jnp.concatenate([future[t], z_in], axis=-1))
            mu = self.enc_mu(enc)
            logvar = self.enc_logvar(enc)
            z = mu + jnp.exp(0.5 * logvar) * eps[t]
            dec = self.decoder(jnp.concatenate([prop[t], z], axis=-1))
            mean = self.dec_mean(dec)
            ys.append((mean, z, mu, logvar, z_in))
            z_prev = z
        stacked = tuple(jnp.stack(col) for col in zip(*ys))
        return z_prev, stacked


def ar1_prior_loss(cfg: ZNetConfig, out: ZNetOutputs):
    """-(log p(z) - log q(z|x)) with the AR(1) prior (reference :187-190).

    out.z_prev is already zeroed at episode starts inside the net, so the
    prior mean alpha * z_prev reduces to N(0, .) there — same math as the
    reference's in-loop masking."""
    logpz = log_normal_pdf(out.z, cfg.alpha * out.z_prev, cfg.logvar_prior)
    logqz = log_normal_pdf(out.z, out.mu, out.logvar)
    return -jnp.mean(logpz - logqz)
