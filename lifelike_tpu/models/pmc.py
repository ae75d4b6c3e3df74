"""PMC network: VQ-VAE mocap-tracking policy with the reusable LLC decoder.

Flax re-design of the reference PMC net (reference pmc_net/pmc_net.py):

  prop (+ stacked actions) --rms--+--> value MLP (2x256 tanh -> 1)
  future ------------------rms---+
                                 +--> encoder MLP (2x256 relu) -> z (32)
                                        -> VQ against a 256-entry codebook
                                           (straight-through estimator)
  LLC decoder: prop_embed(64) || z_embed(32) -> 2x256 relu -> DiagGaussian(12)

The codebook lives inside the `llc` submodule scope so that EPMC/SEPMC can
load and freeze the LLC (decoder + codebook) from a PMC checkpoint by pure
pytree-path selection — the functional analog of the reference's
variable-scope freeze trick (epmc_net.py:166-174, 'llc_param_type'='freeze').

Outputs carry the action head params, value, VQ statistics and aux losses.
"""
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lifelike_tpu.models.layers import (
    RMS,
    DiagGaussianHead,
    MLP,
    normc_init,
)


class PMCConfig(NamedTuple):
    # canonical values from reference train_scripts/example_pmc_train.sh:25-41
    z_len: int = 32
    num_embeddings: int = 256
    embed_dim: int = 256
    bot_neck_prop_embed_size: int = 64
    bot_neck_z_embed_size: int = 32
    rms_momentum: float = 1e-4
    logstd_init: float = -2.0
    append_hist_a: bool = True
    activation: str = "relu"
    z_prior_type: str = "VQ"  # {'VQ', 'Gaussian'}


class PMCOutputs(NamedTuple):
    mean: jnp.ndarray  # (..., 12) action mean
    logstd: jnp.ndarray  # (..., 12)
    value: jnp.ndarray  # (..., 1)
    z: jnp.ndarray  # (..., z_len) straight-through latent
    z_idx: jnp.ndarray  # (...,) int codebook index (VQ)
    e_latent_loss: jnp.ndarray  # scalar
    q_latent_loss: jnp.ndarray  # scalar
    perplexity: jnp.ndarray  # scalar
    rms_loss: jnp.ndarray  # scalar
    kl_loss: jnp.ndarray  # scalar (Gaussian prior variant)


class LLC(nn.Module):
    """Low-level controller: (prop_rms, z) -> Gaussian action params.

    Holds the VQ codebook so PMC/EPMC/SEPMC share one frozen module.
    (reference pmc_net.py:99-114, codebook :159-161)
    """

    cfg: PMCConfig

    def setup(self):
        c = self.cfg
        self.codebook = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (c.z_len, c.num_embeddings),
        )
        self.prop_embed = nn.Dense(c.bot_neck_prop_embed_size, kernel_init=normc_init(1.0))
        self.z_embed = nn.Dense(c.bot_neck_z_embed_size, kernel_init=normc_init(1.0))
        self.decoder = MLP([c.embed_dim, c.embed_dim], activation=c.activation)
        self.head = DiagGaussianHead(12, logstd_init=c.logstd_init)

    def quantize(self, z_encode):
        """Nearest-codebook lookup with straight-through gradients."""
        d = (
            jnp.sum(z_encode**2, -1, keepdims=True)
            - 2.0 * z_encode @ self.codebook
            + jnp.sum(self.codebook**2, 0)
        )
        idx = jnp.argmin(d, axis=-1)
        quantized = jnp.take(self.codebook.T, idx, axis=0)
        z_st = z_encode + jax.lax.stop_gradient(quantized - z_encode)
        return z_st, quantized, idx

    def lookup(self, idx):
        """Codebook row for an explicit index (EPMC's discrete action path)."""
        return jnp.take(self.codebook.T, idx, axis=0)

    def decode(self, prop_rms, z):
        act = getattr(nn, self.cfg.activation)
        pe = act(self.prop_embed(prop_rms))
        ze = act(self.z_embed(z))
        h = self.decoder(jnp.concatenate([pe, ze], axis=-1))
        return self.head(h)

    def __call__(self, prop_rms, z):
        return self.decode(prop_rms, z)


class PMCNet(nn.Module):
    cfg: PMCConfig = PMCConfig()

    def setup(self):
        c = self.cfg
        self.prop_rms = RMS(c.rms_momentum)
        self.future_rms = RMS(c.rms_momentum)
        self.vf = MLP([c.embed_dim, c.embed_dim], activation="tanh")
        self.value_out = nn.Dense(1, kernel_init=normc_init(1.0))
        self.encoder = MLP([c.embed_dim, c.embed_dim], activation=c.activation)
        if c.z_prior_type == "VQ":
            self.z_out = nn.Dense(c.z_len, kernel_init=normc_init(1.0))
        else:
            self.z_mu = nn.Dense(c.z_len, kernel_init=normc_init(1.0))
            self.z_logvar = nn.Dense(c.z_len, kernel_init=normc_init(1.0))
        self.llc = LLC(c)

    def _prop_in(self, prop, prop_a):
        if self.cfg.append_hist_a:
            return jnp.concatenate([prop, prop_a], axis=-1)
        return prop

    def __call__(self, prop, prop_a, future):
        c = self.cfg
        prop_rms, prop_loss = self.prop_rms(self._prop_in(prop, prop_a))
        future_rms, future_loss = self.future_rms(future)
        rms_loss = prop_loss + future_loss
        ob_rms = jnp.concatenate([prop_rms, future_rms], axis=-1)

        value = self.value_out(self.vf(ob_rms))

        enc = self.encoder(ob_rms)
        zero = jnp.zeros((), dtype=prop.dtype)
        if c.z_prior_type == "VQ":
            z_encode = self.z_out(enc)
            z, quantized, idx = self.llc.quantize(z_encode)
            e_latent = jnp.mean((jax.lax.stop_gradient(quantized) - z_encode) ** 2)
            q_latent = jnp.mean((quantized - jax.lax.stop_gradient(z_encode)) ** 2)
            one_hot = jax.nn.one_hot(idx, c.num_embeddings)
            avg = jnp.mean(one_hot.reshape(-1, c.num_embeddings), axis=0)
            perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
            kl = zero
        else:  # Gaussian reparameterized latent (reference pmc_net.py:150-155)
            mu = self.z_mu(enc)
            logvar = self.z_logvar(enc)
            eps = jax.random.normal(self.make_rng("z"), mu.shape, mu.dtype)
            z = mu + jnp.exp(0.5 * logvar) * eps
            idx = jnp.zeros(z.shape[:-1], jnp.int32)
            e_latent = q_latent = perplexity = zero
            kl = jnp.mean(0.5 * jnp.sum(mu**2 + jnp.exp(logvar) - 1.0 - logvar, -1))

        mean, logstd = self.llc(prop_rms, z)
        return PMCOutputs(
            mean=mean,
            logstd=logstd,
            value=value,
            z=z,
            z_idx=idx,
            e_latent_loss=e_latent,
            q_latent_loss=q_latent,
            perplexity=perplexity,
            rms_loss=rms_loss,
            kl_loss=kl,
        )

    def decode_only(self, prop, prop_a, z):
        """Run rms + LLC decode for an externally chosen latent (EPMC path)."""
        prop_rms, _ = self.prop_rms(self._prop_in(prop, prop_a))
        return self.llc(prop_rms, z)

    def decode_index(self, prop, prop_a, z_idx):
        """LLC decode for a discrete codebook index (EPMC A_Z action path)."""
        prop_rms, _ = self.prop_rms(self._prop_in(prop, prop_a))
        return self.llc(prop_rms, self.llc.lookup(z_idx))


def restart_dead_codes(params, usage, rng, min_frac=1.0 / 1024.0,
                       jitter=0.03):
    """Host-side VQ dead-code restart (codebook-collapse counter-measure).

    Plain VQ with a codebook loss has a rich-get-richer failure: codes that
    stop being selected receive no gradient and die, and the perplexity
    collapses toward 1 (measured in the round-5 from-scratch PMC run:
    206 -> 1.6 over 3k updates at the reference lr). The standard fix is to
    re-seed dead codes near live ones: every code whose recent usage
    fraction is below `min_frac` is set to a usage-weighted random LIVE
    code plus small jitter, so the next nearest-neighbor assignment splits
    that live code's cluster. Deterministic given (usage, rng) — every
    data-parallel process computes the identical restart, keeping
    replicated params in sync.

    params: the learner's full param dict ({'params': {'llc':
    {'embedding': (z_len, K)}}}); usage: (K,) recent selection counts
    (learner metrics 'code_counts' EMA). Returns (params, n_restarted).
    """
    import numpy as np

    cb = np.asarray(params["params"]["llc"]["embedding"])  # (z_len, K)
    usage = np.asarray(usage, np.float64)
    total = usage.sum()
    if total <= 0:
        return params, 0
    dead = usage < min_frac * total
    n = int(dead.sum())
    if n == 0 or n == cb.shape[1]:
        return params, 0
    live_p = np.where(dead, 0.0, usage)
    live_p = live_p / live_p.sum()
    donors = rng.choice(cb.shape[1], size=n, p=live_p)
    scale = cb[:, ~dead].std() + 1e-6
    cb2 = cb.copy()
    cb2[:, dead] = (
        cb[:, donors]
        + jitter * scale * rng.standard_normal((cb.shape[0], n))
    )
    new = jax.tree.map(lambda x: x, params)  # shallow structural copy
    new["params"] = dict(new["params"])
    new["params"]["llc"] = dict(new["params"]["llc"])
    new["params"]["llc"]["embedding"] = jnp.asarray(
        cb2, params["params"]["llc"]["embedding"].dtype
    )
    return new, n
