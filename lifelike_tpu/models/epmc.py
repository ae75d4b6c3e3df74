"""EPMC network: mid-level controller (MLC) over the frozen PMC LLC.

Flax re-design of the reference EPMC net (reference epmc_net/epmc_net.py),
canonical dims from train_scripts/example_epmc_train.sh:25-52:

  perception encoders (:83-131):
    percep_2d / percep_front: conv2d 4@1x1 -> 4@4x4 s2 -> 4@2x2 s2 -> 1@2x2,
      relu, SAME padding, flattened
    percep_1d: circular-padded conv1d stack 4@4 -> 4@4 s2 -> 4@4 s2 -> 1@4
    target vec: FC 32
    concat -> FC 64 (usr_cmd embed)
  mlc_encoder (:134-163): prop-embed 64 || usr_cmd 64 -> FC 256 -> LayerNorm
    LSTM (nlstm 32) -> 256-way categorical z logits
  z index -> 32-d codebook row (mapping_z :166-174; same codebook as the PMC
    LLC, loaded frozen from the PMC checkpoint) -> LLC decode (llc_light)
  value tower (:224-241): prop FC 128 tanh || usr_cmd FC 128 tanh -> FC 256
    tanh -> LSTM -> n_v values (own hidden-state slice)

Hidden state layout hs = [vf 64 | pi 64 | z 64] (:209-211); each 64 =
(c 32, h 32). llc_light has no pi LSTM, so hs_pi passes through zeros.
"""
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lifelike_tpu.models.layers import MLP, normc_init
from lifelike_tpu.models.pmc import LLC, PMCConfig


class EPMCConfig(NamedTuple):
    z_len: int = 256  # categorical codebook entries
    z_len_llc: int = 32  # codebook row dim
    nlstm: int = 32
    hs_slice: int = 64  # 2 * nlstm per lstm head
    embed_dim: int = 256
    bot_neck_prop_embed_size: int = 64
    bot_neck_z_embed_size: int = 32
    rms_momentum: float = 1e-4
    n_v: int = 1
    append_hist_a: bool = True
    activation: str = "relu"

    @property
    def hs_len(self):
        return 3 * self.hs_slice

    @property
    def llc_cfg(self):
        return PMCConfig(
            z_len=self.z_len_llc,
            num_embeddings=self.z_len,
            bot_neck_prop_embed_size=self.bot_neck_prop_embed_size,
            bot_neck_z_embed_size=self.bot_neck_z_embed_size,
        )


class LayerNormLSTMCell(nn.Module):
    """TLeague-compatible layer-norm LSTM (reference lstm_cell_type='lstm',
    lstm_layer_norm=True, forget_bias=1.0 — epmc_net_data.py:81-85).

    Exact parametrization of tpolicies' lstm_embed_block as evidenced by the
    pretrained checkpoints: separate input/recurrent kernels, a shared gate
    bias, and three layer norms —

        z = LN(x @ wx; g_x, b_x) + LN(h @ wh; g_h, b_h) + b
        i, f, o, u = split(z, 4)
        c' = sigmoid(f + forget_bias) * c + sigmoid(i) * tanh(u)
        h' = sigmoid(o) * tanh(LN(c'; g_c, b_c))

    (In the published EPMC/SEPMC checkpoints b, b_x and b_h are numerically
    identical — they receive the same gradient in this structure — which
    pins the additive composition above.) State packed as hs = concat[c, h].
    Param names mirror the checkpoint variable order for compat import
    (compat/tleague_import.py).
    """

    features: int
    forget_bias: float = 1.0
    # Inferred, not evidenced by the checkpoints (beta/gamma ties cannot pin
    # it): tf.contrib.layers.layer_norm defaults to 1e-12, the baselines
    # lnlstm lineage uses 1e-5. Numerically negligible except at zero
    # variance; we keep the tf.contrib value.
    ln_eps: float = 1e-12

    def _ln(self, v, name):
        gamma = self.param(f"{name}_gamma", nn.initializers.ones, (v.shape[-1],))
        beta = self.param(f"{name}_beta", nn.initializers.zeros, (v.shape[-1],))
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.var(v, axis=-1, keepdims=True)
        return gamma * (v - mu) * jax.lax.rsqrt(var + self.ln_eps) + beta

    @nn.compact
    def __call__(self, hs, x):
        nh = self.features
        c, h = jnp.split(hs, 2, axis=-1)
        wx = self.param(
            "wx", nn.initializers.lecun_normal(), (x.shape[-1], 4 * nh)
        )
        wh = self.param("wh", nn.initializers.lecun_normal(), (nh, 4 * nh))
        b = self.param("b", nn.initializers.zeros, (4 * nh,))
        z = self._ln(x @ wx, "ln_x") + self._ln(h @ wh, "ln_h") + b
        i, f, o, u = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f + self.forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(u)
        h = jax.nn.sigmoid(o) * jnp.tanh(self._ln(c, "ln_c"))
        return jnp.concatenate([c, h], axis=-1), h


class Percep2DEncoder(nn.Module):
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):  # (..., H, W)
        act = getattr(nn, self.activation)
        h = x[..., None]
        h = act(nn.Conv(4, (1, 1), padding="SAME")(h))
        h = act(nn.Conv(4, (4, 4), strides=2, padding="SAME")(h))
        h = act(nn.Conv(4, (2, 2), strides=2, padding="SAME")(h))
        h = act(nn.Conv(1, (2, 2), padding="SAME")(h))
        return h.reshape(h.shape[: x.ndim - 2] + (-1,))


class Percep1DEncoder(nn.Module):
    activation: str = "relu"
    kernel: int = 4

    @nn.compact
    def __call__(self, x):  # (..., 128) circular lidar
        act = getattr(nn, self.activation)
        k = self.kernel
        padded = jnp.concatenate([x[..., -k:], x, x[..., :k]], axis=-1)
        h = padded[..., None]
        h = act(nn.Conv(4, (k,), padding="SAME")(h))
        h = h[..., k:-k, :]
        h = act(nn.Conv(4, (k,), strides=2, padding="SAME")(h))
        h = act(nn.Conv(4, (k,), strides=2, padding="SAME")(h))
        h = act(nn.Conv(1, (k,), padding="SAME")(h))
        return h.reshape(h.shape[: x.ndim - 1] + (-1,))


class UsrCmdEncoder(nn.Module):
    """Perception-command encoder (reference epmc_net.py:117-131,
    sepmc_net.py mlc_usr_cmd_encoder). The vec branch (target fc 3->32) is
    created only when a vec command is given — the SEPMC value/HLC towers
    encode percepts alone (bottleneck 88->64), while the MLC proper gets
    target_info (bottleneck 120->64)."""

    cfg: EPMCConfig

    @nn.compact
    def __call__(self, percep_2d, percep_1d, percep_front, target=None):
        act = getattr(nn, self.cfg.activation)
        e2d = Percep2DEncoder(self.cfg.activation, name="percep_2d")(percep_2d)
        e1d = Percep1DEncoder(self.cfg.activation, name="percep_1d")(percep_1d)
        efr = Percep2DEncoder(self.cfg.activation, name="percep_front")(percep_front)
        embeds = [e2d, e1d, efr]
        if target is not None:
            t = act(nn.Dense(32, kernel_init=normc_init(1.0), name="vec_fc")(target))
            embeds = [t] + embeds
        h = jnp.concatenate(embeds, axis=-1)
        return act(
            nn.Dense(
                self.cfg.bot_neck_prop_embed_size,
                kernel_init=normc_init(1.0),
                name="bottleneck",
            )(h)
        )


class EPMCOutputs(NamedTuple):
    z_logits: jnp.ndarray  # (..., 256)
    z_idx: jnp.ndarray  # (...,)
    mean: jnp.ndarray  # (..., 12) LLC action mean
    logstd: jnp.ndarray  # (..., 12)
    value: jnp.ndarray  # (..., n_v)
    hs: jnp.ndarray  # (..., 192) new hidden state
    rms_loss: jnp.ndarray


class EPMCNet(nn.Module):
    cfg: EPMCConfig = EPMCConfig()

    def setup(self):
        c = self.cfg
        from lifelike_tpu.models.layers import RMS

        self.prop_rms = RMS(c.rms_momentum)
        # value tower
        self.vf_fc1 = nn.Dense(c.embed_dim // 2, kernel_init=normc_init(1.0))
        self.vf_cmd = UsrCmdEncoder(c)
        self.vf_fc2 = nn.Dense(c.embed_dim // 2, kernel_init=normc_init(1.0))
        self.vf_fc3 = nn.Dense(c.embed_dim, kernel_init=normc_init(1.0))
        self.vf_lstm = LayerNormLSTMCell(c.nlstm)
        self.value_out = nn.Dense(c.n_v, kernel_init=normc_init(1.0))
        # policy tower (mlc_encoder)
        self.pi_prop_embed = nn.Dense(
            c.bot_neck_prop_embed_size, kernel_init=normc_init(1.0)
        )
        self.pi_cmd = UsrCmdEncoder(c)
        self.pi_fc = nn.Dense(c.embed_dim, kernel_init=normc_init(1.0))
        self.pi_lstm = LayerNormLSTMCell(c.nlstm)
        self.z_out = nn.Dense(c.z_len, kernel_init=normc_init(1.0))
        # frozen LLC (codebook + decoder), loaded from the PMC checkpoint
        self.llc = LLC(c.llc_cfg)

    def __call__(self, obs, hs, mask, z_idx=None):
        """obs: PlaygroundObs-like namedtuple/dict; hs: (..., 192); mask:
        (...,) 1.0 at episode starts (resets the LSTM state); z_idx: provided
        codebook indices (training, 'outer-fed') or None to sample
        ('self-fed', needs an rng named 'z')."""
        c = self.cfg
        act = getattr(nn, c.activation)
        get = obs.get if isinstance(obs, dict) else lambda k: getattr(obs, k)

        x = get("prop")
        if c.append_hist_a:
            x = jnp.concatenate([x, get("prop_a")], axis=-1)
        prop_rms, rms_loss = self.prop_rms(x)

        keep = (1.0 - mask)[..., None]
        hs_vf = hs[..., : c.hs_slice] * keep
        hs_z = hs[..., 2 * c.hs_slice :] * keep

        # value
        v1 = jnp.tanh(self.vf_fc1(prop_rms))
        v2 = jnp.tanh(
            self.vf_fc2(
                self.vf_cmd(
                    get("percep_2d"), get("percep_1d"), get("percep_front"), get("target")
                )
            )
        )
        v = jnp.tanh(self.vf_fc3(jnp.concatenate([v1, v2], axis=-1)))
        hs_vf_new, v_emb = self.vf_lstm(hs_vf, v)
        value = self.value_out(v_emb)

        # policy: z logits
        pe = act(self.pi_prop_embed(prop_rms))
        ce = self.pi_cmd(
            get("percep_2d"), get("percep_1d"), get("percep_front"), get("target")
        )
        h = act(self.pi_fc(jnp.concatenate([pe, ce], axis=-1)))
        hs_z_new, z_emb = self.pi_lstm(hs_z, h)
        z_logits = self.z_out(z_emb)

        if z_idx is None:
            z_idx = jax.random.categorical(self.make_rng("z"), z_logits, axis=-1)

        z = self.llc.lookup(z_idx)
        mean, logstd = self.llc(prop_rms, z)

        hs_pi_new = jnp.zeros_like(hs_vf_new)  # llc_light: no pi LSTM (:256)
        hs_new = jnp.concatenate(
            [hs_vf_new, jnp.broadcast_to(hs_pi_new, hs_vf_new.shape), hs_z_new], axis=-1
        )
        return EPMCOutputs(
            z_logits=z_logits,
            z_idx=z_idx,
            mean=mean,
            logstd=logstd,
            value=value,
            hs=hs_new,
            rms_loss=rms_loss,
        )

    def initial_state(self, batch=()):
        return jnp.zeros(batch + (self.cfg.hs_len,))
