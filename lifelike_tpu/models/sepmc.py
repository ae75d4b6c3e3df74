"""SEPMC network: high-level controller (HLC) over frozen MLC + LLC.

Flax re-design of the reference SEPMC net (reference sepmc_net/sepmc_net.py):

  hlc_usr_cmd (percept_vec 5 + oppo_info 15 + flag_info 7 + with_flag 2)
    -> FC 64 -> FC 64 (:117-124)
  hlc_encoder (:127-152): prop embed 64 || mlc_cmd embed 64 || hlc_cmd embed
    -> FC 256 -> LayerNorm LSTM -> 1-d Gaussian steering angle, mean clipped
    to +-pi, learned state-independent logvar
  angle -> target_info = [cos, sin, control_spd] injected into the MLC's
    command dict (:300-308); frozen MLC emits the 256-way z; frozen LLC
    decodes the 12-d action
  value tower (:271-289): three towers (prop / mlc cmd / CHEAT hlc cmd with
    true opponent+flag state) -> concat -> FC 256 tanh -> LSTM -> n_v —
    asymmetric actor-critic for centralized training

Hidden state hs = [vf 64 | pi 64 | z 64 | hlc 64] (:253-256); pi slice is
zeros under llc_light.
"""
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lifelike_tpu.models.epmc import (
    EPMCConfig,
    LayerNormLSTMCell,
    UsrCmdEncoder,
)
from lifelike_tpu.models.layers import normc_init
from lifelike_tpu.models.pmc import LLC


class SEPMCConfig(NamedTuple):
    epmc: EPMCConfig = EPMCConfig()
    hlc_logvar_init: float = -0.5
    n_v: int = 1
    outer_control_spd: bool = True

    @property
    def hs_slice(self):
        return self.epmc.hs_slice

    @property
    def hs_len(self):
        return 4 * self.epmc.hs_slice


class HLCUsrCmdEncoder(nn.Module):
    cfg: SEPMCConfig

    @nn.compact
    def __call__(self, percept_vec, oppo_info, flag_info, with_flag):
        act = getattr(nn, self.cfg.epmc.activation)
        x = jnp.concatenate([percept_vec, oppo_info, flag_info, with_flag], axis=-1)
        d = self.cfg.epmc.bot_neck_prop_embed_size
        x = act(nn.Dense(d, kernel_init=normc_init(1.0))(x))
        return act(nn.Dense(d, kernel_init=normc_init(1.0))(x))


class SEPMCOutputs(NamedTuple):
    hlc_mean: jnp.ndarray  # (..., 1) steering angle mean in [-pi, pi]
    hlc_logstd: jnp.ndarray  # (..., 1)
    hlc_angle: jnp.ndarray  # (..., 1) sampled/provided angle
    z_logits: jnp.ndarray  # (..., 256)
    z_idx: jnp.ndarray  # (...,)
    mean: jnp.ndarray  # (..., 12)
    logstd: jnp.ndarray  # (..., 12)
    value: jnp.ndarray  # (..., n_v)
    hs: jnp.ndarray  # (..., 256)
    rms_loss: jnp.ndarray


class SEPMCNet(nn.Module):
    cfg: SEPMCConfig = SEPMCConfig()

    def setup(self):
        c = self.cfg
        e = c.epmc
        from lifelike_tpu.models.layers import RMS

        self.prop_rms = RMS(e.rms_momentum)
        # value towers (cheat obs)
        self.vf_fc1 = nn.Dense(e.embed_dim // 2, kernel_init=normc_init(1.0))
        self.vf_mlc_cmd = UsrCmdEncoder(e)
        self.vf_fc2 = nn.Dense(e.embed_dim // 2, kernel_init=normc_init(1.0))
        self.vf_hlc_cmd = HLCUsrCmdEncoder(c)
        self.vf_fc3 = nn.Dense(e.embed_dim // 2, kernel_init=normc_init(1.0))
        self.vf_fc4 = nn.Dense(e.embed_dim, kernel_init=normc_init(1.0))
        self.vf_lstm = LayerNormLSTMCell(e.nlstm)
        self.value_out = nn.Dense(c.n_v, kernel_init=normc_init(1.0))
        # HLC
        self.hlc_prop_embed = nn.Dense(
            e.bot_neck_prop_embed_size, kernel_init=normc_init(1.0)
        )
        self.hlc_mlc_cmd = UsrCmdEncoder(e)
        self.hlc_cmd = HLCUsrCmdEncoder(c)
        self.hlc_fc = nn.Dense(e.embed_dim, kernel_init=normc_init(1.0))
        self.hlc_lstm = LayerNormLSTMCell(e.nlstm)
        self.hlc_mu = nn.Dense(1, kernel_init=normc_init(0.01))
        self.hlc_logvar = self.param(
            "hlc_logvar", lambda k, s: jnp.full(s, c.hlc_logvar_init), (1,)
        )
        # frozen MLC (same submodule family as EPMCNet's policy tower)
        self.mlc_prop_embed = nn.Dense(
            e.bot_neck_prop_embed_size, kernel_init=normc_init(1.0)
        )
        self.mlc_cmd = UsrCmdEncoder(e)
        self.mlc_fc = nn.Dense(e.embed_dim, kernel_init=normc_init(1.0))
        self.mlc_lstm = LayerNormLSTMCell(e.nlstm)
        self.z_out = nn.Dense(e.z_len, kernel_init=normc_init(1.0))
        # frozen LLC
        self.llc = LLC(e.llc_cfg)

    def __call__(self, obs, hs, mask, a_hlc=None, a_z=None):
        """obs: ChaseTagObs-like per-agent dict/namedtuple (no agent axis);
        a_hlc/a_z: provided actions (training) or None to sample (needs rngs
        'hlc' and 'z')."""
        c = self.cfg
        e = c.epmc
        act = getattr(nn, e.activation)
        get = obs.get if isinstance(obs, dict) else lambda k: getattr(obs, k)

        x = get("prop")
        if e.append_hist_a:
            x = jnp.concatenate([x, get("prop_a")], axis=-1)
        prop_rms, rms_loss = self.prop_rms(x)

        sl = c.hs_slice
        keep = (1.0 - mask)[..., None]
        hs_vf = hs[..., :sl] * keep
        hs_z = hs[..., 2 * sl : 3 * sl] * keep
        hs_hlc = hs[..., 3 * sl :] * keep

        p2d, p1d, pfr = get("percept_2d"), get("percept_1d"), get("percept_front")

        # value (cheat obs); the vf/hlc MLC-command encoders see percepts
        # only — no target branch (reference sepmc_net.py:275, :131)
        v1 = jnp.tanh(self.vf_fc1(prop_rms))
        v2 = jnp.tanh(self.vf_fc2(self.vf_mlc_cmd(p2d, p1d, pfr)))
        v3 = jnp.tanh(
            self.vf_fc3(
                self.vf_hlc_cmd(
                    get("percept_vec"), get("oppo_info_cheat"),
                    get("flag_info_cheat"), get("with_flag"),
                )
            )
        )
        v = jnp.tanh(self.vf_fc4(jnp.concatenate([v1, v2, v3], axis=-1)))
        hs_vf_new, v_emb = self.vf_lstm(hs_vf, v)
        value = self.value_out(v_emb)

        # HLC: steering angle
        he = act(self.hlc_prop_embed(prop_rms))
        hm = self.hlc_mlc_cmd(p2d, p1d, pfr)
        hc = self.hlc_cmd(
            get("percept_vec"), get("oppo_info"), get("flag_info"), get("with_flag")
        )
        h = act(self.hlc_fc(jnp.concatenate([he, hm, hc], axis=-1)))
        hs_hlc_new, h_emb = self.hlc_lstm(hs_hlc, h)
        hlc_mean = jnp.clip(self.hlc_mu(h_emb), -jnp.pi, jnp.pi)
        hlc_logstd = jnp.broadcast_to(0.5 * self.hlc_logvar, hlc_mean.shape)

        if a_hlc is None:
            eps = jax.random.normal(self.make_rng("hlc"), hlc_mean.shape, hlc_mean.dtype)
            a_hlc = hlc_mean + jnp.exp(hlc_logstd) * eps

        # target_info injection (:300-308)
        spd = get("control_spd")
        target_info = jnp.concatenate(
            [jnp.cos(a_hlc), jnp.sin(a_hlc), spd], axis=-1
        )

        # frozen MLC -> z
        pe = act(self.mlc_prop_embed(prop_rms))
        ce = self.mlc_cmd(p2d, p1d, pfr, target_info)
        m = act(self.mlc_fc(jnp.concatenate([pe, ce], axis=-1)))
        hs_z_new, z_emb = self.mlc_lstm(hs_z, m)
        z_logits = self.z_out(z_emb)
        if a_z is None:
            a_z = jax.random.categorical(self.make_rng("z"), z_logits, axis=-1)

        mean, logstd = self.llc(prop_rms, self.llc.lookup(a_z))

        hs_pi_new = jnp.zeros_like(hs_vf_new)
        hs_new = jnp.concatenate([hs_vf_new, hs_pi_new, hs_z_new, hs_hlc_new], axis=-1)
        return SEPMCOutputs(
            hlc_mean=hlc_mean,
            hlc_logstd=hlc_logstd,
            hlc_angle=a_hlc,
            z_logits=z_logits,
            z_idx=a_z,
            mean=mean,
            logstd=logstd,
            value=value,
            hs=hs_new,
            rms_loss=rms_loss,
        )

    def initial_state(self, batch=()):
        return jnp.zeros(batch + (self.cfg.hs_len,))
