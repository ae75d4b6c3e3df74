"""PPO losses (clip variant + TD-lambda 'ppo2'), TPU data-parallel aware.

Re-derivation of the loss math the reference pulls from tpolicies
(tp_losses.ppo_loss / ppo2_loss, used at reference pmc_net.py:183-240):

  * advantage normalization with optional cross-replica statistics — the
    reference's `sync_statistics='horovod'` allreduce becomes a `lax.pmean`
    over the data-parallel mesh axis when provided
  * double-sided clipping with clip_range / clip_range_lower
  * TD-lambda returns via the standard backward scan (the reference computes
    `multistep_forward_view` pinned to CPU, pmc_net.py:222-224 — on TPU it is
    just a lax.scan over the rollout axis)
"""
from typing import Optional

import jax
import jax.numpy as jnp


def _normalize_adv(adv, axis_name: Optional[str] = None):
    mean = jnp.mean(adv)
    msq = jnp.mean(adv**2)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        msq = jax.lax.pmean(msq, axis_name)
    std = jnp.sqrt(jnp.maximum(msq - mean**2, 0.0))
    return (adv - mean) / (std + 1e-8)


def ppo_surrogate(neglogp, oldneglogp, adv, clip_range, clip_range_lower=None):
    ratio = jnp.exp(oldneglogp - neglogp)
    lo = clip_range if clip_range_lower is None else clip_range_lower
    clipped = jnp.clip(ratio, 1.0 - lo, 1.0 + clip_range)
    return -jnp.minimum(ratio * adv, clipped * adv)


def ppo_loss(
    neglogp,
    oldneglogp,
    vpred,
    R,
    V,
    clip_range=0.1,
    clip_range_lower=0.1,
    adv_normalize=True,
    axis_name=None,
):
    """Classic PPO with actor-computed returns (reference 'rl'/'ppo' path).

    R: returns, V: behavior values (both (..., n_v)); advantage = R - V summed
    over value heads.
    """
    adv = jnp.sum(R - V, axis=-1)
    if adv_normalize:
        adv = _normalize_adv(adv, axis_name)
    pg = jnp.mean(ppo_surrogate(neglogp, oldneglogp, adv, clip_range, clip_range_lower))
    value_loss = jnp.mean(0.5 * (R - vpred) ** 2)
    return pg, value_loss


def lambda_return(reward, discount, vpred_next, lam):
    """TD-lambda multi-step forward view over axis 0 (time).

    reward, discount: (T, B); vpred_next: (T, B) = V(s_{t+1}).
    G_t = r_t + d_t * ((1-lam) * V_{t+1} + lam * G_{t+1}), G_T seeded with V.
    """

    def body(carry, x):
        r, d, v_next = x
        g = r + d * ((1.0 - lam) * v_next + lam * carry)
        return g, g

    init = vpred_next[-1]
    _, G = jax.lax.scan(body, init, (reward, discount, vpred_next), reverse=True)
    return G


def ppo2_loss(
    neglogp,
    oldneglogp,
    vpred,
    reward,
    discount,
    lam=0.95,
    clip_range=0.1,
    clip_range_lower=0.1,
    adv_normalize=True,
    axis_name=None,
    mask=None,
):
    """TD-lambda PPO on (T, B) rollout tensors (reference 'ppo2' path).

    vpred: (T, B) value predictions. Uses steps [0, T-1) with the off-by-one
    V(s_{t+1}) alignment of the reference (pmc_net.py:218-240). Returns
    (pg_loss, value_loss, mean_return).
    """
    R = jax.lax.stop_gradient(
        lambda_return(reward[:-1], discount[:-1], vpred[1:], lam)
    )
    adv = R - jax.lax.stop_gradient(vpred[:-1])
    if adv_normalize:
        adv = _normalize_adv(adv, axis_name)
    pg = ppo_surrogate(
        neglogp[:-1], oldneglogp[:-1], adv, clip_range, clip_range_lower
    )
    if mask is not None:
        pg = pg * mask[:-1]
    pg_loss = jnp.mean(pg)
    value_loss = jnp.mean(0.5 * (R - vpred[:-1]) ** 2)
    return pg_loss, value_loss, jnp.mean(R)
