"""Fused Pallas rollout: the whole MPPI horizon in ONE TPU kernel.

The XLA path (solver.rollout_tl) scans H control steps of `substeps` fused
substeps; every scan iteration and fusion boundary round-trips the state and
multi-MB intermediates through HBM. This kernel keeps the rollout state and
all physics intermediates resident in VMEM/vregs for the full horizon:

  grid = population tiles of (BS_TILE, 128) scenarios;
  per program: read the state tile + its (H, 4, 3, BS_TILE, 128) control
  slice, fori_loop over the horizon; each iteration refactors the frozen
  mass matrix (PhysicsParams.mass_freeze cadence), unrolls the physics
  substeps and accumulates the PMC tracking cost.

Physics inside the kernel is ops.scalar_phys — the scalar-constant
specialization of physics.engine_tl (Pallas cannot capture array constants;
Python-float constants also fold the MAX robot's axis-aligned sparsity into
the instruction stream).

The per-step mocap reference enters as a packed (H, 64) VMEM array and is
read back as per-step scalars.

Reference behavior parity: primitive_level_env.py:195-245 (stepping),
:350-426 (reward terms) — same math as solver.rollout_tl, asserted in
tests/test_rollout_pallas.py.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lifelike_tpu.costs.tracking import TrackingWeights
from lifelike_tpu.ops import scalar_phys as SP
from lifelike_tpu.physics import batched as B
from lifelike_tpu.solver import rollout_tl

BS_TILE = 8  # sublane tile: 8 x 128 scenarios per grid program
LANES = 128

# packed reference row layout (float32 scalars per control step)
_OFF_TARGET = 0  # 12: joint targets the controls are deltas on
_OFF_JP = 12  # 12: reference joint_pos at t+1
_OFF_JV = 24  # 12: reference joint_vel
_OFF_FOOT = 36  # 12: reference foot positions (4 legs x 3)
_OFF_BP = 48  # 3: reference base_pos
_OFF_BO = 51  # 4: reference base_orn (xyzw)
_OFF_BLV = 55  # 3
_OFF_BAV = 58  # 3
_REF_WIDTH = 64  # padded to a lane-friendly width

# exponential reward scales, reference primitive_level_env.py:373-377
_S_JP, _S_JV, _S_EE = -1.0, -0.1, -40.0
_S_RP = (-20.0, -10.0)
_S_RV = (-2.0, -0.2)


def pack_reference(ref: rollout_tl.RefTraj) -> jnp.ndarray:
    """RefTraj (leaves (H, ...) with trailing (1, 1)) -> (H, 64) scalars."""

    def flat(x):  # (H, ..., 1, 1) -> (H, k)
        return x.reshape(x.shape[0], -1)

    row = jnp.concatenate(
        [
            flat(ref.target_joint),
            flat(ref.joint_pos),
            flat(ref.joint_vel),
            flat(ref.foot_pos),
            flat(ref.base_pos),
            flat(ref.base_orn),
            flat(ref.base_lin_vel),
            flat(ref.base_ang_vel),
        ],
        axis=1,
    )
    pad = _REF_WIDTH - row.shape[1]
    return jnp.concatenate([row, jnp.zeros((row.shape[0], pad), row.dtype)], axis=1)


def _atan2_nonneg(y, x):
    """atan2 for y, x >= 0 (Mosaic has no atan2 primitive).

    Minimax-style odd polynomial of atan on [0, 1] plus the octant swap;
    max error ~1e-5 rad — far inside the cost parity tolerance."""
    lo = jnp.minimum(y, x)
    hi = jnp.maximum(y, x)
    z = lo / jnp.maximum(hi, 1e-30)
    z2 = z * z
    p = 0.9998660 + z2 * (
        -0.3302995 + z2 * (0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351))
    )
    a = z * p
    return jnp.where(y > x, math.pi / 2 - a, a)


def _tracking_cost(s: SP.State, p_feet, rd, weights: TrackingWeights):
    """Scalar-constant version of rollout_tl.tracking_cost_step.

    rd: callable col -> reference scalar for this step; p_feet: 4 x vec3."""
    w = np.asarray(weights, np.float64)
    w = w / w.sum()

    e_jp = 0.0
    e_jv = 0.0
    for l in range(4):
        for j in range(3):
            d = s.jq[l][j] - rd(_OFF_JP + l * 3 + j)
            e_jp = SP.add(e_jp, d * d)
            dv = s.jqd[l][j] - rd(_OFF_JV + l * 3 + j)
            e_jv = SP.add(e_jv, dv * dv)
    e_ee = 0.0
    for l in range(4):
        for k in range(3):
            d = p_feet[l][k] - rd(_OFF_FOOT + l * 3 + k)
            e_ee = SP.add(e_ee, d * d)
    e_bp = 0.0
    for k in range(3):
        d = s.pb[k] - rd(_OFF_BP + k)
        e_bp = SP.add(e_bp, d * d)
    # relative rotation angle |ref_q o q^-1|
    qx, qy, qz, qw = s.q
    rx_, ry_, rz_, rw_ = (rd(_OFF_BO + i) for i in range(4))
    dx = rw_ * -qx + rx_ * qw + ry_ * -qz - rz_ * -qy
    dy = rw_ * -qy - rx_ * -qz + ry_ * qw + rz_ * -qx
    dz = rw_ * -qz + rx_ * -qy - ry_ * -qx + rz_ * qw
    dw = rw_ * qw - rx_ * -qx - ry_ * -qy - rz_ * -qz
    sn = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    angle = 2.0 * _atan2_nonneg(sn, jnp.abs(dw))
    e_lv = 0.0
    e_av = 0.0
    for k in range(3):
        d = s.vb[k] - rd(_OFF_BLV + k)
        e_lv = SP.add(e_lv, d * d)
        da = s.wb[k] - rd(_OFF_BAV + k)
        e_av = SP.add(e_av, da * da)

    reward = (
        float(w[0]) * jnp.exp(_S_JP * e_jp)
        + float(w[1]) * jnp.exp(_S_JV * e_jv)
        + float(w[2]) * jnp.exp(_S_EE * e_ee)
        + float(w[3]) * jnp.exp(_S_RP[0] * e_bp + _S_RP[1] * angle * angle)
        + float(w[4]) * jnp.exp(_S_RV[0] * e_lv + _S_RV[1] * e_av)
    )
    cost = 1.0 - reward

    # fall / divergence penalties (masked arithmetic, rollout_tl parity)
    m = SP.quat_to_mat(s.q)
    fwd, up = SP.mat_col(m, 0), SP.mat_col(m, 2)
    left_z = up[0] * fwd[1] - up[1] * fwd[0]
    fall = (jnp.abs(left_z) > math.sin(math.pi / 4)) | (
        up[2] < math.cos(math.pi / 3)
    )
    diverged = (e_bp > 1.0) | (angle > 1.0)
    return cost + 5.0 * (fall | diverged).astype(cost.dtype)


def _rollout_kernel(
    ref_ref,  # (H, 64) packed reference scalars
    bp_ref, bo_ref, blv_ref, bav_ref, jp_ref, jv_ref,  # state tile
    ctrl_ref,  # (H, 4, 3, BS_TILE, LANES) joint-target deltas
    cost_ref,  # out: (BS_TILE, LANES)
    *,
    sm: SP.ScalarModel,
    params,
    horizon: int,
    weights: TrackingWeights,
):
    state = SP.State(
        pb=tuple(bp_ref[i] for i in range(3)),
        q=tuple(bo_ref[i] for i in range(4)),
        vb=tuple(blv_ref[i] for i in range(3)),
        wb=tuple(bav_ref[i] for i in range(3)),
        jq=tuple(tuple(jp_ref[l, j] for j in range(3)) for l in range(4)),
        jqd=tuple(tuple(jv_ref[l, j] for j in range(3)) for l in range(4)),
    )

    def step(t, carry):
        s, acc = carry
        rd = lambda col: ref_ref[t, col]
        target = tuple(
            tuple(rd(_OFF_TARGET + l * 3 + j) + ctrl_ref[t, l, j] for j in range(3))
            for l in range(4)
        )
        s = SP.control_step(sm, params, s, target)
        Rb = SP.quat_to_mat(s.q)
        p_feet = []
        for leg in range(4):
            kin = SP.leg_fk(sm, leg, Rb, s.pb, s.wb, s.vb, s.jq[leg], s.jqd[leg])
            p_feet.append(kin.p_foot)
        cost = _tracking_cost(s, p_feet, rd, weights)
        return s, acc + cost

    dtype = ctrl_ref.dtype
    init = (state, jnp.zeros(ctrl_ref.shape[-2:], dtype))
    _, total = jax.lax.fori_loop(0, horizon, step, init)
    cost_ref[:] = total


def rollout_tracking_fused(
    model,
    params,
    state: B.TLState,
    controls,
    ref: rollout_tl.RefTraj,
    weights: TrackingWeights = TrackingWeights(),
    interpret: bool = None,
    bs_tile: int = None,
):
    """Fused replacement for rollout_tl.rollout_tracking (cost only).

    model: robot.model MaxModel or a prebuilt scalar_phys.ScalarModel.
    state: TLState with batch broadcastable to (Bs, 128), Bs % bs_tile == 0.
    controls: (H, 4, 3, Bs, 128) joint-target deltas on ref.target_joint.
    bs_tile: sublane rows per grid program (default BS_TILE). Larger tiles
    give every VPU op bs_tile/8 independent native tiles, hiding the serial
    substep dependency chain — bounded by the (H, 4, 3, bs_tile, 128)
    control slice fitting VMEM (~16 MB/core).
    Returns total_cost (Bs, 128).
    """
    sm = model if isinstance(model, SP.ScalarModel) else SP.build_scalar_model(model)
    H = controls.shape[0]
    Bs, L = controls.shape[-2], controls.shape[-1]
    if bs_tile is None:
        bs_tile = BS_TILE
    bs_tile = min(bs_tile, Bs)  # small populations: waste sublanes, still run
    assert L == LANES and Bs % bs_tile == 0, (Bs, L)
    if state.base_pos.shape[-2:] != (Bs, L):
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, x.shape[:-2] + (Bs, L)), state
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    ref_packed = pack_reference(ref)
    grid = (Bs // bs_tile,)

    def spec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            shape_prefix + (bs_tile, LANES),
            (lambda i, _nd=nd: (0,) * _nd + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _rollout_kernel, sm=sm, params=params, horizon=H, weights=weights
    )
    cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (H, _REF_WIDTH), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            spec((3,)),
            spec((4,)),
            spec((3,)),
            spec((3,)),
            spec((4, 3)),
            spec((4, 3)),
            spec((H, 4, 3)),
        ],
        out_specs=spec(()),
        out_shape=jax.ShapeDtypeStruct((Bs, L), controls.dtype),
        interpret=interpret,
    )(
        ref_packed,
        state.base_pos,
        state.base_orn,
        state.base_lin_vel,
        state.base_ang_vel,
        state.joint_pos,
        state.joint_vel,
        controls,
    )
    return cost
