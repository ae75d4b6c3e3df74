"""Fused Pallas traversal rollout: the EPMC MPC horizon in ONE TPU kernel.

The XLA path (solver.rollout_tasks.rollout_traversal_gait) scans H control
steps whose box-scene contact builds (K, ..., Bs, L) intermediates at every
fusion boundary — round-tripping multi-MB tensors through HBM is what put
the EPMC solve at 47 ms (BENCH_r03) vs the 2.9 ms fused PMC solve. This
kernel keeps the rollout state, the K-box contact set and the traversal
stage cost resident in VMEM for the whole horizon, exactly like
ops.rollout_pallas does for the flat PMC tracking solve:

  grid = population tiles of (bs_tile, 128) candidate controls;
  per program: state tile + (H, 4, 3, bs_tile, 128) control slice +
  a scenario-blocked (1, K, 8) box table and (1, H, 64) packed gait
  reference (randomized-arena sweeps map grid programs to per-scenario
  blocks); fori_loop over the horizon; each step runs
  ops.scalar_phys.control_step with the K-vectorized box contact
  (scalar_phys.box_forces) and accumulates the joystick / average-speed
  traversal cost. Chase and plan-rollout variants share the machinery.

Reference behavior parity: the cost is rollout_tasks.rollout_traversal_gait
(playground_env.py:479-539 negated rewards + posture/clearance shaping +
gait prior tracking); asserted in tests/test_traversal_pallas.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lifelike_tpu.costs.traversal import STAND_POSE, TraversalWeights
from lifelike_tpu.ops import scalar_phys as SP
from lifelike_tpu.ops.rollout_pallas import (
    _OFF_JP,
    _OFF_JV,
    _OFF_TARGET,
    _REF_WIDTH,
    BS_TILE,
    LANES,
    pack_reference,
)
from lifelike_tpu.physics import batched as B

BOX_WIDTH = 8  # packed box row: cx cy cz hx hy hz active pad

# chase: the opponent's hoisted plan trajectory rides the spare packed-ref
# columns (rollout_pallas uses 0..60; 64-wide rows leave 61..63 free)
_OFF_OPP = 61  # 2: opponent base x, y at step t


def pack_boxes(scene) -> jnp.ndarray:
    """BoxScene / TLScene -> (K, 8) float32 rows [c, h, active, 0]."""
    center = scene.center.reshape(-1, 3)
    half = scene.half.reshape(-1, 3)
    active = scene.active.reshape(-1, 1).astype(center.dtype)
    pad = jnp.zeros_like(active)
    return jnp.concatenate([center, half, active, pad], axis=1)


def _scen_mix(n_scen, scen_rows, lanes, dtype):
    """Scenario-major tiling: combine per-scenario scalars into per-row
    planes.

    A kernel program whose (n_scen*scen_rows, lanes) block packs n_scen
    scenarios (scenario g owns rows [g*scen_rows, (g+1)*scen_rows)) cannot
    read one scalar per program from its ref/task/box tables; mix(read)
    returns sum_g read(g) * mask_g — exact, since every row sees its own
    scenario's value * 1.0 plus 0.0 terms. Shrinking the grid this way is
    what makes tiny-population scenario work (opponent plan rollouts: 16
    scenarios x 1 useful row) cost ~1 program instead of 16: the sequential
    H x substeps loop runs per PROGRAM, not per row."""
    rows = n_scen * scen_rows
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    masks = [(iota // scen_rows == g).astype(dtype) for g in range(n_scen)]

    def mix(read):
        acc = read(0) * masks[0]
        for g in range(1, n_scen):
            acc = acc + read(g) * masks[g]
        return acc

    return mix, masks


def _fall_mask(s: SP.State):
    """rollout_tl.fall_mask_tl in scalars (roll > 45 deg or pitch > 60)."""
    import math

    m = SP.quat_to_mat(s.q)
    fwd, up = SP.mat_col(m, 0), SP.mat_col(m, 2)
    left_z = up[0] * fwd[1] - up[1] * fwd[0]
    return (jnp.abs(left_z) > math.sin(math.pi / 4)) | (
        up[2] < math.cos(math.pi / 3)
    )


def _direction_terms(s: SP.State, tp):
    """rollout_tasks._direction_terms in scalars: (dist, speed-to-target,
    heading alignment). tp: 2-tuple of scalars."""
    dx = tp[0] - s.pb[0]
    dy = tp[1] - s.pb[1]
    d = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1e-8)
    dirx, diry = dx / d, dy / d
    spd_sg = s.vb[0] * dirx + s.vb[1] * diry
    # cos/sin of base yaw without atan2: normalized forward-axis projection
    m = SP.quat_to_mat(s.q)
    fx, fy = m[0][0], m[1][0]
    fnorm = jnp.maximum(jnp.sqrt(fx * fx + fy * fy), 1e-8)
    align = (fx * dirx + fy * diry) / fnorm
    return d, jnp.abs(spd_sg), spd_sg, align


def _posture_cost(s: SP.State, w: TraversalWeights):
    up_z = 1.0 - 2.0 * (s.q[0] * s.q[0] + s.q[1] * s.q[1])
    pose_err = 0.0
    for l in range(4):
        for j in range(3):
            dq = s.jq[l][j] - STAND_POSE[l * 3 + j]
            pose_err = SP.add(pose_err, dq * dq)
    cost = (
        w.height * jnp.maximum(w.height_min - s.pb[2], 0.0)
        + w.upright * (1.0 - up_z)
        + w.pose * (pose_err / 12.0)
    )
    if getattr(w, "ceiling", 0.0) > 0.0:
        cost = cost + w.ceiling_w * jnp.maximum(s.pb[2] - w.ceiling, 0.0)
    return cost


def _clearance_cost(s: SP.State, bx, crawl_gap=0.0, margin=0.15,
                    tall_threshold=0.3):
    """rollout_tasks.clearance_cost_tl vectorized over the K boxes."""
    cx, cy, cz, hx, hy, hz, act = bx
    dx = jnp.maximum(jnp.abs(s.pb[0] - cx) - hx, 0.0)
    dy = jnp.maximum(jnp.abs(s.pb[1] - cy) - hy, 0.0)
    horiz = jnp.sqrt(dx * dx + dy * dy)
    tall = ((cz + hz) > tall_threshold).astype(horiz.dtype)
    blocking = tall * act
    if crawl_gap > 0.0:
        blocking = blocking * ((cz - hz) < crawl_gap)
    pen = jnp.maximum(margin - horiz, 0.0) * blocking
    return jnp.sum(pen * pen, axis=0)


def _trav_kernel(
    ref_ref,  # (1, H, 64) packed gait reference scalars (scenario block)
    task_ref,  # (1, 1, 8) [tp_x, tp_y, tp_z, target_spd, ...]
    boxes_ref,  # (1, K, 8) box table (scenario block)
    bp_ref, bo_ref, blv_ref, bav_ref, jp_ref, jv_ref,  # state tile
    ctrl_ref,  # (H, 4, 3, bs_tile, LANES) deltas on the gait targets
    cost_ref,  # out: (bs_tile, LANES)
    *,
    sm: SP.ScalarModel,
    params,
    horizon: int,
    n_boxes: int,
    weights: TraversalWeights,
    gait_weight: float,
    gait_vel_weight: float,
    reward_type: str,
    max_steps: int,
):
    state = SP.State(
        pb=tuple(bp_ref[i] for i in range(3)),
        q=tuple(bo_ref[i] for i in range(4)),
        vb=tuple(blv_ref[i] for i in range(3)),
        wb=tuple(bav_ref[i] for i in range(3)),
        jq=tuple(tuple(jp_ref[l, j] for j in range(3)) for l in range(4)),
        jqd=tuple(tuple(jv_ref[l, j] for j in range(3)) for l in range(4)),
    )
    btab = boxes_ref[0]  # (K, 8)
    bx = tuple(btab[:, j][:, None, None] for j in range(7))
    tp = (task_ref[0, 0, 0], task_ref[0, 0, 1])
    tspd = task_ref[0, 0, 3]

    d0x = tp[0] - state.pb[0]
    d0y = tp[1] - state.pb[1]
    d0 = jnp.maximum(jnp.sqrt(d0x * d0x + d0y * d0y), 1e-8)

    def step(t, carry):
        s, last_d, acc = carry
        rd = lambda col: ref_ref[0, t, col]
        target = tuple(
            tuple(
                rd(_OFF_TARGET + l * 3 + j) + ctrl_ref[t, l, j]
                for j in range(3)
            )
            for l in range(4)
        )
        s = SP.control_step(sm, params, s, target, boxes=bx)

        d, spd, spd_sg, align = _direction_terms(s, tp)
        r_rot = jnp.exp((align - 1.0) * 5.0)
        if reward_type == "joystick":
            r_vel = jnp.exp(-jnp.abs(spd - tspd))
            cost = 1.0 - r_vel * r_rot
            new_d = last_d
        else:  # average_speed family
            cost = 0.1 * (d - last_d) / d0 - (0.2 / float(max_steps)) * r_rot
            new_d = d
        cost = cost + weights.velocity * jnp.abs(spd_sg - tspd) / (1.0 + tspd)
        cost = cost + weights.heading * (1.0 - align)
        cost = cost + _posture_cost(s, weights)
        cost = cost + weights.fall * _fall_mask(s).astype(cost.dtype)
        cost = cost + weights.clearance * _clearance_cost(
            s, bx, weights.crawl_gap
        )

        if gait_weight != 0.0:
            e_q = 0.0
            e_qd = 0.0
            for l in range(4):
                for j in range(3):
                    dq = s.jq[l][j] - rd(_OFF_JP + l * 3 + j)
                    e_q = SP.add(e_q, dq * dq)
                    dv = s.jqd[l][j] - rd(_OFF_JV + l * 3 + j)
                    e_qd = SP.add(e_qd, dv * dv)
            cost = cost + gait_weight * (
                e_q / 12.0 + gait_vel_weight * (e_qd / 12.0)
            )
        return s, new_d, acc + cost

    dtype = ctrl_ref.dtype
    zero = jnp.zeros(ctrl_ref.shape[-2:], dtype)
    _, _, total = jax.lax.fori_loop(
        0, horizon, step, (state, d0 + zero, zero)
    )
    cost_ref[:] = total


def _plan_kernel(
    ref_ref,  # (1, H, 64) packed reference (target_joint drives the plan)
    boxes_ref,  # (1, K, 8)
    bp_ref, bo_ref, blv_ref, bav_ref, jp_ref, jv_ref,
    ctrl_ref,  # (H, 4, 3, bs_tile, LANES)
    traj_ref,  # out: (H, 4, bs_tile, LANES) base position (xyz + pad)
    *,
    sm: SP.ScalarModel,
    params,
    horizon: int,
    n_scen: int = 1,
    scen_rows: int = 0,
):
    state = SP.State(
        pb=tuple(bp_ref[i] for i in range(3)),
        q=tuple(bo_ref[i] for i in range(4)),
        vb=tuple(blv_ref[i] for i in range(3)),
        wb=tuple(bav_ref[i] for i in range(3)),
        jq=tuple(tuple(jp_ref[l, j] for j in range(3)) for l in range(4)),
        jqd=tuple(tuple(jv_ref[l, j] for j in range(3)) for l in range(4)),
    )
    if n_scen == 1:
        btab = boxes_ref[0]
        bx = tuple(btab[:, j][:, None, None] for j in range(7))
        mix = None
    else:
        mix, masks = _scen_mix(n_scen, scen_rows, ctrl_ref.shape[-1],
                               ctrl_ref.dtype)
        bx = tuple(
            sum(boxes_ref[g][:, j][:, None, None] * masks[g][None]
                for g in range(n_scen))
            for j in range(7)
        )

    def step(t, s):
        if mix is None:
            rd = lambda col: ref_ref[0, t, col]
        else:
            rd = lambda col: mix(lambda g: ref_ref[g, t, col])
        target = tuple(
            tuple(
                rd(_OFF_TARGET + l * 3 + j) + ctrl_ref[t, l, j]
                for j in range(3)
            )
            for l in range(4)
        )
        s = SP.control_step(sm, params, s, target, boxes=bx)
        for cmp in range(3):
            traj_ref[t, cmp] = s.pb[cmp]
        traj_ref[t, 3] = jnp.zeros_like(s.pb[0])
        return s

    jax.lax.fori_loop(0, horizon, step, state)


def rollout_plan_fused(model, params, state: B.TLState, u_plan, boxes, ref,
                       interpret: bool = None):
    """Fused rollout_tasks.rollout_plan[_gait]: plan base trajectories.

    The XLA plan rollout at batch (1, 1) is 500 sequential tiny substeps —
    measured ~70-95 ms on the chip, dominating the SEPMC best-response
    round and the scenario sweep. Each plan rides one kernel-grid program
    (lanes are redundant copies; latency is what matters).

    Single plan: state batch (1, 1), u_plan (H, 4, 3), boxes (K, 8) or a
    scene, ref a RefTraj -> (H, 3, 1, 1) like rollout_plan.
    Batched (scenario sweep): state batch (S, 1), u_plan (S, H, 4, 3),
    boxes (S, K, 8), ref (S, H, 64) or shared RefTraj -> (H, 3, S, 1).
    """
    sm = model if isinstance(model, SP.ScalarModel) else SP.build_scalar_model(model)
    batched = u_plan.ndim == 4
    S = u_plan.shape[0] if batched else 1
    H = u_plan.shape[1] if batched else u_plan.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not (hasattr(boxes, "ndim") and boxes.ndim >= 2):
        boxes = pack_boxes(boxes)
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], (S,) + boxes.shape)
    K = boxes.shape[1]
    ref_packed = ref if hasattr(ref, "ndim") else pack_reference(ref)
    if ref_packed.ndim == 2:
        ref_packed = jnp.broadcast_to(ref_packed[None],
                                      (S,) + ref_packed.shape)
    dtype = state.base_pos.dtype
    if batched and S % 8 == 0:
        # scenario-major tiling: one ROW per scenario, G scenarios per
        # program (_scen_mix masks select each row's ref/box tables). The
        # sequential H x substeps loop runs per program, so grid S -> S/G
        # cuts the plan cost ~G-fold; lanes stay redundant copies. Cap the
        # double-buffered ctrl block under the 16 MB scoped-vmem limit.
        G, R = 8, 1
    else:
        # lay scenarios on tile rows, 8 sublanes each (Mosaic requires row
        # blocks divisible by 8): scenario i owns rows [8i, 8i+8)
        G, R = 1, 8
    state = jax.tree.map(
        lambda x: jnp.repeat(
            jnp.broadcast_to(x, x.shape[:-2] + (S, LANES)), R, axis=-2
        ),
        state,
    )
    up = u_plan if batched else u_plan[None]
    ctrl = jnp.broadcast_to(
        jnp.repeat(jnp.moveaxis(up, 0, 3), R, axis=-1)[..., None],
        (H, 4, 3, S * R, LANES),
    ).astype(dtype)

    def spec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            shape_prefix + (G * R, LANES),
            (lambda i, _nd=nd: (0,) * _nd + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_plan_kernel, sm=sm, params=params, horizon=H,
                               n_scen=G, scen_rows=R if G > 1 else 0)
    traj = pl.pallas_call(
        kernel,
        grid=(S // G,),
        in_specs=[
            pl.BlockSpec((G, H, _REF_WIDTH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, BOX_WIDTH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec((3,)),
            spec((4,)),
            spec((3,)),
            spec((3,)),
            spec((4, 3)),
            spec((4, 3)),
            spec((H, 4, 3)),
        ],
        out_specs=spec((H, 4)),
        out_shape=jax.ShapeDtypeStruct((H, 4, S * R, LANES), dtype),
        interpret=interpret,
    )(
        ref_packed,
        boxes,
        state.base_pos,
        state.base_orn,
        state.base_lin_vel,
        state.base_ang_vel,
        state.joint_pos,
        state.joint_vel,
        ctrl,
    )
    return traj[:, :3, ::R, :1]


def _chase_kernel(
    ref_ref,  # (1, H, 64) packed gait reference + opponent plan columns
    task_ref,  # (1, 1, 8) [flag_x, flag_y, chaser_mask, ...]
    boxes_ref,  # (1, K, 8) arena box table
    bp_ref, bo_ref, blv_ref, bav_ref, jp_ref, jv_ref,
    ctrl_ref,
    cost_ref,
    *,
    sm: SP.ScalarModel,
    params,
    horizon: int,
    weights,
    gait_weight: float,
    gait_vel_weight: float,
    n_scen: int = 1,
    scen_rows: int = 0,
):
    state = SP.State(
        pb=tuple(bp_ref[i] for i in range(3)),
        q=tuple(bo_ref[i] for i in range(4)),
        vb=tuple(blv_ref[i] for i in range(3)),
        wb=tuple(bav_ref[i] for i in range(3)),
        jq=tuple(tuple(jp_ref[l, j] for j in range(3)) for l in range(4)),
        jqd=tuple(tuple(jv_ref[l, j] for j in range(3)) for l in range(4)),
    )
    if n_scen == 1:
        btab = boxes_ref[0]
        bx = tuple(btab[:, j][:, None, None] for j in range(7))
        mix = None
        fp = (task_ref[0, 0, 0], task_ref[0, 0, 1])
        chaser_m = task_ref[0, 0, 2]
    else:
        mix, masks = _scen_mix(n_scen, scen_rows, ctrl_ref.shape[-1],
                               ctrl_ref.dtype)
        bx = tuple(
            sum(boxes_ref[g][:, j][:, None, None] * masks[g][None]
                for g in range(n_scen))
            for j in range(7)
        )
        fp = (mix(lambda g: task_ref[g, 0, 0]),
              mix(lambda g: task_ref[g, 0, 1]))
        chaser_m = mix(lambda g: task_ref[g, 0, 2])

    def step(t, carry):
        s, acc = carry
        if mix is None:
            rd = lambda col: ref_ref[0, t, col]
        else:
            rd = lambda col: mix(lambda g: ref_ref[g, t, col])
        target = tuple(
            tuple(
                rd(_OFF_TARGET + l * 3 + j) + ctrl_ref[t, l, j]
                for j in range(3)
            )
            for l in range(4)
        )
        s = SP.control_step(sm, params, s, target, boxes=bx)

        opp = (rd(_OFF_OPP), rd(_OFF_OPP + 1))
        # chaser: close the distance + heading (rollout_tasks.chaser_cost_tl)
        dx = opp[0] - s.pb[0]
        dy = opp[1] - s.pb[1]
        d_opp = jnp.sqrt(dx * dx + dy * dy)
        inv = 1.0 / jnp.maximum(d_opp, 1e-8)
        m = SP.quat_to_mat(s.q)
        fx, fy = m[0][0], m[1][0]
        fnorm = jnp.maximum(jnp.sqrt(fx * fx + fy * fy), 1e-8)
        align = (fx * dx * inv + fy * dy * inv) / fnorm
        r_rot = jnp.exp((align - 1.0) * 2.0)
        c_ch = weights.distance * d_opp + weights.heading * (1.0 - r_rot)
        # escapee: evade + close on the flag (escapee_cost_tl)
        fdx = fp[0] - s.pb[0]
        fdy = fp[1] - s.pb[1]
        d_flag = jnp.sqrt(fdx * fdx + fdy * fdy)
        c_es = -weights.distance * d_opp + weights.distance * d_flag

        cost = chaser_m * c_ch + (1.0 - chaser_m) * c_es
        fall = _fall_mask(s)
        cost = cost + weights.fall * fall.astype(cost.dtype)
        cost = cost + _posture_cost(s, weights)
        cost = cost + 0.5 * _clearance_cost(s, bx)

        if gait_weight != 0.0:
            e_q = 0.0
            e_qd = 0.0
            for l in range(4):
                for j in range(3):
                    dq = s.jq[l][j] - rd(_OFF_JP + l * 3 + j)
                    e_q = SP.add(e_q, dq * dq)
                    dv = s.jqd[l][j] - rd(_OFF_JV + l * 3 + j)
                    e_qd = SP.add(e_qd, dv * dv)
            cost = cost + gait_weight * (
                e_q / 12.0 + gait_vel_weight * (e_qd / 12.0)
            )
        return s, acc + cost

    dtype = ctrl_ref.dtype
    _, total = jax.lax.fori_loop(
        0, horizon, step, (state, jnp.zeros(ctrl_ref.shape[-2:], dtype))
    )
    cost_ref[:] = total


def rollout_chase_fused(
    model,
    params,
    state: B.TLState,
    controls,
    boxes,
    ref,
    opp_traj,
    flag_pos,
    is_chaser,
    weights=None,
    gait_weight=1.0,
    gait_vel_weight=0.02,
    interpret: bool = None,
    bs_tile: int = None,
    scen_per_prog: int = 1,
):
    """Fused replacement for rollout_tasks.rollout_chase_gait (cost only).

    opp_traj: (H, 3[, 1, 1]) hoisted opponent plan; is_chaser: bool/float
    scalar (masked-arithmetic role switch, one compiled solve serves both
    roles); flag_pos: (3,). fall/role/arena cost parity with
    rollout_tasks.rollout_chase[_gait] — pinned in
    tests/test_traversal_pallas.py. Returns total_cost (Bs, 128).
    """
    from lifelike_tpu.costs.chase import ChaseWeights

    if weights is None:
        weights = ChaseWeights()
    sm = model if isinstance(model, SP.ScalarModel) else SP.build_scalar_model(model)
    H = controls.shape[0]
    Bs, L = controls.shape[-2], controls.shape[-1]
    if bs_tile is None:
        bs_tile = BS_TILE
    bs_tile = min(bs_tile, Bs)
    assert L == LANES and Bs % bs_tile == 0, (Bs, L)
    if state.base_pos.shape[-2:] != (Bs, L):
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, x.shape[:-2] + (Bs, L)), state
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if not (hasattr(boxes, "ndim") and boxes.ndim >= 2):
        boxes = pack_boxes(boxes)
    if boxes.ndim == 2:
        boxes = boxes[None]
    S = boxes.shape[0]
    K = boxes.shape[1]
    G = 1
    if S > 1:
        assert Bs % S == 0, (Bs, S)
        scen_rows = Bs // S
        # scenario-major tiling (_scen_mix) is available here too
        # (scen_per_prog > 1), but at population-sized blocks the chase
        # kernel is vector-work-bound, not program-overhead-bound:
        # grouping G=2 scenarios per program MEASURED SLOWER (88 vs 78 ms
        # at s16 pop1024 H50 on the chip) — larger blocks buy nothing once
        # every op already fills vregs, and the per-row box planes add
        # contact work. Default stays one scenario per program; the
        # grouping pays off in rollout_plan_fused where rows per scenario
        # are tiny.
        if scen_per_prog > 1:
            assert S % scen_per_prog == 0 and \
                (scen_per_prog * scen_rows) % 8 == 0, (S, scen_per_prog)
            G = scen_per_prog
        bs_tile = G * scen_rows
    ref_packed = ref if hasattr(ref, "ndim") else pack_reference(ref)
    if ref_packed.ndim == 2:
        ref_packed = jnp.broadcast_to(ref_packed[None],
                                      (S,) + ref_packed.shape)
    # opp_traj: (H, 3[, 1, 1]) shared, or (S, H, 2+) per scenario
    if jnp.ndim(opp_traj) >= 3 and opp_traj.shape[0] == S and S > 1:
        opp = opp_traj.reshape(S, H, -1)[..., :2]
        ref_packed = ref_packed.at[:, :, _OFF_OPP:_OFF_OPP + 2].set(opp)
    else:
        opp = opp_traj.reshape(H, -1)[:, :2]
        ref_packed = ref_packed.at[:, :, _OFF_OPP:_OFF_OPP + 2].set(
            opp[None]
        )
    fp = jnp.asarray(flag_pos)
    fp = fp.reshape(-1, fp.shape[-1])[:, :2]
    fp = jnp.broadcast_to(fp, (S, 2))
    ch = jnp.broadcast_to(
        jnp.asarray(is_chaser, fp.dtype).reshape(-1, 1), (S, 1)
    )
    task = jnp.concatenate(
        [fp, ch, jnp.zeros((S, 5), fp.dtype)], axis=1
    ).reshape(S, 1, BOX_WIDTH)

    grid = (Bs // bs_tile,)
    smap = (lambda i: (i, 0, 0)) if S > 1 else (lambda i: (0, 0, 0))

    def spec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            shape_prefix + (bs_tile, LANES),
            (lambda i, _nd=nd: (0,) * _nd + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _chase_kernel, sm=sm, params=params, horizon=H, weights=weights,
        gait_weight=float(gait_weight),
        gait_vel_weight=float(gait_vel_weight),
        n_scen=G, scen_rows=scen_rows if G > 1 else 0,
    )
    cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, H, _REF_WIDTH), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, BOX_WIDTH), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, BOX_WIDTH), smap, memory_space=pltpu.VMEM),
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
        task,
        boxes,
        state.base_pos,
        state.base_orn,
        state.base_lin_vel,
        state.base_ang_vel,
        state.joint_pos,
        state.joint_vel,
        controls,
    )
    return cost


def rollout_traversal_fused(
    model,
    params,
    state: B.TLState,
    controls,
    boxes,
    ref,
    target_pos,
    target_spd,
    reward_type="joystick",
    max_steps=1000,
    weights: TraversalWeights = TraversalWeights(),
    gait_weight=1.0,
    gait_vel_weight=0.02,
    interpret: bool = None,
    bs_tile: int = None,
):
    """Fused replacement for rollout_tasks.rollout_traversal_gait (cost only).

    model: MaxModel or prebuilt scalar_phys.ScalarModel.
    state: TLState broadcastable to (Bs, 128).
    controls: (H, 4, 3, Bs, 128) deltas on ref.target_joint.
    boxes: (K, 8) pack_boxes table (or a BoxScene/TLScene to pack here) —
    the PRUNED contact set (mpc_tasks.CONTACT_K corridor prune).
    ref: rollout_tl.RefTraj gait prior (pass gait_weight=0.0 to reduce to
    the raw rollout_traversal cost with ref.target_joint as the nominal).
    Returns total_cost (Bs, 128).
    """
    sm = model if isinstance(model, SP.ScalarModel) else SP.build_scalar_model(model)
    H = controls.shape[0]
    Bs, L = controls.shape[-2], controls.shape[-1]
    if bs_tile is None:
        bs_tile = BS_TILE
    bs_tile = min(bs_tile, Bs)
    assert L == LANES and Bs % bs_tile == 0, (Bs, L)
    if state.base_pos.shape[-2:] != (Bs, L):
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, x.shape[:-2] + (Bs, L)), state
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if not (hasattr(boxes, "ndim") and boxes.ndim >= 2):
        boxes = pack_boxes(boxes)
    if boxes.ndim == 2:
        boxes = boxes[None]
    S = boxes.shape[0]
    K = boxes.shape[1]
    if S > 1:
        assert Bs % S == 0, (Bs, S)
        bs_tile = Bs // S
    ref_packed = ref if hasattr(ref, "ndim") else pack_reference(ref)
    if ref_packed.ndim == 2:
        ref_packed = jnp.broadcast_to(ref_packed[None],
                                      (S,) + ref_packed.shape)
    tp = jnp.asarray(target_pos).reshape(-1, 3) if jnp.ndim(target_pos) > 1 \
        else jnp.broadcast_to(jnp.asarray(target_pos).reshape(1, 3), (S, 3))
    spd = jnp.broadcast_to(
        jnp.asarray(target_spd, tp.dtype).reshape(-1, 1), (S, 1)
    )
    task = jnp.concatenate(
        [tp, spd, jnp.zeros((S, 4), tp.dtype)], axis=1
    ).reshape(S, 1, BOX_WIDTH)

    grid = (Bs // bs_tile,)
    smap = (lambda i: (i, 0, 0)) if S > 1 else (lambda i: (0, 0, 0))

    def spec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            shape_prefix + (bs_tile, LANES),
            (lambda i, _nd=nd: (0,) * _nd + (i, 0)),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _trav_kernel, sm=sm, params=params, horizon=H, n_boxes=K,
        weights=weights, gait_weight=float(gait_weight),
        gait_vel_weight=float(gait_vel_weight), reward_type=reward_type,
        max_steps=int(max_steps),
    )
    cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, _REF_WIDTH), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BOX_WIDTH), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, BOX_WIDTH), smap, memory_space=pltpu.VMEM),
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
        task,
        boxes,
        state.base_pos,
        state.base_orn,
        state.base_lin_vel,
        state.base_ang_vel,
        state.joint_pos,
        state.joint_vel,
        controls,
    )
    return cost
