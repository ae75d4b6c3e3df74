"""MPC controllers for the EPMC (terrain traversal) and SEPMC (Chase Tag)
tasks: receding-horizon MPPI over the tile-layout rollouts of rollout_tasks.

These are the trajectory-optimization counterparts of the reference's
learned EPMC/SEPMC policies: the same tasks — traverse randomized obstacle
courses toward a joystick/course target (reference
max_game_elements/playground_env.py), or play two-robot Chase Tag in the V4
arena (reference max_game/chase_tag_game_env.py:640-697) — solved online by
sampling-based optimization over the batched on-device dynamics instead of a
policy network. The Chase-Tag solver couples the two robots by ALTERNATING
BEST RESPONSE: each robot optimizes against the opponent's current plan
trajectory, re-rolled (hoisted once per solve) between turns.
"""
import jax
import jax.numpy as jnp

from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine_tl
from lifelike_tpu.scene import boxes
from lifelike_tpu.solver import mppi_tl, rollout_tasks
from lifelike_tpu.solver.mppi import MPPIConfig

# Nearest-box prune for playground scenes (capacity 48). k=8 is measured
# LOSSLESS for receding-horizon solves on all three elements — corridor-
# ranked boxes 9..16 never touch an H-step rollout at the reference
# obstacle spacings (tests/test_contact_prune.py) — and halves the
# dominant K-vectorized box-contact work (EPMC fused solve 16.6 -> 8.6 ms,
# tools/epmc_sweep.py).
CONTACT_K = 8


def _tl_single(robot_state):
    """Unbatched RobotState -> TLState with batch (1, 1)."""
    return B.tl_from_state(jax.tree.map(lambda x: x[None], robot_state))


def make_traversal_controller(model, c, params, cfg: MPPIConfig,
                              reward_type="joystick", max_steps=1000,
                              contact_k=CONTACT_K):
    """Jitted EPMC MPC: f(key, robot_state, scene, target_pos, target_spd,
    u_warm (H,4,3)) -> (target_q_exec (12,), u_warm', diag).

    The executed control is an absolute joint target (initial pose + delta);
    envs.playground consumes `target_q_exec - robot.joint_pos` as A_LLC.
    """

    @jax.jit
    def controller(key, robot_state, scene, target_pos, target_spd, u_warm):
        # prune along the reachable corridor, not the current position: at
        # target speeds up to 3 m/s the H-step rollout travels past boxes
        # that are nearest NOW, so rank by distance to the segment
        # [pos, pos + min(dist_to_target, spd*H*dt) * dir].
        p0 = robot_state.base_pos
        to_tgt = target_pos[:2] - p0[:2]
        d_tgt = jnp.linalg.norm(to_tgt) + 1e-9
        policy_dt = params.dt * params.substeps
        reach = jnp.minimum(d_tgt, target_spd * cfg.horizon * policy_dt)
        p1 = p0.at[:2].add(to_tgt / d_tgt * reach)
        sub = boxes.nearest_boxes_corridor(scene, p0, p1, contact_k)
        ts = engine_tl.tl_scene(sub)
        tl = _tl_single(robot_state)

        def rollout_fn(state_k, u_cand):
            cost, _ = rollout_tasks.rollout_traversal(
                c, params, state_k, u_cand, ts, target_pos, target_spd,
                reward_type, max_steps,
            )
            return cost

        u_opt, diag = mppi_tl.mppi_step(
            c, params, cfg, key, tl, u_warm, ref=None, rollout_fn=rollout_fn
        )
        q0 = robot_state.joint_pos.reshape(4, 3)
        u_exec = (q0 + u_opt[0]).reshape(12)
        u_next = jnp.concatenate([u_opt[1:], u_opt[-1:]], axis=0)
        return u_exec, u_next, diag

    return controller


def make_gait_traversal_controller(model, c, params, cfg: MPPIConfig, clips,
                                   reward_type="joystick", max_steps=1000,
                                   contact_k=CONTACT_K, clip_idx=0,
                                   gait_weight=1.0, fused=False):
    """EPMC MPC with a mocap gait prior (the solver-side LLC/MLC split —
    see rollout_tasks.rollout_traversal_gait).

    f(key, robot_state, scene, target_pos, target_spd, t_clip, u_warm)
    -> (target_q_exec (12,), u_warm', diag). The caller advances t_clip by
    policy_dt per control step (looping inside the clip's walk section), so
    the gait phase persists across replans exactly like the PMC tracking
    controller's clip time.

    fused=True routes the candidate rollouts through the single-kernel
    Pallas path (ops.traversal_pallas: box contact + traversal cost resident
    in VMEM; population % 128 == 0)."""
    from lifelike_tpu.solver import rollout_tl

    policy_dt = params.dt * params.substeps
    if fused:
        assert cfg.population % 128 == 0, cfg.population
        from lifelike_tpu.ops import scalar_phys, traversal_pallas

        sm = scalar_phys.build_scalar_model(model)

    @jax.jit
    def controller(key, robot_state, scene, target_pos, target_spd, t_clip,
                   u_warm):
        p0 = robot_state.base_pos
        to_tgt = target_pos[:2] - p0[:2]
        d_tgt = jnp.linalg.norm(to_tgt) + 1e-9
        reach = jnp.minimum(d_tgt, target_spd * cfg.horizon * policy_dt)
        p1 = p0.at[:2].add(to_tgt / d_tgt * reach)
        sub = boxes.nearest_boxes_corridor(scene, p0, p1, contact_k)
        ts = engine_tl.tl_scene(sub)
        tl = _tl_single(robot_state)
        ref = rollout_tl.precompute_reference(
            model, clips, jnp.asarray(clip_idx), t_clip, cfg.horizon,
            policy_dt,
        )

        if fused:
            btab = traversal_pallas.pack_boxes(sub)

            def rollout_fn(state_k, u_cand):
                return traversal_pallas.rollout_traversal_fused(
                    sm, params, state_k, u_cand, btab, ref, target_pos,
                    target_spd, reward_type, max_steps,
                    gait_weight=gait_weight,
                )
        else:
            def rollout_fn(state_k, u_cand):
                cost, _ = rollout_tasks.rollout_traversal_gait(
                    c, params, state_k, u_cand, ts, ref, target_pos,
                    target_spd, reward_type, max_steps,
                    gait_weight=gait_weight,
                )
                return cost

        u_opt, diag = mppi_tl.mppi_step(
            c, params, cfg, key, tl, u_warm, ref=None, rollout_fn=rollout_fn
        )
        u_exec = (ref.target_joint[0, ..., 0, 0] + u_opt[0]).reshape(12)
        u_next = jnp.concatenate([u_opt[1:], u_opt[-1:]], axis=0)
        return u_exec, u_next, diag

    return controller


def make_multigait_traversal_controller(model, c, params, cfg: MPPIConfig,
                                        clips, priors,
                                        reward_type="joystick",
                                        max_steps=1000, contact_k=CONTACT_K,
                                        gait_weight=1.0, fused=False):
    """Traversal MPC with a BANK of gait priors (e.g. walk loop + jump):
    one MPPI solve per prior each replan, the cheapest weighted plan wins.

    The reference reaches the same capability through the EPMC's codebook —
    discrete skill indices into the mocap-prior decoder select jump-like
    codes at obstacles (epmc_net.py:166-174, clips mined for jump events by
    utils/obstacle.py). Here the skill bank is explicit clip sections.

    priors: list of tuples whose first element is the clip index; an
    optional second element is a per-prior TraversalWeights (e.g. a crouch
    prior must relax the stand-height hinge — and set crawl_gap — or the
    posture/clearance costs veto the very crawl it exists for); an optional
    third element is a per-prior speed scale on target_spd (a crouch crawl
    plans at a fraction of the commanded speed). Loop bookkeeping stays
    host-side.

    f(key, robot_state, scene, target_pos, target_spd, t_clips (P,),
    u_warms (P, H, 4, 3), force_sel (int32, -1 = pick by cost)) ->
    (u_exec (12,), u_warms', sel (int), diag). force_sel implements
    per-obstacle skill GATING: the eval loop detects an upcoming crawlable
    bar / cube face from the scene geometry and pins the matching prior,
    the solver-side counterpart of the EPMC codebook selecting jump-like
    skill codes at obstacles (epmc_net.py:166-174) — cost comparison across
    priors with different weight tuples is not apples-to-apples.
    """
    from lifelike_tpu.costs.traversal import TraversalWeights
    from lifelike_tpu.solver import rollout_tl

    policy_dt = params.dt * params.substeps
    clip_ids = [int(p[0]) for p in priors]
    prior_weights = [
        (p[1] if len(p) > 1 and p[1] is not None else TraversalWeights())
        for p in priors
    ]
    spd_scales = [
        (float(p[2]) if len(p) > 2 and p[2] is not None else 1.0)
        for p in priors
    ]
    # optional 4th element: per-prior gait weight (a crouch prior wants a
    # weaker pull toward the clip so the progress terms can win near bars)
    gait_weights = [
        (float(p[3]) if len(p) > 3 and p[3] is not None else gait_weight)
        for p in priors
    ]
    if fused:
        assert cfg.population % 128 == 0, cfg.population
        from lifelike_tpu.ops import scalar_phys, traversal_pallas

        sm = scalar_phys.build_scalar_model(model)

    @jax.jit
    def controller(key, robot_state, scene, target_pos, target_spd, t_clips,
                   u_warms, force_sel=-1):
        p0 = robot_state.base_pos
        to_tgt = target_pos[:2] - p0[:2]
        d_tgt = jnp.linalg.norm(to_tgt) + 1e-9
        reach = jnp.minimum(d_tgt, target_spd * cfg.horizon * policy_dt)
        p1 = p0.at[:2].add(to_tgt / d_tgt * reach)
        sub = boxes.nearest_boxes_corridor(scene, p0, p1, contact_k)
        ts = engine_tl.tl_scene(sub)
        tl = _tl_single(robot_state)

        if fused:
            btab = traversal_pallas.pack_boxes(sub)
        u_execs, u_nexts, costs = [], [], []
        for pi, cid in enumerate(clip_ids):
            ref = rollout_tl.precompute_reference(
                model, clips, jnp.asarray(cid), t_clips[pi], cfg.horizon,
                policy_dt,
            )

            if fused:
                def rollout_fn(state_k, u_cand, ref=ref,
                               w=prior_weights[pi], ss=spd_scales[pi],
                               gw=gait_weights[pi]):
                    return traversal_pallas.rollout_traversal_fused(
                        sm, params, state_k, u_cand, btab, ref, target_pos,
                        target_spd * ss, reward_type, max_steps, weights=w,
                        gait_weight=gw,
                    )
            else:
                def rollout_fn(state_k, u_cand, ref=ref,
                               w=prior_weights[pi], ss=spd_scales[pi],
                               gw=gait_weights[pi]):
                    cost, _ = rollout_tasks.rollout_traversal_gait(
                        c, params, state_k, u_cand, ts, ref, target_pos,
                        target_spd * ss, reward_type, max_steps, weights=w,
                        gait_weight=gw,
                    )
                    return cost

            key, k = jax.random.split(key)
            u_opt, diag = mppi_tl.mppi_step(
                c, params, cfg, k, tl, u_warms[pi], ref=None,
                rollout_fn=rollout_fn,
            )
            u_execs.append((ref.target_joint[0, ..., 0, 0] + u_opt[0])
                           .reshape(12))
            u_nexts.append(jnp.concatenate([u_opt[1:], u_opt[-1:]], axis=0))
            costs.append(diag["weighted_cost"])

        costs = jnp.stack(costs)
        fs = jnp.asarray(force_sel, jnp.int32)
        sel = jnp.where(fs >= 0, fs, jnp.argmin(costs).astype(jnp.int32))
        u_exec = jnp.stack(u_execs)[sel]
        return u_exec, jnp.stack(u_nexts), sel, {"prior_costs": costs}

    return controller


def make_gait_chase_solver(model, c, params, cfg: MPPIConfig, clips,
                           n_best_response=2, clip_idx=0, gait_weight=1.0,
                           fused=False):
    """Chase solver with the walk-gait prior for BOTH robots (see
    make_gait_traversal_controller). f(key, robots, scene, flag_pos,
    with_flag, t_clip, u_warm (2,H,4,3)) -> (target_q_exec (2,12),
    u_warm', diag). fused=True runs the candidate rollouts through the
    single-kernel Pallas chase path (ops.traversal_pallas.
    rollout_chase_fused; population % 128 == 0)."""
    from lifelike_tpu.solver import rollout_tl

    policy_dt = params.dt * params.substeps
    if fused:
        assert cfg.population % 128 == 0, cfg.population
        from lifelike_tpu.ops import scalar_phys, traversal_pallas

        sm = scalar_phys.build_scalar_model(model)

    @jax.jit
    def solve(key, robots, scene, flag_pos, with_flag, t_clip, u_warm):
        ts = engine_tl.tl_scene(scene)
        ref = rollout_tl.precompute_reference(
            model, clips, jnp.asarray(clip_idx), t_clip, cfg.horizon,
            policy_dt,
        )
        if fused:
            btab = traversal_pallas.pack_boxes(scene)
        states = [
            _tl_single(jax.tree.map(lambda x, i=i: x[i], robots))
            for i in (0, 1)
        ]
        u = [u_warm[0], u_warm[1]]
        diag = {}
        for _ in range(n_best_response):
            for i in (0, 1):
                j = 1 - i
                if fused:
                    opp_traj = traversal_pallas.rollout_plan_fused(
                        sm, params, states[j], u[j], btab, ref
                    )
                else:
                    opp_traj = rollout_tasks.rollout_plan_gait(
                        c, params, states[j], u[j], ts, ref
                    )

                if fused:
                    def rollout_fn(state_k, u_cand, opp=opp_traj,
                                   role=with_flag[i]):
                        return traversal_pallas.rollout_chase_fused(
                            sm, params, state_k, u_cand, btab, ref, opp,
                            flag_pos, role, gait_weight=gait_weight,
                        )
                else:
                    def rollout_fn(state_k, u_cand, opp=opp_traj,
                                   role=with_flag[i]):
                        cost, _ = rollout_tasks.rollout_chase_gait(
                            c, params, state_k, u_cand, ts, ref, opp,
                            flag_pos, role, gait_weight=gait_weight,
                        )
                        return cost

                key, k = jax.random.split(key)
                u[i], diag = mppi_tl.mppi_step(
                    c, params, cfg, k, states[i], u[i], ref=None,
                    rollout_fn=rollout_fn,
                )

        tj0 = ref.target_joint[0, ..., 0, 0]  # (4, 3)
        u_exec = jnp.stack([(tj0 + u[i][0]).reshape(12) for i in (0, 1)])
        u_next = jnp.stack([
            jnp.concatenate([u[i][1:], u[i][-1:]], axis=0) for i in (0, 1)
        ])
        return u_exec, u_next, diag

    return solve


def make_chase_solver(model, c, params, cfg: MPPIConfig, n_best_response=2):
    """Jitted SEPMC MPC for BOTH robots by alternating best response.

    f(key, robots (RobotState, agent axis 2 leading), scene, flag_pos,
    with_flag (2,) bool, u_warm (2, H, 4, 3)) ->
    (target_q_exec (2, 12), u_warm' (2, H, 4, 3), diag).

    with_flag[i] True = robot i is the chaser (reference
    chase_tag_game_env.py:640-652 role convention). Arena scenes are small
    (capacity 12), so no contact pruning is applied.
    """

    @jax.jit
    def solve(key, robots, scene, flag_pos, with_flag, u_warm):
        ts = engine_tl.tl_scene(scene)
        states = [
            _tl_single(jax.tree.map(lambda x, i=i: x[i], robots))
            for i in (0, 1)
        ]
        u = [u_warm[0], u_warm[1]]
        diag = {}
        for _ in range(n_best_response):
            for i in (0, 1):
                j = 1 - i
                opp_traj = rollout_tasks.rollout_plan(
                    c, params, states[j], u[j], ts
                )

                def rollout_fn(state_k, u_cand, opp=opp_traj, role=with_flag[i]):
                    cost, _ = rollout_tasks.rollout_chase(
                        c, params, state_k, u_cand, ts, opp, flag_pos, role
                    )
                    return cost

                key, k = jax.random.split(key)
                u[i], diag = mppi_tl.mppi_step(
                    c, params, cfg, k, states[i], u[i], ref=None,
                    rollout_fn=rollout_fn,
                )

        q0 = robots.joint_pos.reshape(2, 4, 3)
        u_exec = jnp.stack([
            (q0[i] + u[i][0]).reshape(12) for i in (0, 1)
        ])
        u_next = jnp.stack([
            jnp.concatenate([u[i][1:], u[i][-1:]], axis=0) for i in (0, 1)
        ])
        return u_exec, u_next, diag

    return solve
