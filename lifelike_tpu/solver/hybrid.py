"""Hybrid trajectory optimizer: MPPI exploration + iLQR polish, fused.

The sampling layer (mppi_tl, tile-layout population) finds the basin; the
refinement layer (ilqr.ilqr_solve_batch + the Pallas Riccati sweep) polishes
the weighted solution AND the top raw candidates as one batched second-order
solve, then the cheapest refined sequence wins. This is the "sampling+SQP
hybrid" named in BASELINE.json's north_star — the two halves the round-1
verdict found unconnected, now one controller.

Cost accounting: all refined candidates are compared under the SAME smooth
cost (ilqr.make_problem's tracking cost + control regularization), and iLQR
keeps a scenario's old sequence whenever no line-search step improves it —
so the hybrid can only match or beat its MPPI seed under that cost.

The reference repo has no counterpart (policies come from PPO; no planner);
this layer exists for the BASELINE north-star targets.
"""
import jax
import jax.numpy as jnp

from lifelike_tpu.physics import batched as B
from lifelike_tpu.solver import ilqr, mppi_tl, rollout_tl
from lifelike_tpu.solver.ilqr import ILQRConfig
from lifelike_tpu.solver.mppi import MPPIConfig


def refine_with_problem(step_fn, cost_fn, robot_state, us, icfg: ILQRConfig,
                        use_pallas=True, lin_step_fn=None):
    """Batched iLQR polish of S candidate sequences from one state, under an
    arbitrary (step_fn, cost_fn) problem (tracking / traversal / chase).

    robot_state: unbatched RobotState; us: (S, H, 12) joint-target deltas.
    lin_step_fn: optional coarse surrogate plant for the A/B Jacobians
    (ILQRConfig.lin_substeps). Returns (u_best (H, 12), cost_best, info
    with initial_cost/final_cost (S,) arrays)."""
    S = us.shape[0]
    x0 = jnp.broadcast_to(ilqr.flatten_state(robot_state), (S, ilqr.STATE_DIM))
    u_ref, info = ilqr.ilqr_solve_batch(step_fn, cost_fn, x0, us, icfg,
                                        use_pallas=use_pallas,
                                        lin_step_fn=lin_step_fn)
    best = jnp.argmin(info["final_cost"])
    return u_ref[best], info["final_cost"][best], info


def _lin_params(params, icfg: ILQRConfig):
    """Coarse-linearization plant when ILQRConfig asks for one."""
    if icfg.lin_substeps and icfg.lin_substeps < params.substeps:
        return ilqr.coarse_lin_params(params, icfg.lin_substeps)
    return None


def refine_candidates(model, params, clips, clip_idx, t0, robot_state, us,
                      icfg: ILQRConfig, use_pallas=True):
    """PMC tracking refinement (see refine_with_problem)."""
    step_fn, cost_fn = ilqr.make_problem(model, params, clips, clip_idx, t0)
    lp = _lin_params(params, icfg)
    lin_step_fn = (
        ilqr.make_problem(model, lp, clips, clip_idx, t0)[0] if lp else None
    )
    return refine_with_problem(step_fn, cost_fn, robot_state, us, icfg,
                               use_pallas=use_pallas, lin_step_fn=lin_step_fn)


def make_hybrid_controller(model, c, params, clips, cfg: MPPIConfig,
                           icfg: ILQRConfig = ILQRConfig(iterations=2),
                           n_refine=7, fused=False, use_pallas=True):
    """Receding-horizon hybrid controller.

    Same interface as mppi_tl.make_mpc_controller: returns
    f(key, robot_state, clip_idx, t, u_warm (H,4,3)) ->
    (u_exec (12,), u_warm', diag). Refines {MPPI weighted u} ∪ {top n_refine
    raw candidates} (S = n_refine + 1 scenarios) through batched iLQR.
    """
    policy_dt = params.dt * params.substeps
    if fused:
        assert cfg.population % 128 == 0, cfg.population
        from lifelike_tpu.ops import rollout_pallas, scalar_phys

        sm = scalar_phys.build_scalar_model(model)

    @jax.jit
    def controller(key, robot_state, clip_idx, t, u_warm):
        ref = rollout_tl.precompute_reference(
            model, clips, clip_idx, t, cfg.horizon, policy_dt
        )
        tl = B.tl_from_state(jax.tree.map(lambda x: x[None], robot_state))
        rollout_fn = None
        if fused:
            rollout_fn = lambda sk, uc: rollout_pallas.rollout_tracking_fused(
                sm, params, sk, uc, ref
            )
        u_opt, diag = mppi_tl.mppi_step(
            c, params, cfg, key, tl, u_warm, ref,
            rollout_fn=rollout_fn, return_topk=n_refine,
        )
        us = jnp.concatenate(
            [u_opt[None], diag.pop("u_topk")], axis=0
        ).reshape(n_refine + 1, cfg.horizon, 12)
        u_best, cost_best, info = refine_candidates(
            model, params, clips, clip_idx, t, robot_state, us, icfg,
            use_pallas=use_pallas,
        )
        u_best = u_best.reshape(cfg.horizon, 4, 3)
        diag["refined_cost"] = cost_best
        diag["refined_costs"] = info["final_cost"]
        diag["seed_costs"] = info["initial_cost"]
        u_exec = (ref.target_joint[0, ..., 0, 0] + u_best[0]).reshape(12)
        u_next = jnp.concatenate([u_best[1:], u_best[-1:]], axis=0)
        return u_exec, u_next, diag

    return controller


def make_hybrid_traversal_controller(model, c, params, cfg: MPPIConfig,
                                     icfg: ILQRConfig = ILQRConfig(iterations=2),
                                     n_refine=7, reward_type="joystick",
                                     contact_k=None, use_pallas=True):
    """EPMC hybrid MPC: MPPI over the hurdle/hole/cube scene, then batched
    iLQR under the smooth traversal cost (ilqr.make_traversal_problem).

    Same interface as mpc_tasks.make_traversal_controller:
    f(key, robot_state, scene, target_pos, target_spd, u_warm (H,4,3)) ->
    (target_q_exec (12,), u_warm', diag with refined/seed costs).
    """
    from lifelike_tpu.scene import boxes
    from lifelike_tpu.solver import mpc_tasks

    contact_k = contact_k or mpc_tasks.CONTACT_K

    @jax.jit
    def controller(key, robot_state, scene, target_pos, target_spd, u_warm):
        # sampling stage mirrors make_traversal_controller (same corridor
        # pruning) but keeps the raw top-k candidates for refinement.
        from lifelike_tpu.physics import engine_tl
        from lifelike_tpu.solver import rollout_tasks

        p0 = robot_state.base_pos
        to_tgt = target_pos[:2] - p0[:2]
        d_tgt = jnp.linalg.norm(to_tgt) + 1e-9
        policy_dt = params.dt * params.substeps
        reach = jnp.minimum(d_tgt, target_spd * cfg.horizon * policy_dt)
        p1 = p0.at[:2].add(to_tgt / d_tgt * reach)
        sub = boxes.nearest_boxes_corridor(scene, p0, p1, contact_k)
        ts = engine_tl.tl_scene(sub)
        tl = B.tl_from_state(jax.tree.map(lambda x: x[None], robot_state))

        def rollout_fn(state_k, u_cand):
            cost, _ = rollout_tasks.rollout_traversal(
                c, params, state_k, u_cand, ts, target_pos, target_spd,
                reward_type,
            )
            return cost

        u_opt, diag = mppi_tl.mppi_step(
            c, params, cfg, key, tl, u_warm, ref=None,
            rollout_fn=rollout_fn, return_topk=n_refine,
        )
        us = jnp.concatenate(
            [u_opt[None], diag.pop("u_topk")], axis=0
        ).reshape(n_refine + 1, cfg.horizon, 12)

        step_fn, cost_fn = ilqr.make_traversal_problem(
            model, params, sub, target_pos, target_spd, robot_state.joint_pos
        )
        lp = _lin_params(params, icfg)
        lin_step_fn = ilqr.make_traversal_problem(
            model, lp, sub, target_pos, target_spd, robot_state.joint_pos
        )[0] if lp else None
        u_best, cost_best, info = refine_with_problem(
            step_fn, cost_fn, robot_state, us, icfg, use_pallas=use_pallas,
            lin_step_fn=lin_step_fn,
        )
        u_best = u_best.reshape(cfg.horizon, 4, 3)
        diag["refined_cost"] = cost_best
        diag["refined_costs"] = info["final_cost"]
        diag["seed_costs"] = info["initial_cost"]
        q0 = robot_state.joint_pos.reshape(4, 3)
        u_exec = (q0 + u_best[0]).reshape(12)
        u_next = jnp.concatenate([u_best[1:], u_best[-1:]], axis=0)
        return u_exec, u_next, diag

    return controller


def make_hybrid_chase_solver(model, c, params, cfg: MPPIConfig,
                             icfg: ILQRConfig = ILQRConfig(iterations=2),
                             n_refine=3, n_best_response=1, use_pallas=True):
    """SEPMC hybrid: each robot's best-response MPPI solve is polished by
    batched iLQR under the smooth chase cost (ilqr.make_chase_problem),
    against the opponent's CURRENT plan trajectory.

    Interface mirrors mpc_tasks.make_chase_solver. with_flag[i] True = robot
    i chases (reference chase_tag_game_env.py:640-652)."""
    from lifelike_tpu.physics import engine_tl
    from lifelike_tpu.solver import mpc_tasks, rollout_tasks

    @jax.jit
    def solve(key, robots, scene, flag_pos, with_flag, u_warm):
        ts = engine_tl.tl_scene(scene)
        states = [
            mpc_tasks._tl_single(jax.tree.map(lambda x, i=i: x[i], robots))
            for i in (0, 1)
        ]
        rss = [jax.tree.map(lambda x, i=i: x[i], robots) for i in (0, 1)]
        u = [u_warm[0], u_warm[1]]
        diag = {}
        for _ in range(n_best_response):
            for i in (0, 1):
                j = 1 - i
                opp_traj = rollout_tasks.rollout_plan(
                    c, params, states[j], u[j], ts
                )

                def rollout_fn(state_k, u_cand, opp=opp_traj,
                               role=with_flag[i]):
                    cost, _ = rollout_tasks.rollout_chase(
                        c, params, state_k, u_cand, ts, opp, flag_pos, role
                    )
                    return cost

                key, k = jax.random.split(key)
                u_opt, d = mppi_tl.mppi_step(
                    c, params, cfg, k, states[i], u[i], ref=None,
                    rollout_fn=rollout_fn, return_topk=n_refine,
                )
                us = jnp.concatenate(
                    [u_opt[None], d.pop("u_topk")], axis=0
                ).reshape(n_refine + 1, cfg.horizon, 12)
                step_fn, cost_fn = ilqr.make_chase_problem(
                    model, params, scene, opp_traj[:, :, 0, 0], flag_pos,
                    with_flag[i], rss[i].joint_pos,
                )
                lp = _lin_params(params, icfg)
                lin_step_fn = ilqr.make_chase_problem(
                    model, lp, scene, opp_traj[:, :, 0, 0], flag_pos,
                    with_flag[i], rss[i].joint_pos,
                )[0] if lp else None
                u_best, cost_best, info = refine_with_problem(
                    step_fn, cost_fn, rss[i], us, icfg,
                    use_pallas=use_pallas, lin_step_fn=lin_step_fn,
                )
                u[i] = u_best.reshape(cfg.horizon, 4, 3)
                diag.update({f"{k_}_{i}": v_ for k_, v_ in d.items()})
                diag[f"refined_cost_{i}"] = cost_best
                diag[f"seed_cost_{i}"] = info["initial_cost"][0]

        q0 = robots.joint_pos.reshape(2, 4, 3)
        u_exec = jnp.stack([
            (q0[i] + u[i][0]).reshape(12) for i in (0, 1)
        ])
        u_next = jnp.stack([
            jnp.concatenate([u[i][1:], u[i][-1:]], axis=0) for i in (0, 1)
        ])
        return u_exec, u_next, diag

    return solve
