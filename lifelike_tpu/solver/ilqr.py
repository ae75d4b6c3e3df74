"""iLQR refinement: gradient-based polish of MPPI solutions.

Layer 8b of the hybrid trajectory optimizer (SURVEY.md section 7): after the
sampling layer finds a good basin, iterative LQR refines the control sequence
with dynamics linearizations (jax.jacfwd through the differentiable physics
step) and a Riccati backward sweep — the block-banded structure of the
horizon KKT system solved by backward/forward recursion rather than a dense
factorization.

State is flattened to 37 dims [pos 3, quat 4, lin vel 3, ang vel 3, q 12,
qd 12]; the quaternion stays on its chart (normalized inside the step), and
Levenberg-Marquardt regularization absorbs the unit-norm null direction.
The forward pass always rolls the TRUE nonlinear dynamics with a line search,
so the result is feasible by construction.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.costs import tracking
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import dynamics, engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.solver.rollout import ref_foot_positions

STATE_DIM = 37
ACT_DIM = 12


class ILQRConfig(NamedTuple):
    iterations: int = 3
    reg: float = 1e-3  # initial Levenberg-Marquardt regularization
    u_reg: float = 1e-3  # control effort weight
    line_search: tuple = (1.0, 0.5, 0.25, 0.1)
    # adaptive LM schedule (batched path): per-scenario reg shrinks on an
    # accepted step and grows on rejection, so stiff contact-dominated
    # linearizations fall back to small damped steps instead of stalling
    reg_down: float = 0.5
    reg_up: float = 10.0
    reg_min: float = 1e-4
    reg_max: float = 1e2
    # Linearization plant coarseness: 0 (default) = exact plant. Nonzero
    # builds the A/B Jacobians by jacfwd through a SURROGATE control step
    # integrating the same 20 ms in `lin_substeps` coarse substeps — a
    # substeps/lin_substeps cut in the dominant linearize() cost. MEASURED
    # FAILED for this plant (BENCH_LIN_SUBSTEPS on the chip): at dt >= 4 ms
    # the penalty-contact stiffness makes the surrogate's linearization
    # garbage (kn*dt^2 overshoot), the LM schedule rejects nearly every
    # proposed step, and the refinement's cost improvement collapses
    # 0.126 -> 0.012 at both lin_substeps=2 AND 5. Kept as a knob because
    # the true-dynamics line search makes any value SAFE (never
    # infeasible), just not useful here. Exact-plant latency is bought
    # down with iterations instead (see bench.py hybrid row).
    lin_substeps: int = 0


def flatten_state(s: RobotState):
    return jnp.concatenate(
        [s.base_pos, s.base_orn, s.base_lin_vel, s.base_ang_vel,
         s.joint_pos, s.joint_vel], axis=-1
    )


def unflatten_state(x):
    from lifelike_tpu.math import quat as quat_mod

    return RobotState(
        base_pos=x[..., 0:3],
        base_orn=quat_mod.normalize(x[..., 3:7]),
        base_lin_vel=x[..., 7:10],
        base_ang_vel=x[..., 10:13],
        joint_pos=x[..., 13:25],
        joint_vel=x[..., 25:37],
    )


def coarse_lin_params(params: engine.PhysicsParams, lin_substeps: int):
    """Surrogate plant for Jacobians: the same policy-step duration
    integrated in `lin_substeps` coarse substeps (see ILQRConfig.
    lin_substeps). Never used to roll dynamics forward — only under jacfwd."""
    total = params.dt * params.substeps
    return params._replace(dt=total / lin_substeps, substeps=lin_substeps)


def make_problem(model, params: engine.PhysicsParams, clips, clip_idx, t0,
                 weights=tracking.TrackingWeights(), u_reg=1e-3):
    """Returns (step_fn(x, u, t) -> x', cost_fn(x, u, t) -> scalar) on
    flattened states; u are deltas on the reference joint targets."""
    policy_dt = params.dt * params.substeps

    def step_fn(x, u, t):
        s = unflatten_state(x)
        ref = motion_lib.sample_frame(clips, clip_idx, t0 + t * policy_dt)
        s2 = engine.control_step(model, params, s, ref.joint_pos + u)
        return flatten_state(s2)

    def cost_fn(x, u, t):
        s = unflatten_state(x)
        t_next = t0 + (t + 1.0) * policy_dt
        ref = motion_lib.sample_frame(clips, clip_idx, t_next)
        kin = dynamics.forward_kinematics(model, s)
        ref_feet = ref_foot_positions(model, ref)
        c = tracking.tracking_cost(s, kin.p_foot, ref, ref_feet, weights)
        # smooth (C^2) surrogate of the MPPI rollout's hard fall penalty
        # (rollout_tl.tracking_cost_step adds +5 on fall_mask): keeps the
        # second-order refinement from polishing toward tipped poses the
        # sampling layer would have rejected. up_z < cos(60 deg) == pitch
        # fall in check_terminate (legged_robot.py:158-179).
        from lifelike_tpu.math import quat as quat_mod

        up_z = quat_mod.to_matrix(s.base_orn)[..., 2, 2]
        soft_fall = jax.nn.sigmoid((jnp.cos(jnp.pi / 3.0) - up_z) * 20.0)
        return c + u_reg * jnp.sum(u**2) + 5.0 * soft_fall

    return step_fn, cost_fn


def _rollout(step_fn, cost_fn, x0, us):
    def body(carry, inp):
        x, t = carry
        u = inp
        c = cost_fn(x, u, t)
        x2 = step_fn(x, u, t)
        return (x2, t + 1.0), (x, c)

    (xT, _), (xs, cs) = jax.lax.scan(body, (x0, jnp.asarray(0.0)), us)
    return xs, xT, jnp.sum(cs)


def ilqr_solve(step_fn, cost_fn, x0, u_init, cfg: ILQRConfig = ILQRConfig()):
    """Refine u_init (H, 12). Returns (u_opt, info dict).

    Each iteration: linearize along the trajectory, Riccati backward sweep
    for feedforward k and feedback K gains, then a line-searched nonlinear
    forward rollout; the candidate is kept only when the true cost improves.
    """
    u_init = u_init.astype(x0.dtype)  # mixed dtypes break the engine scans
    H = u_init.shape[0]

    fx_fn = jax.jacfwd(step_fn, argnums=0)
    fu_fn = jax.jacfwd(step_fn, argnums=1)
    cg_fn = jax.grad(cost_fn, argnums=(0, 1))
    # Gauss-Newton style quadratic model: full Hessians of the stage cost
    cxx_fn = jax.hessian(cost_fn, argnums=0)
    cuu_fn = jax.hessian(cost_fn, argnums=1)

    def one_iteration(carry, _):
        us, best_cost, reg = carry
        xs, xT, _ = _rollout(step_fn, cost_fn, x0, us)
        ts = jnp.arange(H, dtype=x0.dtype)

        A = jax.vmap(fx_fn)(xs, us, ts)  # (H, 37, 37)
        Bm = jax.vmap(fu_fn)(xs, us, ts)  # (H, 37, 12)
        cx, cu = jax.vmap(cg_fn)(xs, us, ts)
        Cxx = jax.vmap(cxx_fn)(xs, us, ts)
        Cuu = jax.vmap(cuu_fn)(xs, us, ts)

        eye_u = jnp.eye(ACT_DIM, dtype=x0.dtype)

        def backward(carry, inp):
            Vx, Vxx = carry
            At, Bt, cxt, cut, Cxxt, Cuut = inp
            Qx = cxt + At.T @ Vx
            Qu = cut + Bt.T @ Vx
            Qxx = Cxxt + At.T @ Vxx @ At
            Quu = Cuut + Bt.T @ Vxx @ Bt + reg * eye_u
            Qux = Bt.T @ Vxx @ At
            # symmetrize for stability
            Quu = 0.5 * (Quu + Quu.T)
            k = -jnp.linalg.solve(Quu, Qu)
            K = -jnp.linalg.solve(Quu, Qux)
            Vx2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
            return (Vx2, Vxx2), (k, K)

        VxT = jnp.zeros(STATE_DIM, x0.dtype)
        VxxT = jnp.zeros((STATE_DIM, STATE_DIM), x0.dtype)
        _, (ks, Ks) = jax.lax.scan(
            backward, (VxT, VxxT), (A, Bm, cx, cu, Cxx, Cuu), reverse=True
        )

        def try_alpha(alpha):
            def fwd(carry, inp):
                x, t = carry
                u_old, x_old, k, K = inp
                u = u_old + alpha * k + K @ (x - x_old)
                x2 = step_fn(x, u, t)
                return (x2, t + 1.0), u

            (_, _), us_new = jax.lax.scan(
                fwd, (x0, jnp.asarray(0.0, x0.dtype)), (us, xs, ks, Ks)
            )
            _, _, cost_new = _rollout(step_fn, cost_fn, x0, us_new)
            return us_new, cost_new

        cands = [try_alpha(a) for a in cfg.line_search]
        costs = jnp.stack([c for _, c in cands])
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)  # NaN-safe
        best = jnp.argmin(costs)
        us_best = jnp.stack([u for u, _ in cands])[best]
        cost_b = costs[best]
        improved = cost_b < best_cost
        us_out = jnp.where(improved, us_best, us)
        new_best = jnp.where(improved, cost_b, best_cost)
        # adaptive Levenberg-Marquardt (same schedule as ilqr_solve_batch)
        reg_next = jnp.clip(
            jnp.where(improved, reg * cfg.reg_down, reg * cfg.reg_up),
            cfg.reg_min, cfg.reg_max,
        )
        return (us_out, new_best, reg_next), new_best

    _, _, cost0 = _rollout(step_fn, cost_fn, x0, u_init)
    reg0 = jnp.asarray(cfg.reg, x0.dtype)
    (u_opt, final_cost, _), hist = jax.lax.scan(
        one_iteration, (u_init, cost0, reg0), None, length=cfg.iterations
    )
    return u_opt, {"initial_cost": cost0, "final_cost": final_cost,
                   "cost_history": hist}


def _soft_fall(s: RobotState):
    """C^2 surrogate of the rollouts' hard fall penalty: sigmoid on the body
    up-vector crossing cos(60 deg) (reference legged_robot.py:158-179)."""
    from lifelike_tpu.math import quat as quat_mod

    up_z = quat_mod.to_matrix(s.base_orn)[..., 2, 2]
    return jax.nn.sigmoid((jnp.cos(jnp.pi / 3.0) - up_z) * 20.0)


def make_traversal_problem(model, params: engine.PhysicsParams, scene,
                           target_pos, target_spd, q0,
                           weights=None, u_reg=1e-3):
    """EPMC smooth problem for iLQR: terrain traversal through box-scene
    contact (reference playground_env.py:479-539 joystick objective).

    scene: pruned scene.boxes.BoxScene (fixed for the solve); u are deltas
    on the initial joint pose q0 — the same convention as
    rollout_tasks.rollout_traversal, so MPPI candidates seed directly.
    """
    from lifelike_tpu.costs import traversal as trav

    weights = weights or trav.TraversalWeights()

    def step_fn(x, u, t):
        s = unflatten_state(x)
        s2 = engine.control_step(model, params, s, q0 + u, scene=scene)
        return flatten_state(s2)

    def cost_fn(x, u, t):
        s = unflatten_state(x)
        c = trav.joystick_cost(s, target_pos, target_spd, weights)
        c = c + weights.clearance * trav.clearance_cost(scene, s)
        return c + u_reg * jnp.sum(u**2) + 5.0 * _soft_fall(s)

    return step_fn, cost_fn


def make_chase_problem(model, params: engine.PhysicsParams, scene, opp_traj,
                       flag_pos, is_chaser, q0, weights=None, u_reg=1e-3):
    """SEPMC smooth problem for iLQR: one robot vs a fixed opponent plan
    (reference chase_tag_game_env.py:640-697 objectives; alternating best
    response supplies the coupling). opp_traj: (H, 3) opponent base path;
    is_chaser: static/traced bool — masked cost switch like rollout_chase.
    """
    from lifelike_tpu.costs import chase as chase_costs
    from lifelike_tpu.costs import traversal as trav

    weights = weights or chase_costs.ChaseWeights()

    def step_fn(x, u, t):
        s = unflatten_state(x)
        s2 = engine.control_step(model, params, s, q0 + u, scene=scene)
        return flatten_state(s2)

    def cost_fn(x, u, t):
        s = unflatten_state(x)
        ti = jnp.clip(t.astype(jnp.int32), 0, opp_traj.shape[0] - 1)
        opp_t = opp_traj[ti]
        role = jnp.asarray(is_chaser, x.dtype)
        c_ch = chase_costs.chaser_cost(s, opp_t, weights)
        c_es = chase_costs.escapee_cost(s, opp_t, flag_pos, 1.0, weights)
        c = role * c_ch + (1.0 - role) * c_es
        c = c + trav.posture_cost(s, weights)
        c = c + 0.5 * trav.clearance_cost(scene, s)
        return c + u_reg * jnp.sum(u**2) + 5.0 * _soft_fall(s)

    return step_fn, cost_fn


# ---------------------------------------------------------------------------
# Scenario-batched refinement: the MPPI->iLQR hybrid's polish stage. All S
# scenarios linearize / sweep / line-search together, the backward Riccati
# recursion running in VMEM (solver.riccati_pallas).
# ---------------------------------------------------------------------------


def linearize(step_fn, cost_fn, xs, us, lin_step_fn=None):
    """Jacobians and cost quadratics along batched trajectories.

    xs: (S, H, n) pre-step states, us: (S, H, m). Returns
    (A (S,H,n,n), B (S,H,n,m), cx, cu, Cxx, Cuu).

    lin_step_fn: optional cheaper surrogate plant for the A/B Jacobians
    (ILQRConfig.lin_substeps) — cost quadratics always come from the exact
    cost_fn, and the caller's line search rolls the TRUE step_fn."""
    H = us.shape[1]
    ts = jnp.arange(H, dtype=xs.dtype)
    jac_step = lin_step_fn or step_fn

    def at_point(x, u, t):
        return (
            jax.jacfwd(jac_step, argnums=0)(x, u, t),
            jax.jacfwd(jac_step, argnums=1)(x, u, t),
            jax.grad(cost_fn, argnums=0)(x, u, t),
            jax.grad(cost_fn, argnums=1)(x, u, t),
            jax.hessian(cost_fn, argnums=0)(x, u, t),
            jax.hessian(cost_fn, argnums=1)(x, u, t),
        )

    return jax.vmap(jax.vmap(at_point, in_axes=(0, 0, 0)),
                    in_axes=(0, 0, None))(xs, us, ts)


def ilqr_solve_batch(step_fn, cost_fn, x0, u_init,
                     cfg: ILQRConfig = ILQRConfig(), use_pallas=True,
                     lin_step_fn=None):
    """Refine S control sequences together. x0: (S, n), u_init: (S, H, m).

    Per iteration: batched linearization, one Riccati sweep over all
    scenarios (Pallas kernel; XLA oracle with use_pallas=False), then a
    line-searched nonlinear forward rollout per scenario — each scenario
    keeps its own best alpha, and keeps its old sequence if nothing improves.
    Returns (u_opt (S, H, m), {initial_cost, final_cost} each (S,))."""
    from lifelike_tpu.solver import riccati_pallas

    u_init = u_init.astype(x0.dtype)  # mixed dtypes break the engine scans
    S, H, _ = u_init.shape
    roll = jax.vmap(lambda x, u: _rollout(step_fn, cost_fn, x, u),
                    in_axes=(0, 0))
    sweep = (riccati_pallas.riccati_sweep if use_pallas
             else riccati_pallas.riccati_sweep_ref)

    def one_iteration(carry, _):
        us, xs, best_cost, reg_s = carry
        A, Bm, cx, cu, Cxx, Cuu = linearize(step_fn, cost_fn, xs, us,
                                            lin_step_fn)
        # fold the per-scenario LM damping into Cuu (reg only ever enters
        # the recursion through Quu = Cuu + B'VB + reg*I)
        m = Cuu.shape[-1]
        Cuu = Cuu + reg_s[:, None, None, None] * jnp.eye(m, dtype=Cuu.dtype)
        ks, Ks = sweep(A, Bm, cx, cu, Cxx, Cuu, reg=0.0)

        def fwd_one(alpha, x0_s, us_s, xs_s, ks_s, Ks_s):
            """Feedback rollout that ALSO records states and accumulates
            the true cost — one forward pass serves candidate generation,
            evaluation, and the next iteration's linearization states."""
            def fwd(carry, inp):
                x, t = carry
                u_old, x_old, k, K = inp
                u = u_old + alpha * k + K @ (x - x_old)
                c = cost_fn(x, u, t)
                return (step_fn(x, u, t), t + 1.0), (u, x, c)

            (_, _), (us_new, xs_new, cs) = jax.lax.scan(
                fwd, (x0_s, jnp.zeros((), x0.dtype)), (us_s, xs_s, ks_s, Ks_s)
            )
            return us_new, xs_new, jnp.sum(cs)

        # all line-search alphas ride ONE batched rollout (sequential depth
        # is the latency wall at S ~ 8; alpha-stacking quarters the number
        # of 500-substep-deep scans per iteration, and in-rollout cost/state
        # recording removes the separate scoring and linearization-state
        # rollouts entirely)
        alphas = jnp.asarray(cfg.line_search, x0.dtype)

        def try_alpha(alpha):
            return jax.vmap(fwd_one, in_axes=(None, 0, 0, 0, 0, 0))(
                alpha, x0, us, xs, ks, Ks
            )

        us_stack, xs_stack, costs = jax.vmap(try_alpha)(alphas)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)  # (n_alpha, S)
        best = jnp.argmin(costs, axis=0)  # (S,)
        us_best = jnp.take_along_axis(
            us_stack, best[None, :, None, None], axis=0
        )[0]
        xs_best = jnp.take_along_axis(
            xs_stack, best[None, :, None, None], axis=0
        )[0]
        cost_b = jnp.take_along_axis(costs, best[None, :], axis=0)[0]
        improved = cost_b < best_cost  # (S,)
        us_out = jnp.where(improved[:, None, None], us_best, us)
        xs_out = jnp.where(improved[:, None, None], xs_best, xs)
        new_best = jnp.where(improved, cost_b, best_cost)
        reg_next = jnp.clip(
            jnp.where(improved, reg_s * cfg.reg_down, reg_s * cfg.reg_up),
            cfg.reg_min, cfg.reg_max,
        )
        return (us_out, xs_out, new_best, reg_next), None

    xs0, _, cost0 = roll(x0, u_init)
    reg0 = jnp.full((S,), cfg.reg, x0.dtype)
    (u_opt, _, final_cost, _), _ = jax.lax.scan(
        one_iteration, (u_init, xs0, cost0, reg0), None,
        length=cfg.iterations
    )
    return u_opt, {"initial_cost": cost0, "final_cost": final_cost}
