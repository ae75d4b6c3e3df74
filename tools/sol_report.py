#!/usr/bin/env python
"""Roofline (speed-of-light) report for the fused MPC rollout kernel.

Compiles the bench-shaped solve, asks XLA for its FLOP/byte cost, measures
honest chained latency (RTT excluded, same method as bench.py), and prints
the achieved fraction of the chip's speed of light via utils.profiling.

  python tools/sol_report.py            # real TPU (slow remote compile)
  SOL_POP=512 SOL_HORIZON=10 python tools/sol_report.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    pop = int(os.environ.get("SOL_POP", 4096))
    horizon = int(os.environ.get("SOL_HORIZON", 50))
    substeps = int(os.environ.get("SOL_SUBSTEPS", 10))

    from lifelike_tpu.motion import motion_lib
    from lifelike_tpu.ops import rollout_pallas, scalar_phys
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.physics import engine
    from lifelike_tpu.physics.dynamics import RobotState
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.solver import mppi, mppi_tl, rollout_tl
    from lifelike_tpu.utils import profiling as P

    model = build_max_model()
    clips = motion_lib.pack_clips(
        [motion_lib.make_synthetic_clip(int(120 * (horizon / 50.0 + 3)))],
        frame_step=1.0 / 120.0,
    )
    params = engine.PhysicsParams(substeps=substeps, mass_freeze=substeps)
    cfg = mppi.MPPIConfig(horizon=horizon, population=pop, iterations=1)
    c = B.tl_constants(model, dtype=jnp.float32)
    sm = scalar_phys.build_scalar_model(model)
    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    state = RobotState(
        base_pos=jnp.asarray([0.0, 0.0, 0.33], jnp.float32),
        base_orn=jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32),
        base_lin_vel=jnp.zeros(3, jnp.float32),
        base_ang_vel=jnp.zeros(3, jnp.float32),
        joint_pos=stand,
        joint_vel=jnp.zeros(12, jnp.float32),
    )
    tl = B.tl_from_state(jax.tree.map(lambda x: x[None], state))
    policy_dt = params.dt * params.substeps
    u0 = jnp.zeros((horizon, 4, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    def solve(key, u):
        ref = rollout_tl.precompute_reference(
            model, clips, jnp.asarray(0), jnp.asarray(0.0, jnp.float32),
            horizon, policy_dt,
        )
        u_opt, _ = mppi_tl.mppi_step(
            c, params, cfg, key, tl, u, ref,
            rollout_fn=lambda sk, uc: rollout_pallas.rollout_tracking_fused(
                sm, params, sk, uc, ref
            ),
        )
        return u_opt

    ca = P.cost_analysis(solve, key, u0)
    dt = P.chained_latency(
        lambda s: (jax.random.fold_in(s[0], 1), solve(*s)), (key, u0),
        m_lo=2, m_hi=6, reps=2,
    )
    r = P.speed_of_light(
        flops=float(ca.get("flops", 0.0)),
        bytes_accessed=float(ca.get("bytes accessed", 0.0)),
        measured_s=dt,
    )
    print(f"solve pop={pop} H={horizon} sub={substeps}")
    print("-- XLA cost-analysis roofline (UNDERCOUNTS the Pallas kernel: a")
    print("   custom call reports ~0 FLOPs, so 'memory-bound' below refers")
    print("   to the XLA-visible ops only) --")
    print(P.format_report(r))
    subs = pop * horizon * substeps
    print(f"{subs / dt / 1e6:.0f} M physics substeps/s")

    # -- honest VPU arithmetic model: count the kernel's per-lane scalar
    # ops by tracing one control step of ops.scalar_phys (what the kernel
    # actually executes per lane per control step) --
    flops_lane = _lane_flops_per_control_step(sm, params)
    kernel_flops = flops_lane * pop * horizon
    spec = P.detect_chip()
    # the physics is pure VPU elementwise work (no matmuls -> MXU idle):
    # the honest roofline is the VPU's elementwise throughput, not the
    # chip's matmul peak
    print("-- VPU arithmetic model (hand-counted from the scalar physics) --")
    print(f"   {flops_lane:,} scalar ops/lane/control-step; "
          f"{kernel_flops / 1e9:.1f} GFLOP per solve")
    print(f"   achieved {kernel_flops / dt / 1e12:.2f} TFLOP/s over "
          f"{dt * 1e3:.2f} ms on {spec.name}")
    print(f"   = {kernel_flops / dt / spec.vpu_flops:.1%} of the ~"
          f"{spec.vpu_flops / 1e12:.1f} TFLOP/s VPU elementwise peak "
          f"(vs {kernel_flops / dt / spec.peak_flops_f32:.1%} of the "
          f"{spec.peak_flops_f32 / 1e12:.0f} TFLOP/s MXU matmul peak, "
          f"which this kernel cannot use)")


def _lane_flops_per_control_step(sm, params):
    """Arithmetic-primitive count of one scalar_phys.control_step traced at
    (1, 1) tiles — each arithmetic eqn is one op per lane."""
    import numpy as np

    from lifelike_tpu.ops import scalar_phys as SP

    z = jnp.zeros((1, 1), jnp.float32)
    st = SP.State(
        pb=(z, z, z + 0.33), q=(z, z, z, z + 1.0),
        vb=(z, z, z), wb=(z, z, z),
        jq=tuple((z, z + 0.5, z + 1.5) for _ in range(4)),
        jqd=tuple((z, z, z) for _ in range(4)),
    )
    target = tuple((z, z + 0.5, z + 1.5) for _ in range(4))
    jaxpr = jax.make_jaxpr(
        lambda s: SP.control_step(sm, params, s, target)
    )(st).jaxpr
    arith = {
        "add", "sub", "mul", "div", "sqrt", "rsqrt", "exp", "tanh", "log",
        "sin", "cos", "abs", "neg", "max", "min", "integer_pow", "pow",
        "select_n", "lt", "gt", "ge", "le", "clamp", "sign", "logistic",
    }
    count = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in arith:
            for ov in eqn.outvars:
                count += int(np.prod(ov.aval.shape)) if ov.aval.shape else 1
    return count


if __name__ == "__main__":
    main()
