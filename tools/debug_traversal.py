"""Step-level telemetry for one closed-loop traversal episode.

Reuses make_eval's controller/prior construction exactly, but prints the
robot pose, gate state, selected prior and obstacle geometry every
--log_every steps — the tool that localizes WHERE a course run stalls
(approach, bar contact, crawl, exit). Solver-debug only; EVAL.md numbers
come from tools/make_eval.py.

  python tools/debug_traversal.py --element 2 --seed 0 --cap 400
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import importlib.util

import jax

# CPU by default: the axon TPU tunnel is SINGLE-TENANT — a debug episode
# sharing it with a training run stalls (observed: the PMC learner stopped
# logging for 20+ min while two of these ran). Set LIFELIKE_DEBUG_TPU=1 to
# deliberately use the chip when nothing else is on it.
if not int(os.environ.get("LIFELIKE_DEBUG_TPU", "0")):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

_spec = importlib.util.spec_from_file_location(
    "make_eval", os.path.join(os.path.dirname(__file__), "make_eval.py")
)
me = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(me)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--element", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cap", type=int, default=400)
    ap.add_argument("--population", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--spd_cap", type=float, default=1.3)
    ap.add_argument("--clip_rate", type=float, default=1.0,
                    help="skill-clip playback rate (crawl cadence)")
    args = ap.parse_args()

    from lifelike_tpu.envs import playground
    from lifelike_tpu.physics import batched as B
    from lifelike_tpu.robot.model import build_max_model
    from lifelike_tpu.scene import playground_gen
    from lifelike_tpu.solver import mpc_tasks
    from lifelike_tpu.solver.mppi import MPPIConfig

    element_id = args.element
    model = build_max_model()
    clips, priors, skill = me.build_prior_bank(model, element_id)
    cfg = playground.PlaygroundConfig(
        scene=playground_gen.PlaygroundConfig(element_id=element_id),
        friction_range=(0.4, 1.0),
    )
    c = B.tl_constants(model)
    mcfg = MPPIConfig(horizon=args.horizon, population=args.population,
                      iterations=2, sigma=0.12)
    ctrl = mpc_tasks.make_multigait_traversal_controller(
        model, c, cfg.params, mcfg, clips, priors=priors,
        reward_type=cfg.reward_type, max_steps=cfg.max_steps,
        fused=jax.default_backend() != "cpu",
    )
    step = jax.jit(lambda st, a, k: playground.step(model, cfg, st, a, k))

    key = jax.random.PRNGKey(1000 + args.seed)
    key, kr = jax.random.split(key)
    s, obs = playground.reset(model, cfg, kr)
    cnp = np.asarray(s.scene.center)
    hnp = np.asarray(s.scene.half)
    anp = np.asarray(s.scene.active).astype(bool)
    bars = anp & ((cnp[:, 2] - hnp[:, 2]) > 0.15)
    grounds = anp & ((cnp[:, 2] - hnp[:, 2]) < 0.02) & (
        (cnp[:, 2] + hnp[:, 2]) > 0.03)
    print("target:", np.asarray(s.target_pos)[:2],
          "target_spd:", float(s.target_spd))
    which = bars if element_id == 2 else grounds
    print("obstacle x-spans:",
          [(round(float(cnp[i, 0] - hnp[i, 0]), 2),
            round(float(cnp[i, 0] + hnp[i, 0]), 2),
            round(float(cnp[i, 2] - hnp[i, 2]), 2),
            round(float(cnp[i, 2] + hnp[i, 2]), 2))
           for i in np.where(which)[0]])

    u = jnp.zeros((2, mcfg.horizon, 4, 3))
    loop = me.RUN_LOOP if min(float(s.target_spd), args.spd_cap) > 1.2 \
        else me.CLIP_LOOP
    t_walk = loop[0]
    t_skill = skill["t0"] if skill["kind"] == "play" else skill["loop"][0]
    spd_cmd = jnp.minimum(s.target_spd, args.spd_cap)
    for t in range(args.cap):
        key, k, ke = jax.random.split(key, 3)
        gate = me.gate_skill(s.scene, s.robot.base_pos, element_id)
        spd_t = jnp.minimum(spd_cmd, me.approach_speed_cap(
            s.scene, s.robot.base_pos, element_id, args.spd_cap))
        spd_t = me.skill_speed_floor(s.scene, s.robot.base_pos,
                                     element_id, gate, spd_t)
        tgt, u, sel, diag = ctrl(
            k, s.robot, s.scene, s.target_pos, spd_t,
            jnp.asarray([t_walk, t_skill], jnp.float32), u,
            jnp.asarray(gate, jnp.int32),
        )
        s, obs, r, done, info = step(s, tgt - s.robot.joint_pos, ke)
        t_walk = me._advance_clip(t_walk, loop)
        engaged = int(sel) == 1 if gate < 0 else gate == 1
        if skill["kind"] == "loop" and args.clip_rate != 1.0:
            t_skill += 0.02 * args.clip_rate
            if t_skill > skill["loop"][1]:
                t_skill = skill["loop"][0]
        else:
            t_skill = me.advance_skill_clip(t_skill, skill, engaged)
        if t % args.log_every == 0:
            p = np.asarray(s.robot.base_pos)
            v = np.asarray(s.robot.base_lin_vel)
            q = np.asarray(s.robot.base_orn)
            upz = 1 - 2 * (q[0] ** 2 + q[1] ** 2)
            pc = np.asarray(diag["prior_costs"])
            print(f"t={t:4d} x={p[0]:+.2f} y={p[1]:+.2f} z={p[2]:.3f} "
                  f"vx={v[0]:+.2f} upz={upz:+.2f} gate={gate} "
                  f"costs=[{pc[0]:.1f},{pc[1]:.1f}]", flush=True)
        if bool(done):
            print(f"DONE at t={t}: reached={bool(info['reached'])} "
                  f"fall={bool(info['fall'])}")
            break
    p = np.asarray(s.robot.base_pos)
    print(f"final x={p[0]:+.2f} y={p[1]:+.2f}")


if __name__ == "__main__":
    main()
