"""Corridor contact pruning: k=8 must be lossless vs k=16 for MPC solves.

The EPMC fused solve's cost is dominated by K-vectorized box contact
(14 spheres x K boxes x 500 substeps); halving the pruned set from the
historical CONTACT_K=16 to 8 puts the pop-4096 H=50 solve under the 10 ms
budget (measured 16.6 ms -> 8.6 ms, tools/epmc_sweep.py). This test pins
the SAFETY of that cut: over randomized playground scenes (all three
elements) and randomized nearby robot states, traversal rollout costs with
the k=8 corridor subset equal the k=16 costs — i.e. boxes ranked 9..16 by
corridor distance never touch an H-step rollout (reach <= spd*H*dt plus
sphere radii is well inside the 8-box cover for the reference obstacle
spacings, playground_env/bullet_static_entities geometry)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.physics import batched as B
from lifelike_tpu.physics import engine, engine_tl
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import boxes, playground_gen
from lifelike_tpu.solver import rollout_tasks

MODEL = build_max_model()


@pytest.mark.parametrize("element_id", [1, 2, 3])
def test_k8_corridor_prune_lossless(element_id):
    params = engine.PhysicsParams(kd=1.0, max_tau=16.0, substeps=5)
    c = B.tl_constants(MODEL, dtype=jnp.float32)
    H, pop = 10, 16
    spd = 1.5
    policy_dt = params.dt * params.substeps

    stand = jnp.asarray([-0.028, -0.779, 1.687] * 4, jnp.float32)
    key = jax.random.PRNGKey(element_id)
    for trial in range(3):
        key, k_scene, k_pos, k_u = jax.random.split(key, 4)
        scene = playground_gen.generate(
            k_scene, playground_gen.PlaygroundConfig(element_id=element_id)
        )
        # robot somewhere along the course, heading at the target
        x0 = float(jax.random.uniform(k_pos, (), jnp.float32, 0.0, 6.0))
        from lifelike_tpu.physics.dynamics import RobotState

        rs = RobotState(
            base_pos=jnp.asarray([x0, 0.0, 0.33], jnp.float32),
            base_orn=jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32),
            base_lin_vel=jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
            base_ang_vel=jnp.zeros(3, jnp.float32),
            joint_pos=stand,
            joint_vel=jnp.zeros(12, jnp.float32),
        )
        tgt = scene.target_pos
        p0 = rs.base_pos
        to_tgt = tgt[:2] - p0[:2]
        d_tgt = jnp.linalg.norm(to_tgt) + 1e-9
        reach = jnp.minimum(d_tgt, spd * H * policy_dt)
        p1 = p0.at[:2].add(to_tgt / d_tgt * reach)

        tl = B.tl_from_state(jax.tree.map(lambda x: x[None], rs))
        tl = jax.tree.map(
            lambda x: jnp.broadcast_to(x, x.shape[:-2] + (1, pop)), tl
        )
        u = 0.1 * jax.random.normal(k_u, (H, 4, 3, 1, pop), jnp.float32)

        costs = {}
        for k in (16, 8):
            sub = boxes.nearest_boxes_corridor(scene, p0, p1, k)
            ts = engine_tl.tl_scene(sub)
            cost, _ = jax.jit(
                lambda s, uu, ts=ts: rollout_tasks.rollout_traversal(
                    c, params, s, uu, ts, tgt, spd, "joystick"
                )
            )(tl, u)
            costs[k] = np.asarray(cost)
        np.testing.assert_allclose(
            costs[8], costs[16], rtol=1e-5, atol=1e-5,
            err_msg=f"element {element_id} trial {trial}: boxes 9..16 "
            "influenced the rollout — k=8 prune is NOT lossless here",
        )
