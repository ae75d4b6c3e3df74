"""Playground (EPMC) env + scene + EPMC net smoke and parity tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelike_tpu.envs import playground
from lifelike_tpu.models.epmc import EPMCConfig, EPMCNet
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import boxes, playground_gen

MODEL = build_max_model()


def test_heightmap_and_lidar_basics():
    scene = boxes.BoxScene(
        center=jnp.asarray([[2.0, 0.0, 0.1], [0.0, 3.0, 1.0]]),
        half=jnp.asarray([[0.5, 1.0, 0.1], [0.2, 0.2, 1.0]]),
        active=jnp.asarray([True, True]),
        target_pos=jnp.zeros(3),
    )
    h = boxes.heightmap_at(scene, jnp.asarray([[2.0, 0.0], [0.0, 0.0], [0.0, 3.0]]))
    np.testing.assert_allclose(np.asarray(h), [0.2, 0.0, 2.0], atol=1e-6)

    # ray due +x from origin at z=0.15 hits box 1 front face at x=1.5
    pos = jnp.asarray([0.0, 0.0, 0.15])
    d = boxes.lidar(scene, pos, jnp.asarray(0.0))
    assert d.shape == (128,)
    np.testing.assert_allclose(float(d[0]), 1.5, atol=1e-5)
    # ray due +y hits box 2 at y=2.8
    np.testing.assert_allclose(float(d[32]), 2.8, atol=1e-5)
    # miss reproduces reference quirk: distance = |base_pos|
    np.testing.assert_allclose(float(d[64]), float(jnp.linalg.norm(pos)), atol=1e-5)


def test_perception_shapes_and_frames():
    scene = playground_gen.generate(jax.random.PRNGKey(0),
                                    playground_gen.PlaygroundConfig(element_id=1))
    pos = jnp.asarray([0.0, 0.0, 0.4])
    orn = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    h = boxes.perception_height(scene, pos, orn)
    f = boxes.perception_front(scene, pos, orn)
    assert h.shape == (25, 13) and f.shape == (25, 13)
    assert float(jnp.min(f)) >= 0.0 and float(jnp.max(f)) <= 3.0


def test_generators_produce_valid_scenes():
    for eid in [0, 1, 2, 3]:
        cfg = playground_gen.PlaygroundConfig(element_id=eid)
        scene = playground_gen.generate(jax.random.PRNGKey(eid), cfg)
        assert scene.center.shape == (playground_gen.CAPACITY, 3)
        if eid == 0:
            assert not bool(jnp.any(scene.active))
            np.testing.assert_allclose(np.asarray(scene.target_pos), [8.0, 0.0, 0.0])
        else:
            assert bool(jnp.any(scene.active))
            assert float(scene.target_pos[0]) > -4.0
    # batched generation via vmap
    scenes = jax.vmap(
        lambda k: playground_gen.generate(k, playground_gen.PlaygroundConfig(element_id=2))
    )(jax.random.split(jax.random.PRNGKey(1), 5))
    assert scenes.center.shape == (5, playground_gen.CAPACITY, 3)
    # hole blocks leave a crawl gap: bottom of active blocks >= min_gap
    bottoms = scenes.center[..., 2] - scenes.half[..., 2]
    wall_mask = jnp.arange(playground_gen.CAPACITY) < 2
    elems = scenes.active & ~wall_mask
    assert float(jnp.min(jnp.where(elems, bottoms, jnp.inf))) >= 0.25 - 1e-5


def test_playground_env_steps_batched():
    cfg = playground.PlaygroundConfig(
        params=playground.PlaygroundConfig().params._replace(substeps=2),
        scene=playground_gen.PlaygroundConfig(element_id=1),
        max_steps=50,
    )
    key = jax.random.PRNGKey(0)
    B = 3
    s, obs = playground.reset(MODEL, cfg, key, batch=(B,))
    assert obs.prop.shape == (B, 99)
    assert obs.percep_2d.shape == (B, 25, 13)
    assert obs.percep_1d.shape == (B, 128)
    assert obs.target.shape == (B, 3)

    step = jax.jit(lambda s, a, k: playground.step_autoreset(MODEL, cfg, s, a, k))
    for i in range(3):
        key, k = jax.random.split(key)
        a = {"A_LLC": jnp.zeros((B, 12)), "A_Z": jnp.zeros((B,), jnp.int32)}
        s, obs, r, done, info = step(s, a, k)
    assert bool(jnp.all(jnp.isfinite(r)))
    assert bool(jnp.all(jnp.isfinite(obs.percep_1d)))


def test_joystick_reward_heading():
    """Heading straight at the target with the right speed maxes the reward."""
    cfg = playground.PlaygroundConfig(
        scene=playground_gen.PlaygroundConfig(element_id=0), max_steps=100
    )
    s, _ = playground.reset(MODEL, cfg, jax.random.PRNGKey(2))
    # place target straight ahead (+x), robot heading +x at target speed
    s = s._replace(
        target_pos=jnp.asarray([100.0, 0.0, 0.0]),
        target_spd=jnp.asarray(1.0),
        robot=s.robot._replace(
            base_orn=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
            base_lin_vel=jnp.asarray([1.0, 0.0, 0.0]),
        ),
        counter=jnp.asarray(1, jnp.int32),  # avoid the retarget branch
    )
    _, _, r_good, _, _ = playground.step(
        MODEL, cfg, s, jnp.zeros(12), jax.random.PRNGKey(3)
    )
    s_bad = s._replace(
        robot=s.robot._replace(
            base_orn=jnp.asarray([0.0, 0.0, 1.0, 0.0]),  # yaw 180
            base_lin_vel=jnp.asarray([0.0, 0.0, 0.0]),
        )
    )
    _, _, r_bad, _, _ = playground.step(
        MODEL, cfg, s_bad, jnp.zeros(12), jax.random.PRNGKey(3)
    )
    assert float(r_good) > float(r_bad)


def test_epmc_net_forward():
    net = EPMCNet()
    B = 4
    obs = dict(
        prop=jnp.ones((B, 99)) * 0.3,
        prop_a=jnp.zeros((B, 36)),
        percep_2d=jnp.zeros((B, 25, 13)),
        percep_1d=jnp.ones((B, 128)) * 2.0,
        percep_front=jnp.ones((B, 25, 13)),
        target=jnp.ones((B, 3)),
    )
    hs = jnp.zeros((B, 192))
    mask = jnp.zeros((B,))
    params = net.init(
        {"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)}, obs, hs, mask
    )
    out = net.apply(params, obs, hs, mask, rngs={"z": jax.random.PRNGKey(2)})
    assert out.z_logits.shape == (B, 256)
    assert out.mean.shape == (B, 12)
    assert out.value.shape == (B, 1)
    assert out.hs.shape == (B, 192)
    # outer-fed path with explicit indices
    out2 = net.apply(params, obs, hs, mask, z_idx=jnp.zeros((B,), jnp.int32))
    assert out2.mean.shape == (B, 12)
    # hidden state evolves
    assert float(jnp.max(jnp.abs(out.hs))) > 0.0


def test_epmc_llc_params_shared_with_pmc():
    """The EPMC 'llc' param subtree has the same structure as the PMC LLC, so
    a PMC checkpoint can be loaded frozen (reference epmc_net.py:166-174)."""
    from lifelike_tpu.models.pmc import PMCNet

    pmc = PMCNet()
    pp = pmc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 99)), jnp.zeros((1, 36)), jnp.zeros((1, 72))
    )
    net = EPMCNet()
    obs = dict(
        prop=jnp.zeros((1, 99)), prop_a=jnp.zeros((1, 36)),
        percep_2d=jnp.zeros((1, 25, 13)), percep_1d=jnp.zeros((1, 128)),
        percep_front=jnp.zeros((1, 25, 13)), target=jnp.zeros((1, 3)),
    )
    ep = net.init(
        {"params": jax.random.PRNGKey(0), "z": jax.random.PRNGKey(1)},
        obs, jnp.zeros((1, 192)), jnp.zeros((1,)),
    )
    pmc_llc = jax.tree.map(lambda x: x.shape, pp["params"]["llc"])
    epmc_llc = jax.tree.map(lambda x: x.shape, ep["params"]["llc"])
    assert pmc_llc == epmc_llc
