"""Chase Tag env + SEPMC net smoke/logic tests."""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.envs import chase_tag
from lifelike_tpu.models.sepmc import SEPMCNet
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import arena_gen

MODEL = build_max_model()


def _small_cfg():
    return chase_tag.ChaseTagConfig(
        params=chase_tag.ChaseTagConfig().params._replace(substeps=2),
        max_steps=50,
    )


def test_arena_generation():
    scene = arena_gen.generate(
        jax.random.PRNGKey(0), arena_gen.ArenaConfig(rand_cube=True, hurdle=True)
    )
    assert int(jnp.sum(scene.active)) >= 4 + 5 + 1
    # walls enclose +-2.5
    np.testing.assert_allclose(np.asarray(scene.center[0]), [0, 2.5, 1.0])


def test_reset_and_step():
    cfg = _small_cfg()
    key = jax.random.PRNGKey(1)
    B = 2
    s, obs = chase_tag.reset(MODEL, cfg, key, batch=(B,))
    assert obs.prop.shape == (B, 2, 99)
    assert obs.oppo_info.shape == (B, 2, 15)
    assert obs.flag_info.shape == (B, 2, 7)
    assert obs.with_flag.shape == (B, 2, 2)
    # exactly one chaser per game
    assert bool(jnp.all(jnp.sum(s.with_flag, axis=-1) == 1))

    step = jax.jit(lambda s, a, k: chase_tag.step_autoreset(MODEL, cfg, s, a, k))
    for i in range(3):
        key, k = jax.random.split(key)
        a = {"A_LLC": jnp.zeros((B, 2, 12))}
        s, obs, r, done, info = step(s, a, k)
    assert r.shape == (B, 2)
    assert bool(jnp.all(jnp.isfinite(r)))


def test_flag_grab_swaps_roles_and_rewards():
    cfg = _small_cfg()
    s, _ = chase_tag.reset(MODEL, cfg, jax.random.PRNGKey(2))
    # place escapee (non-chaser) on the flag
    chaser0 = bool(s.with_flag[0])
    escapee = 1 if chaser0 else 0
    pos = s.robots.base_pos.at[escapee, :2].set(s.flag_pos[:2])
    # keep them far apart so no catch
    pos = pos.at[1 - escapee, :2].set(jnp.asarray([-2.0, -2.0]))
    s = s._replace(robots=s.robots._replace(base_pos=pos))
    s2, _, r, done, _ = chase_tag.step(
        MODEL, cfg, s, jnp.zeros((2, 12)), jax.random.PRNGKey(3)
    )
    # roles swapped: grabber is now the chaser and got +1
    assert bool(s2.with_flag[escapee])
    assert not bool(s2.with_flag[1 - escapee])
    assert float(r[escapee]) == 1.0
    assert float(r[1 - escapee]) == -1.0
    # flag teleported
    assert float(jnp.linalg.norm(s2.flag_pos[:2] - s.flag_pos[:2])) > 1e-6


def test_catch_terminates_with_reward():
    cfg = _small_cfg()
    s, _ = chase_tag.reset(MODEL, cfg, jax.random.PRNGKey(4))
    pos = s.robots.base_pos.at[0, :2].set(jnp.asarray([0.0, 0.0]))
    pos = pos.at[1, :2].set(jnp.asarray([0.2, 0.0]))
    # move flag away so no grab happens
    s = s._replace(
        robots=s.robots._replace(base_pos=pos),
        flag_pos=jnp.asarray([2.0, 2.0, 0.25]),
    )
    _, _, r, done, info = chase_tag.step(
        MODEL, cfg, s, jnp.zeros((2, 12)), jax.random.PRNGKey(5)
    )
    assert bool(done)
    chaser = 0 if bool(s.with_flag[0]) else 1
    assert float(r[chaser]) == 1.0
    assert float(r[1 - chaser]) == -1.0


def test_visibility_occlusion():
    cfg = chase_tag.ChaseTagConfig(
        arena=arena_gen.ArenaConfig(hole=False), visible_angle=jnp.pi
    )
    s, obs = chase_tag.reset(MODEL, cfg, jax.random.PRNGKey(6))
    # open arena: opponents see each other (oppo_info visible flag = 1)
    pos = s.robots.base_pos.at[0, :2].set(jnp.asarray([-1.0, 0.0]))
    pos = pos.at[1, :2].set(jnp.asarray([1.0, 0.0]))
    s = s._replace(robots=s.robots._replace(base_pos=pos))
    obs = chase_tag._observe(MODEL, cfg, s)
    assert float(obs.oppo_info[0, 0]) == 1.0
    # wall between them: add an occluding box
    scene = s.scene
    scene = scene._replace(
        center=scene.center.at[10].set(jnp.asarray([0.0, 0.0, 1.0])),
        half=scene.half.at[10].set(jnp.asarray([0.05, 2.5, 1.0])),
        active=scene.active.at[10].set(True),
    )
    obs2 = chase_tag._observe(MODEL, cfg, s._replace(scene=scene))
    assert float(obs2.oppo_info[0, 0]) == 0.0
    # cheat obs still sees
    assert float(obs2.oppo_info_cheat[0, 0]) == 0.0  # visible flag is false
    assert float(jnp.max(jnp.abs(obs2.oppo_info_cheat[0, 1:]))) > 0.0


def test_sepmc_net_forward():
    net = SEPMCNet()
    B = 3
    obs = dict(
        prop=jnp.ones((B, 99)) * 0.2,
        prop_a=jnp.zeros((B, 36)),
        percept_2d=jnp.zeros((B, 25, 13)),
        percept_1d=jnp.ones((B, 128)),
        percept_front=jnp.ones((B, 25, 13)),
        percept_vec=jnp.ones((B, 5)),
        oppo_info=jnp.ones((B, 15)),
        oppo_info_cheat=jnp.ones((B, 15)),
        flag_info=jnp.ones((B, 7)),
        flag_info_cheat=jnp.ones((B, 7)),
        with_flag=jnp.asarray([[1.0, 0.0]] * B),
        control_spd=jnp.ones((B, 1)),
    )
    hs = jnp.zeros((B, 256))
    mask = jnp.zeros((B,))
    rngs = {"params": jax.random.PRNGKey(0), "hlc": jax.random.PRNGKey(1),
            "z": jax.random.PRNGKey(2)}
    params = net.init(rngs, obs, hs, mask)
    out = net.apply(
        params, obs, hs, mask,
        rngs={"hlc": jax.random.PRNGKey(3), "z": jax.random.PRNGKey(4)},
    )
    assert out.hlc_mean.shape == (B, 1)
    assert float(jnp.max(jnp.abs(out.hlc_mean))) <= float(jnp.pi)
    assert out.z_logits.shape == (B, 256)
    assert out.mean.shape == (B, 12)
    assert out.hs.shape == (B, 256)
    # outer-fed path
    out2 = net.apply(
        params, obs, hs, mask,
        a_hlc=jnp.zeros((B, 1)), a_z=jnp.zeros((B,), jnp.int32),
    )
    assert out2.mean.shape == (B, 12)


def test_sepmc_llc_structure_matches_pmc():
    from lifelike_tpu.models.pmc import PMCNet

    pmc = PMCNet()
    pp = pmc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 99)), jnp.zeros((1, 36)), jnp.zeros((1, 72))
    )
    net = SEPMCNet()
    obs = {k: jnp.zeros((1,) + s) for k, s in [
        ("prop", (99,)), ("prop_a", (36,)), ("percept_2d", (25, 13)),
        ("percept_1d", (128,)), ("percept_front", (25, 13)), ("percept_vec", (5,)),
        ("oppo_info", (15,)), ("oppo_info_cheat", (15,)), ("flag_info", (7,)),
        ("flag_info_cheat", (7,)), ("with_flag", (2,)), ("control_spd", (1,))]}
    sp = net.init(
        {"params": jax.random.PRNGKey(0), "hlc": jax.random.PRNGKey(1),
         "z": jax.random.PRNGKey(2)},
        obs, jnp.zeros((1, 256)), jnp.zeros((1,)),
    )
    assert jax.tree.map(lambda x: x.shape, pp["params"]["llc"]) == jax.tree.map(
        lambda x: x.shape, sp["params"]["llc"]
    )


def test_link_catch_geometry():
    """Catch requires robot 0's leg/wheel links near the opponent's body
    (reference _detect_body_contact, chase_tag_game_env.py:426-456) — not
    just base proximity."""
    cfg = _small_cfg()
    s, _ = chase_tag.reset(MODEL, cfg, jax.random.PRNGKey(11))
    far = s.robots.base_pos.at[0, :2].set(jnp.asarray([-1.5, 0.0]))
    far = far.at[1, :2].set(jnp.asarray([1.5, 0.0]))
    assert not bool(chase_tag._link_catch(
        MODEL, s.robots._replace(base_pos=far)
    ))
    near = s.robots.base_pos.at[0, :2].set(jnp.asarray([0.0, 0.0]))
    near = near.at[1, :2].set(jnp.asarray([0.25, 0.0]))
    assert bool(chase_tag._link_catch(
        MODEL, s.robots._replace(base_pos=near)
    ))


def test_head_ray_fan_sees_under_floating_wall():
    """A floating wall blocks the root-root ray but the head->convex-point
    fan (reference _ray_test_visible :472-493) finds the opponent's feet
    under it."""
    cfg = chase_tag.ChaseTagConfig(
        arena=arena_gen.ArenaConfig(hole=False), visible_angle=jnp.pi
    )
    s, _ = chase_tag.reset(MODEL, cfg, jax.random.PRNGKey(6))
    pos = s.robots.base_pos.at[0].set(jnp.asarray([-1.0, 0.0, 0.5]))
    pos = pos.at[1].set(jnp.asarray([1.0, 0.0, 0.5]))
    s = s._replace(robots=s.robots._replace(base_pos=pos))

    def with_wall(z_lo, z_hi):
        zc, zh = 0.5 * (z_lo + z_hi), 0.5 * (z_hi - z_lo)
        scene = s.scene
        scene = scene._replace(
            center=scene.center.at[10].set(jnp.asarray([0.0, 0.0, zc])),
            half=scene.half.at[10].set(jnp.asarray([0.05, 2.5, zh])),
            active=scene.active.at[10].set(True),
        )
        return chase_tag._observe(MODEL, cfg, s._replace(scene=scene))

    # floating wall covering the base/head heights only: fan sees the feet
    assert float(with_wall(0.45, 2.0).oppo_info[0, 0]) == 1.0
    # full-height wall: nothing gets through
    assert float(with_wall(0.0, 2.0).oppo_info[0, 0]) == 0.0


def test_robot_contact_impulse_pushes_apart():
    cfg = _small_cfg()
    s, _ = chase_tag.reset(MODEL, cfg, jax.random.PRNGKey(12))
    pos = s.robots.base_pos.at[0].set(jnp.asarray([0.0, 0.0, 0.33]))
    pos = pos.at[1].set(jnp.asarray([0.2, 0.0, 0.33]))
    orn = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (2, 4))
    r = s.robots._replace(
        base_pos=pos, base_orn=orn, base_lin_vel=jnp.zeros((2, 3))
    )
    dv = chase_tag._robot_contact_impulse(MODEL, cfg, r)
    assert float(dv[0, 0]) < 0.0  # robot 0 pushed in -x
    assert float(dv[1, 0]) > 0.0  # robot 1 pushed in +x
    np.testing.assert_allclose(  # equal and opposite (momentum conserved)
        np.asarray(dv[0]), -np.asarray(dv[1]), atol=1e-6
    )
    # no force when apart
    apart = r._replace(base_pos=pos.at[1, 0].set(2.0))
    dv0 = chase_tag._robot_contact_impulse(MODEL, cfg, apart)
    np.testing.assert_allclose(np.asarray(dv0), 0.0, atol=1e-9)
