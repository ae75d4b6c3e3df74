"""Obstacle events, collision checks, prioritized clip sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.motion import motion_lib
from lifelike_tpu.utils.obstacle import obstacles_in_frames


def _jump_clip():
    """Clip with two clear jumps above 0.5 m, > 120 frames apart."""
    t = np.arange(600)
    frames = np.zeros((600, 19), np.float32)
    frames[:, 2] = 0.33
    frames[:, 6] = 1.0
    for peak in (150, 400):
        frames[:, 2] += 0.4 * np.exp(-0.5 * ((t - peak) / 10.0) ** 2)
    frames[:, 0] = 0.01 * t
    return frames


def test_obstacles_in_frames_finds_jumps():
    ev = obstacles_in_frames(_jump_clip(), 120)
    assert ev is not None
    assert len(ev["time"]) == 2
    np.testing.assert_allclose(ev["time"], [150 / 120, 400 / 120], atol=0.05)
    # flat clip has no events
    flat = np.zeros((240, 19), np.float32)
    flat[:, 6] = 1.0
    assert obstacles_in_frames(flat, 120) is None


def test_extract_and_current_obstacle():
    ev = motion_lib.extract_obstacles([_jump_clip()], 1.0 / 120.0)
    assert int(ev.count[0]) == 2
    xy, yaw, active = motion_lib.current_obstacle(
        ev, jnp.asarray(0), jnp.asarray(0.1)
    )
    assert bool(active)
    np.testing.assert_allclose(float(xy[0]), 0.01 * 150, atol=0.02)
    # after the first event + 0.5 s, advance to the second
    xy2, _, _ = motion_lib.current_obstacle(ev, jnp.asarray(0), jnp.asarray(2.0))
    np.testing.assert_allclose(float(xy2[0]), 0.01 * 400, atol=0.02)


def test_obstacle_collision_geometry():
    xy = jnp.asarray([1.0, 0.0])
    yaw = jnp.asarray(0.0)
    inside = motion_lib.obstacle_collision(
        xy, yaw, 0.2, jnp.asarray([[1.0, 0.1, 0.1]])
    )
    outside = motion_lib.obstacle_collision(
        xy, yaw, 0.2, jnp.asarray([[1.2, 0.1, 0.1]])
    )
    assert bool(inside) and not bool(outside)
    # rotated obstacle: the thin axis rotates with yaw
    rot = motion_lib.obstacle_collision(
        xy, jnp.asarray(jnp.pi / 2), 0.2, jnp.asarray([[1.2, 0.0, 0.1]])
    )
    assert bool(rot)  # now within the long axis


def test_prioritized_sampler():
    s = motion_lib.PrioritizedClipSampler(4, factor=3.0)
    p0 = np.asarray(s.probabilities)
    np.testing.assert_allclose(p0, 0.25)
    s.update([1], [0.9])  # clip 1 is easy -> lower probability
    p = np.asarray(s.probabilities)
    assert p[1] < p[0]
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-9)


def test_primitive_env_obstacle_termination():
    from lifelike_tpu.envs import primitive
    from lifelike_tpu.robot.model import build_max_model

    model = build_max_model()
    clip = _jump_clip()
    clips = motion_lib.pack_clips([clip], frame_step=1.0 / 120.0)
    obstacles = motion_lib.extract_obstacles([clip], 1.0 / 120.0)
    cfg = primitive.PrimitiveEnvConfig(
        params=primitive.PrimitiveEnvConfig().params._replace(substeps=2),
        set_obstacle=True,
        obstacle_height=5.0,  # giant box guarantees a hit at the jump spot
    )
    env, obs = primitive.reset(model, clips, cfg, jax.random.PRNGKey(0))
    # teleport the robot onto the first obstacle position
    env = env._replace(
        t=jnp.asarray(0.6, env.t.dtype),
        robot=env.robot._replace(
            base_pos=jnp.asarray([1.5, 0.0, 0.33], env.robot.base_pos.dtype)
        ),
    )
    env2, _, _, done, _ = primitive.step(
        model, clips, cfg, env, jnp.zeros(12), obstacles=obstacles
    )
    assert bool(done)
