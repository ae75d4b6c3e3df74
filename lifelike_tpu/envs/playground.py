"""Playground (EPMC) environment: batched terrain traversal, fully on-device.

Functional JAX re-design of the reference PlayGroundEnv
(reference max_game_elements/playground_env.py): procedural obstacle course
(scene.playground_gen), randomized friction/pushes, observation dict
  prop (33x3 stacked), prop_a (12x3), percep_2d (25x13 heightmap),
  percep_1d (128-ray lidar), percep_front (25x13 forward depth),
  target (unit direction in base frame 2 + target speed 1)
and the joystick / average-speed reward families (:479-539). The action dict
{A_Z: Discrete(256), A_LLC: Box(12)} matches the reference; the env consumes
A_LLC as delta joint targets (A_Z is the EPMC net's latent choice, decoded
upstream).

Contact runs against the full box SDF (physics.contact.sphere_boxes_force):
feet step onto obstacle tops AND vertical faces push back, so walls and
hurdles are impassable as in Bullet (reference
bullet_static_entities.py:243-256 creates every element as a hard collision
body). As in the reference, collisions do not terminate the episode —
termination is fall/timeout/reach only (playground_env.py:360-372).
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.costs import tracking
from lifelike_tpu.envs import randomizer
from lifelike_tpu.envs.primitive import ACTION_SIZE, PROP_SIZE, STACK, _proprioception
from lifelike_tpu.math import quat
from lifelike_tpu.physics import engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.robot.model import MaxModel
from lifelike_tpu.scene import boxes, playground_gen


class PlaygroundConfig(NamedTuple):
    params: engine.PhysicsParams = engine.PhysicsParams(kd=1.0, max_tau=16.0)
    scene: playground_gen.PlaygroundConfig = playground_gen.PlaygroundConfig()
    push: randomizer.PushConfig = randomizer.PushConfig()
    max_steps: int = 1000  # reference example_epmc_train.sh:98
    friction_range: tuple = (0.4, 3.0)
    target_spd_range: tuple = (0.5, 3.0)
    cmd_vary_freq_range: tuple = (25, 200)  # playground_env.py:163
    # episodic obs-noise ranges (None disables), playground_env.py:176-179
    obs_noise_pos_xy: float = 0.0
    obs_noise_yaw: float = 0.0
    obs_noise_pos_z: float = 0.0
    # hard-contact plant: step the robot with the impulse PGS solver
    # (physics/impulse.py box rows — Bullet's solver discipline,
    # legged_robot.py:260-264) instead of the compliant penalty engine.
    # The fidelity/eval mode; the sampling MPC keeps planning compliant.
    hard_contact: bool = False

    @property
    def policy_dt(self):
        return self.params.dt * self.params.substeps

    @property
    def reward_type(self):
        return "joystick" if self.scene.element_id == 0 else "average_speed"


class PlaygroundState(NamedTuple):
    robot: RobotState
    scene: boxes.BoxScene
    push: randomizer.PushState
    counter: jnp.ndarray  # (...,) int32
    target_pos: jnp.ndarray  # (..., 3)
    target_spd: jnp.ndarray  # (...,)
    cmd_vary_freq: jnp.ndarray  # (...,) int32
    last_pos_diff: jnp.ndarray  # (...,)
    init_pos_diff: jnp.ndarray  # (...,)
    total_spd: jnp.ndarray  # (...,)
    max_spd: jnp.ndarray  # (...,)
    friction: jnp.ndarray  # (...,)
    noise_bias: jnp.ndarray  # (..., 4) [pos_x, pos_y, yaw, pos_z]
    prop_hist: jnp.ndarray  # (..., STACK, PROP_SIZE)
    act_hist: jnp.ndarray  # (..., STACK, ACTION_SIZE)


class PlaygroundObs(NamedTuple):
    prop: jnp.ndarray
    prop_a: jnp.ndarray
    percep_2d: jnp.ndarray  # (..., 25, 13)
    percep_1d: jnp.ndarray  # (..., 128)
    percep_front: jnp.ndarray  # (..., 25, 13)
    target: jnp.ndarray  # (..., 3)


_INIT_JOINTS = np.asarray(  # numpy: module-level device arrays poison dispatch
    # STATES_INFO_12_RUN_0 joints (reference constants.py:108-111)
    [-0.0278, -0.7790, 1.6873, -0.0276, -0.7777, 1.6838,
     -0.0278, -0.7334, 1.5669, -0.0276, -0.7319, 1.5632]
)


def _observe(cfg: PlaygroundConfig, s: PlaygroundState) -> PlaygroundObs:
    pos = s.robot.base_pos + jnp.stack(
        [s.noise_bias[..., 0], s.noise_bias[..., 1], jnp.zeros_like(s.noise_bias[..., 0])],
        axis=-1,
    )
    yaw = quat.yaw(s.robot.base_orn) + s.noise_bias[..., 2]
    p2d = boxes.perception_height(s.scene, pos, s.robot.base_orn)
    # episodic z-bias applied to nonzero heights (playground_env.py:442-445)
    zb = s.noise_bias[..., 3][..., None, None]
    p2d = jnp.where((p2d > 0.01) & (p2d < 0.6), p2d + zb, 0.0)
    p1d = boxes.lidar(s.scene, pos, yaw)
    pfront = boxes.perception_front(s.scene, pos, s.robot.base_orn)

    diff = s.target_pos - pos
    dir_base = quat.rotate_inv(s.robot.base_orn, diff)[..., :2]
    dir_base = dir_base / jnp.linalg.norm(dir_base, axis=-1, keepdims=True).clip(1e-8)
    target = jnp.concatenate([dir_base, s.target_spd[..., None]], axis=-1)
    return PlaygroundObs(
        prop=s.prop_hist.reshape(s.prop_hist.shape[:-2] + (-1,)),
        prop_a=s.act_hist.reshape(s.act_hist.shape[:-2] + (-1,)),
        percep_2d=p2d,
        percep_1d=p1d,
        percep_front=pfront,
        target=target,
    )


def reset(model: MaxModel, cfg: PlaygroundConfig, key, batch=()):
    import math

    ks = jax.random.split(key, 7)
    if batch == ():
        scene = playground_gen.generate(ks[0], cfg.scene)
    else:
        scene = jax.vmap(lambda k: playground_gen.generate(k, cfg.scene))(
            jax.random.split(ks[0], math.prod(batch))
        )
        scene = jax.tree.map(lambda x: x.reshape(batch + x.shape[1:]), scene)

    # random yaw init at [0, 0, 0.5] (reference randomize_init_states :181-194)
    yaw0 = jax.random.uniform(ks[1], batch, maxval=2.0 * jnp.pi)
    base_orn = quat.from_yaw(yaw0)
    robot = RobotState(
        base_pos=jnp.zeros(batch + (3,)).at[..., 2].set(0.5),
        base_orn=base_orn,
        base_lin_vel=jnp.zeros(batch + (3,)),
        base_ang_vel=jnp.zeros(batch + (3,)),
        joint_pos=jnp.broadcast_to(_INIT_JOINTS, batch + (12,)),
        joint_vel=jnp.zeros(batch + (12,)),
    )
    friction = jax.random.uniform(ks[2], batch, minval=cfg.friction_range[0],
                                  maxval=cfg.friction_range[1])
    cmd_freq = jax.random.randint(ks[3], batch, *cfg.cmd_vary_freq_range)
    spd = jax.random.uniform(ks[4], batch, minval=cfg.target_spd_range[0],
                             maxval=cfg.target_spd_range[1])
    noise = jax.random.uniform(ks[5], batch + (4,), minval=-1.0, maxval=1.0) * jnp.asarray(
        [cfg.obs_noise_pos_xy, cfg.obs_noise_pos_xy, cfg.obs_noise_yaw, cfg.obs_noise_pos_z]
    )
    pos_diff = jnp.linalg.norm(
        (scene.target_pos - robot.base_pos)[..., :2], axis=-1
    )
    prop = _proprioception(robot)
    s = PlaygroundState(
        robot=robot,
        scene=scene,
        push=randomizer.push_reset(ks[6], cfg.push, cfg.policy_dt, batch),
        counter=jnp.zeros(batch, jnp.int32),
        target_pos=scene.target_pos,
        target_spd=spd,
        cmd_vary_freq=cmd_freq,
        last_pos_diff=pos_diff,
        init_pos_diff=pos_diff,
        total_spd=jnp.zeros(batch),
        max_spd=jnp.zeros(batch),
        friction=friction,
        noise_bias=noise,
        prop_hist=jnp.repeat(prop[..., None, :], STACK, axis=-2),
        act_hist=jnp.zeros(batch + (STACK, ACTION_SIZE), prop.dtype),
    )
    return s, _observe(cfg, s)


def _heading_reward(robot: RobotState, dir_w, scale):
    yaw = quat.yaw(robot.base_orn)
    return jnp.exp(
        (jnp.cos(yaw) * dir_w[..., 0] + jnp.sin(yaw) * dir_w[..., 1] - 1.0) * scale
    )


def step(model: MaxModel, cfg: PlaygroundConfig, s: PlaygroundState, action, key):
    """action: dict with 'A_LLC' (..., 12) delta joint targets (A_Z handled by
    the policy network upstream). Returns (state', obs, reward, done, info)."""
    a_llc = action["A_LLC"] if isinstance(action, dict) else action
    k1, k2, k3 = jax.random.split(key, 3)

    # joystick re-targeting every cmd_vary_freq steps (playground_env.py:302-315)
    retarget = (s.counter % s.cmd_vary_freq) == 0
    if cfg.scene.element_id == 0:
        theta = jax.random.uniform(k1, s.counter.shape, maxval=2.0 * jnp.pi)
        new_target = s.robot.base_pos + 100.0 * jnp.stack(
            [jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(theta)], axis=-1
        )
        target_pos = jnp.where(retarget[..., None], new_target, s.target_pos)
        new_diff = jnp.linalg.norm((target_pos - s.robot.base_pos)[..., :2], axis=-1)
        last_pos_diff = jnp.where(retarget, new_diff, s.last_pos_diff)
    else:
        target_pos = s.target_pos
        last_pos_diff = s.last_pos_diff
    new_spd = jax.random.uniform(
        k2, s.counter.shape, minval=cfg.target_spd_range[0], maxval=cfg.target_spd_range[1]
    )
    target_spd = jnp.where(retarget, new_spd, s.target_spd)

    push, ext_force = randomizer.push_step(k3, cfg.push, s.push, cfg.policy_dt)
    params = cfg.params._replace(
        foot_friction=s.friction[..., None], ext_force=ext_force
    )
    target_q = s.robot.joint_pos + a_llc
    if cfg.hard_contact:
        # impulse PGS plant (hard contact incl. box rows); warm-start
        # impulses reset per control step — hard contact without threading
        # a lam carry through the env state (Bullet warm-starts across
        # steps; within-step the 10-substep chain still warm-starts).
        from lifelike_tpu.physics import impulse

        ip = impulse.ImpulseParams(
            kp=cfg.params.kp, kd=cfg.params.kd, max_tau=cfg.params.max_tau,
            mu=s.friction, dt=cfg.params.dt, substeps=cfg.params.substeps,
            ext_force=ext_force,
        )
        lam = impulse.init_lam(s.robot.base_pos.shape[:-1],
                               s.robot.base_pos.dtype, scene=s.scene)
        robot, _ = impulse.control_step(model, ip, s.robot, lam, target_q,
                                        scene=s.scene)
    else:
        # Full box SDF contact: walls and hurdle faces push back (Bullet
        # hard-collision parity) instead of acting as raised ground only.
        robot = engine.control_step(model, params, s.robot, target_q,
                                    scene=s.scene)

    # speed toward target (playground_env.py:481-489)
    diff = (target_pos - robot.base_pos)[..., :2]
    pos_diff = jnp.linalg.norm(diff, axis=-1)
    dir_w = diff / pos_diff[..., None].clip(1e-8)
    spd = jnp.abs(
        robot.base_lin_vel[..., 0] * dir_w[..., 0]
        + robot.base_lin_vel[..., 1] * dir_w[..., 1]
    )
    total_spd = s.total_spd + spd
    max_spd = jnp.maximum(s.max_spd, spd)

    counter = s.counter + 1
    fall = tracking.fall_terminated(robot)
    timeout = counter >= cfg.max_steps
    reached = pos_diff < 0.5
    blown = tracking.blown_up(robot)
    done = fall | timeout | reached | blown

    inv_max = 1.0 / float(cfg.max_steps)
    if cfg.reward_type == "joystick":
        r_vel = jnp.exp(-jnp.abs(spd - target_spd))
        r_rot = _heading_reward(robot, dir_w, 5.0)
        reward = r_vel * r_rot * inv_max
    else:  # average_speed (playground_env.py:504-539)
        r_rot = _heading_reward(robot, dir_w, 5.0)
        r_dist = (pos_diff - last_pos_diff) / s.init_pos_diff.clip(1e-8)
        reward = r_rot * inv_max * 0.1 * 2.0 - r_dist * 0.1
        avg_spd = total_spd / counter
        r_avg = jnp.exp(-jnp.abs(avg_spd - target_spd))
        reward = reward + jnp.where(reached, r_avg, 0.0)

    prop = _proprioception(robot)
    s = s._replace(
        robot=robot,
        push=push,
        counter=counter,
        target_pos=target_pos,
        target_spd=target_spd,
        last_pos_diff=pos_diff,
        total_spd=total_spd,
        max_spd=max_spd,
        prop_hist=jnp.concatenate(
            [s.prop_hist[..., 1:, :], prop[..., None, :]], axis=-2
        ),
        act_hist=jnp.concatenate(
            [s.act_hist[..., 1:, :], a_llc[..., None, :]], axis=-2
        ),
    )
    obs = _observe(cfg, s)
    info = {
        "fall": fall,
        "timeout": timeout,
        "reached": reached,
        "ave_spd": total_spd / counter,
        "max_spd": max_spd,
    }
    return s, obs, reward, done, info


def step_autoreset(model, cfg, s, action, key):
    k1, k2 = jax.random.split(key)
    s2, obs, reward, done, info = step(model, cfg, s, action, k1)
    batch = s.counter.shape
    s_new, obs_new = reset(model, cfg, k2, batch)

    def sel(a, b):
        d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
        return jnp.where(d, a, b)

    return (
        jax.tree.map(sel, s_new, s2),
        jax.tree.map(sel, obs_new, obs),
        reward,
        done,
        info,
    )
