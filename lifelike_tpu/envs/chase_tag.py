"""Chase Tag Game (SEPMC) environment: two-robot self-play, fully on-device.

Functional JAX re-design of the reference ChaseTagGameEnv
(reference max_game/chase_tag_game_env.py): two MAX robots in the V4 arena
(scene.arena_gen), 25 Hz control / 500 Hz physics (:23, 20 substeps),
per-agent observation dict
  prop, prop_a, percept_2d, percept_1d, percept_front,
  percept_vec (pos 3 + cos/sin yaw),
  oppo_info (15 = visible + oppo pos + local pos diff + yaw diff cos/sin +
             local oppo lin/ang vel, zeroed when not visible) + cheat variant,
  flag_info (7 = visible + flag pos + local diff) + cheat,
  with_flag (2), control_spd (1)
and the game logic: the robot WITHOUT the flag-role grabs the flag to swap
roles (flag teleports, +-1 reward on the switch frame, :573-581,:640-652);
body contact between robots ends the game with +-1 for the chaser
(:412-419); occlusion-aware visibility via segment tests against arena boxes
plus a FOV cone (:472-493).

Contact parity vs Bullet: the catch check mirrors _detect_body_contact
(:426-456) — robot 0's leg/wheel link spheres against the opponent's trunk
collision box (SDF) and link spheres; visibility mirrors _ray_test_visible
(:472-493) — root-to-root segment first, then a head->convex-point ray fan;
robot-robot interpenetration is resisted by a compliant trunk-sphere
spring-damper impulse applied at the control rate (Bullet resolves it as
rigid contact at substep rate — the softer 50 Hz response is the remaining
approximation). Robot-flag "contact" stays a distance threshold.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lifelike_tpu.costs import tracking
from lifelike_tpu.envs import randomizer
from lifelike_tpu.envs.playground import _INIT_JOINTS
from lifelike_tpu.envs.primitive import ACTION_SIZE, STACK, _proprioception
from lifelike_tpu.math import quat
from lifelike_tpu.physics import dynamics, engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.scene import arena_gen, boxes

FLAG_RADIUS = 0.3  # flag box 0.1 x 0.1 x 0.5 grab distance

# trunk collision box and handle offsets from max.urdf (robot/max_urdf_data):
# the reference's convex point set is feet + wheels + handles
# (legged_robot.py:150-156); the head point is the front handle (:154-156).
TRUNK_HALF = (0.283, 0.205, 0.11)
HEAD_OFFSET = (0.1415, 0.0, 0.085)
HIND_OFFSET = (-0.2485, 0.0, 0.085)
CATCH_MARGIN = 0.06  # link-sphere radius + Bullet contact slop
# compliant robot-robot trunk contact (one bounding sphere per trunk: the
# push direction stays well-defined at any interpenetration depth)
RR_RADIUS = 0.25  # between the trunk half-width and half-length
RR_KN = 2500.0  # N/m trunk-trunk spring
RR_DN = 60.0  # N s/m normal damping


class ChaseTagConfig(NamedTuple):
    params: engine.PhysicsParams = engine.PhysicsParams(
        kd=1.0, max_tau=16.0, substeps=20  # 25 Hz control (reference :23)
    )
    arena: arena_gen.ArenaConfig = arena_gen.ArenaConfig()
    version: str = "v4"  # GameManager arena version (game_manager.py:5-18)
    height_offset: tuple = (0.0, 0.0)  # randomize_height hook (v1-v3 arenas)
    push: randomizer.PushConfig = randomizer.PushConfig()
    max_steps: int = 1000
    friction_range: tuple = (0.4, 1.0)
    visible_angle: float = jnp.pi  # FOV half-angle (reference :31)
    control_spd_range: tuple = (0.5, 3.0)  # episodic_fix_spd (:262)

    @property
    def policy_dt(self):
        return self.params.dt * self.params.substeps


class ChaseTagState(NamedTuple):
    robots: RobotState  # leaves (..., 2, k) — agent axis after batch
    scene: boxes.BoxScene
    push: randomizer.PushState
    counter: jnp.ndarray  # (...,)
    with_flag: jnp.ndarray  # (..., 2) bool: True = chaser role
    flag_pos: jnp.ndarray  # (..., 3)
    control_spd: jnp.ndarray  # (...,)
    friction: jnp.ndarray  # (...,)
    total_spd: jnp.ndarray  # (..., 2)
    max_spd: jnp.ndarray  # (..., 2)
    prop_hist: jnp.ndarray  # (..., 2, STACK, 33)
    act_hist: jnp.ndarray  # (..., 2, STACK, 12)


class ChaseTagObs(NamedTuple):
    """All leaves have an agent axis 2 after the batch axes."""

    prop: jnp.ndarray
    prop_a: jnp.ndarray
    percept_2d: jnp.ndarray
    percept_1d: jnp.ndarray
    percept_front: jnp.ndarray
    percept_vec: jnp.ndarray  # (..., 2, 5)
    oppo_info: jnp.ndarray  # (..., 2, 15)
    oppo_info_cheat: jnp.ndarray
    flag_info: jnp.ndarray  # (..., 2, 7)
    flag_info_cheat: jnp.ndarray
    with_flag: jnp.ndarray  # (..., 2, 2)
    control_spd: jnp.ndarray  # (..., 2, 1)


def _segment_visible(scene, p_from, p_to):
    """True when no active box blocks the segment."""
    d = p_to - p_from
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-8)
    t = boxes.ray_box_distance(
        scene, p_from[..., None, :], (d / dist)[..., None, :], jnp.inf
    )[..., 0]
    return t >= dist[..., 0]


def _convex_points(model, r: RobotState, kin=None):
    """(..., 2, 11, 3): base, front/hind handles, 4 feet, 4 wheels per robot
    — the reference's ray-target convex point set (legged_robot.py:150-156),
    with the base standing in for the trunk centroid."""
    if kin is None:
        kin = dynamics.forward_kinematics(model, r)
    Rm = quat.to_matrix(r.base_orn)
    dt = r.base_pos.dtype

    def off(o):
        return r.base_pos + jnp.einsum(
            "...ij,j->...i", Rm, jnp.asarray(o, dt)
        )

    return jnp.concatenate(
        [
            r.base_pos[..., None, :],
            off(HEAD_OFFSET)[..., None, :],
            off(HIND_OFFSET)[..., None, :],
            kin.p_foot,
            kin.p_wheel,
        ],
        axis=-2,
    ), kin


def _link_catch(model, r: RobotState, kin=None):
    """Reference _check_contact_status(robot 0) (:426-456,:442-450): any of
    robot 0's leg/wheel link spheres touching the other robot — evaluated
    against the opponent's trunk collision box (point SDF) and its own
    foot/wheel spheres, instead of Bullet contact points. Returns bool (...)."""
    if kin is None:
        kin = dynamics.forward_kinematics(model, r)
    legs0 = jnp.concatenate(
        [kin.p_foot[..., 0, :, :], kin.p_wheel[..., 0, :, :]], axis=-2
    )  # (..., 8, 3)
    pos1 = r.base_pos[..., 1, :]
    orn1 = r.base_orn[..., 1, :]
    local = quat.rotate_inv(
        orn1[..., None, :], legs0 - pos1[..., None, :]
    )  # (..., 8, 3)
    half = jnp.asarray(TRUNK_HALF, local.dtype)
    outside = jnp.maximum(jnp.abs(local) - half, 0.0)
    d_box = jnp.linalg.norm(outside, axis=-1)  # 0 inside the trunk box
    foot_r = jnp.asarray(model.foot_radius, local.dtype)
    hit_trunk = jnp.any(d_box < foot_r + CATCH_MARGIN, axis=-1)
    legs1 = jnp.concatenate(
        [kin.p_foot[..., 1, :, :], kin.p_wheel[..., 1, :, :]], axis=-2
    )
    d_pp = jnp.linalg.norm(
        legs0[..., :, None, :] - legs1[..., None, :, :], axis=-1
    )
    hit_leg = jnp.any(d_pp < 2.0 * foot_r + CATCH_MARGIN, axis=(-2, -1))
    return hit_trunk | hit_leg


def _robot_contact_impulse(model, cfg: ChaseTagConfig, r: RobotState):
    """Compliant trunk-trunk contact: one bounding sphere per trunk,
    spring-damper normal force integrated over one control step into the
    base velocities (Bullet: rigid contact via the solver on every body).
    Returns dv (..., 2, 3)."""
    d = r.base_pos[..., 0, :] - r.base_pos[..., 1, :]
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-6)
    n = d / dist
    overlap = jnp.maximum(2.0 * RR_RADIUS - dist, 0.0)
    v_rel = r.base_lin_vel[..., 0, :] - r.base_lin_vel[..., 1, :]
    vn = jnp.sum(v_rel * n, axis=-1, keepdims=True)
    f = jnp.where(overlap > 0.0, RR_KN * overlap - RR_DN * vn, 0.0)
    f = jnp.maximum(f, 0.0)  # unilateral: no sticking
    mass = float(model.base_mass + model.link_mass.sum())
    dv = (f * n) * (cfg.policy_dt / mass)
    return jnp.stack([dv, -dv], axis=-2)


def _observe(model, cfg: ChaseTagConfig, s: ChaseTagState) -> ChaseTagObs:
    r = s.robots
    pos = r.base_pos  # (..., 2, 3)
    orn = r.base_orn
    yaw = quat.yaw(orn)

    # scene queries per agent: scene leaves must broadcast over the agent axis
    scene_a = boxes.BoxScene(
        center=s.scene.center[..., None, :, :],
        half=s.scene.half[..., None, :, :],
        active=s.scene.active[..., None, :],
        target_pos=s.scene.target_pos[..., None, :],
    )
    p2d = boxes.perception_height(scene_a, pos, orn)
    p1d = boxes.lidar(scene_a, pos, yaw)
    pfront = boxes.perception_front(scene_a, pos, orn)
    pvec = jnp.concatenate(
        [pos, jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]], axis=-1
    )

    # opponent info
    oppo_pos = jnp.flip(pos, axis=-2)
    oppo_yaw = jnp.flip(yaw, axis=-1)
    oppo_lin = jnp.flip(r.base_lin_vel, axis=-2)
    oppo_ang = jnp.flip(r.base_ang_vel, axis=-2)
    diff = oppo_pos - pos
    # reference _ray_test_visible (:472-493): root->root segment first, then
    # a fan of rays from the head point to the opponent's convex points
    seg_vis = _segment_visible(scene_a, pos, oppo_pos)
    pts, _ = _convex_points(model, r)  # (..., 2, P, 3)
    head = pts[..., 1, :]  # front handle (..., 2, 3)
    oppo_pts = jnp.flip(pts, axis=-3)  # opponent's points per agent
    scene_ap = boxes.BoxScene(
        center=s.scene.center[..., None, None, :, :],
        half=s.scene.half[..., None, None, :, :],
        active=s.scene.active[..., None, None, :],
        target_pos=s.scene.target_pos[..., None, None, :],
    )
    ray_vis = jnp.any(
        _segment_visible(
            scene_ap, jnp.broadcast_to(head[..., None, :], oppo_pts.shape),
            oppo_pts,
        ),
        axis=-1,
    )
    seg_vis = seg_vis | ray_vis
    dxy = diff[..., :2]
    cos_theta = (
        jnp.cos(yaw) * dxy[..., 0] + jnp.sin(yaw) * dxy[..., 1]
    ) / jnp.linalg.norm(dxy, axis=-1).clip(1e-8)
    visible = seg_vis & (cos_theta >= jnp.cos(cfg.visible_angle))
    diff_local = quat.rotate_inv(orn, diff)
    yaw_diff = oppo_yaw - yaw
    oppo_state = jnp.concatenate(
        [
            visible[..., None].astype(pos.dtype),
            oppo_pos,
            diff_local,
            jnp.cos(yaw_diff)[..., None],
            jnp.sin(yaw_diff)[..., None],
            quat.rotate_inv(orn, oppo_lin),
            quat.rotate_inv(orn, oppo_ang),
        ],
        axis=-1,
    )
    oppo_info = jnp.where(visible[..., None], oppo_state, 0.0)

    # flag info (always visible, reference :560)
    flag = s.flag_pos[..., None, :]
    flag_diff_local = quat.rotate_inv(orn, flag - pos)
    ones = jnp.ones_like(yaw[..., None])
    flag_state = jnp.concatenate(
        [ones, jnp.broadcast_to(flag, pos.shape), flag_diff_local], axis=-1
    )

    wf = s.with_flag.astype(pos.dtype)
    with_flag = jnp.stack([wf, jnp.flip(wf, axis=-1)], axis=-2)
    return ChaseTagObs(
        prop=s.prop_hist.reshape(s.prop_hist.shape[:-2] + (-1,)),
        prop_a=s.act_hist.reshape(s.act_hist.shape[:-2] + (-1,)),
        percept_2d=p2d,
        percept_1d=p1d,
        percept_front=pfront,
        percept_vec=pvec,
        oppo_info=oppo_info,
        oppo_info_cheat=oppo_state,
        flag_info=flag_state,
        flag_info_cheat=flag_state,
        with_flag=with_flag,
        control_spd=jnp.broadcast_to(
            s.control_spd[..., None, None], yaw.shape + (1,)
        ),
    )


def reset(model, cfg: ChaseTagConfig, key, batch=()):
    import math

    ks = jax.random.split(key, 8)
    if cfg.version != "v4":  # fixed arena versions (GameManager parity)
        from lifelike_tpu.scene import arena_fixed

        scene = arena_fixed.make_arena(
            cfg.version, key=ks[0], height_offset=cfg.height_offset, batch=batch
        )
    elif batch == ():
        scene = arena_gen.generate(ks[0], cfg.arena)
    else:
        scene = jax.vmap(lambda k: arena_gen.generate(k, cfg.arena))(
            jax.random.split(ks[0], math.prod(batch))
        )
        scene = jax.tree.map(lambda x: x.reshape(batch + x.shape[1:]), scene)

    pos_xy = jax.random.uniform(ks[1], batch + (2, 2), minval=-2.0, maxval=2.0)
    # stand on whatever occupies the spawn point (fixed-arena blocks, v4
    # cubes) instead of spawning inside it and getting ejected by contact
    ground = boxes.heightmap_at(scene, pos_xy)
    pos = jnp.concatenate([pos_xy, (ground + 0.5)[..., None]], axis=-1)
    yaw0 = jax.random.uniform(ks[2], batch + (2,), maxval=2.0 * jnp.pi)
    robots = RobotState(
        base_pos=pos,
        base_orn=quat.from_yaw(yaw0),
        base_lin_vel=jnp.zeros(batch + (2, 3)),
        base_ang_vel=jnp.zeros(batch + (2, 3)),
        joint_pos=jnp.broadcast_to(_INIT_JOINTS, batch + (2, 12)),
        joint_vel=jnp.zeros(batch + (2, 12)),
    )
    flag_xy = jax.random.uniform(ks[3], batch + (2,), minval=-2.0, maxval=2.0)
    flag_pos = jnp.concatenate([flag_xy, jnp.full(batch + (1,), 0.25)], axis=-1)
    chaser0 = jax.random.bernoulli(ks[4], shape=batch)
    with_flag = jnp.stack([chaser0, ~chaser0], axis=-1)
    prop = _proprioception(robots)
    s = ChaseTagState(
        robots=robots,
        scene=scene,
        push=randomizer.push_reset(ks[5], cfg.push, cfg.policy_dt, batch),
        counter=jnp.zeros(batch, jnp.int32),
        with_flag=with_flag,
        flag_pos=flag_pos,
        control_spd=jax.random.uniform(
            ks[6], batch, minval=cfg.control_spd_range[0], maxval=cfg.control_spd_range[1]
        ),
        friction=jax.random.uniform(
            ks[7], batch, minval=cfg.friction_range[0], maxval=cfg.friction_range[1]
        ),
        total_spd=jnp.zeros(batch + (2,)),
        max_spd=jnp.zeros(batch + (2,)),
        prop_hist=jnp.repeat(prop[..., None, :], STACK, axis=-2),
        act_hist=jnp.zeros(batch + (2, STACK, ACTION_SIZE), prop.dtype),
    )
    return s, _observe(model, cfg, s)


def step(model, cfg: ChaseTagConfig, s: ChaseTagState, actions, key):
    """actions: dict with 'A_LLC' (..., 2, 12) (A_HLC/A_Z consumed upstream).

    Returns (state', obs, rewards (..., 2), done (...,), info).
    """
    a_llc = actions["A_LLC"] if isinstance(actions, dict) else actions
    k1, k2 = jax.random.split(key)

    push, ext_force = randomizer.push_step(k1, cfg.push, s.push, cfg.policy_dt)
    params = cfg.params._replace(
        foot_friction=s.friction[..., None, None], ext_force=ext_force[..., None, :]
    )
    scene_a = boxes.BoxScene(
        center=s.scene.center[..., None, :, :],
        half=s.scene.half[..., None, :, :],
        active=s.scene.active[..., None, :],
        target_pos=s.scene.target_pos[..., None, :],
    )
    target_q = s.robots.joint_pos + a_llc
    # Full box SDF contact: arena walls and blocks push back as hard bodies.
    robots = engine.control_step(model, params, s.robots, target_q, scene=scene_a)
    # compliant robot-robot trunk contact (Bullet: rigid solver contact)
    robots = robots._replace(
        base_lin_vel=robots.base_lin_vel
        + _robot_contact_impulse(model, cfg, robots)
    )

    counter = s.counter + 1
    spd = jnp.linalg.norm(robots.base_lin_vel[..., :2], axis=-1)  # (..., 2)
    total_spd = s.total_spd + spd
    max_spd = jnp.maximum(s.max_spd, spd)

    # flag grab: the non-chaser touching the flag swaps roles (:573-581)
    dist_flag = jnp.linalg.norm(
        (robots.base_pos - s.flag_pos[..., None, :])[..., :2], axis=-1
    )
    touch_flag = dist_flag < FLAG_RADIUS
    escapee_touches = jnp.any(touch_flag & ~s.with_flag, axis=-1)
    with_flag = jnp.where(escapee_touches[..., None], ~s.with_flag, s.with_flag)
    new_flag_xy = jax.random.uniform(k2, s.counter.shape + (2,), minval=-2.0, maxval=2.0)
    new_flag = jnp.concatenate(
        [new_flag_xy, jnp.full(s.counter.shape + (1,), 0.25)], axis=-1
    )
    flag_pos = jnp.where(escapee_touches[..., None], new_flag, s.flag_pos)

    # per-step reward: +-1 on the switch frame for the NEW chaser (:640-652)
    sw = escapee_touches.astype(spd.dtype)
    rewards = jnp.where(with_flag, sw[..., None], -sw[..., None])

    # terminations: the reference only checks robot 0's fall (:463)
    fall0 = tracking.fall_terminated(
        RobotState(*[getattr(robots, f)[..., 0, :] for f in robots._fields])
    )
    timeout = counter >= cfg.max_steps
    # catch = robot 0's leg/wheel links touching the other robot (:426-456)
    contact = _link_catch(model, robots)
    # integrator-blowup guard over EITHER robot (costs/tracking.blown_up:
    # NaN states compare False in fall0/contact and would never terminate)
    blown = jnp.any(tracking.blown_up(robots), axis=-1)
    done = fall0 | timeout | contact | blown

    # terminal +-1: chaser catches (:412-419)
    chaser_sign = jnp.where(with_flag, 1.0, -1.0)
    rewards = rewards + jnp.where(
        (contact & done)[..., None], chaser_sign, 0.0
    )

    prop = _proprioception(robots)
    s = s._replace(
        robots=robots,
        push=push,
        counter=counter,
        with_flag=with_flag,
        flag_pos=flag_pos,
        total_spd=total_spd,
        max_spd=max_spd,
        prop_hist=jnp.concatenate(
            [s.prop_hist[..., 1:, :], prop[..., None, :]], axis=-2
        ),
        act_hist=jnp.concatenate(
            [s.act_hist[..., 1:, :], a_llc[..., None, :]], axis=-2
        ),
    )
    obs = _observe(model, cfg, s)
    info = {
        "avg_spd0": total_spd[..., 0] / counter,
        "avg_spd1": total_spd[..., 1] / counter,
        "max_spd0": max_spd[..., 0],
        "max_spd1": max_spd[..., 1],
        "caught": contact,
    }
    return s, obs, rewards, done, info


def step_autoreset(model, cfg, s, actions, key):
    k1, k2 = jax.random.split(key)
    s2, obs, rewards, done, info = step(model, cfg, s, actions, k1)
    s_new, obs_new = reset(model, cfg, k2, s.counter.shape)

    def sel(a, b):
        d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
        return jnp.where(d, a, b)

    return (
        jax.tree.map(sel, s_new, s2),
        jax.tree.map(sel, obs_new, obs),
        rewards,
        done,
        info,
    )
