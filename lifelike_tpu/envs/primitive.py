"""Primitive-level (PMC) environment: batched mocap tracking, fully on-device.

Functional JAX re-design of the reference PrimitiveLevelEnv (reference
primitive_level_env/primitive_level_env.py): dynamic robot + kinematic
reference ghost, 50 Hz control / 500 Hz physics, observation dict
  prop   = stack of 3 x [joint_pos 12, joint_vel 12, root_ang_vel_loc 3,
                         root_lin_vel_loc 3, e_g 3]   (order per
           reference example_pmc_train.sh:73 prop_type list)
  prop_a = stack of 3 x last actions (12)
  future = 72-d future-goal features at +{1/30,1/15,1/3,1} s
action = delta joint positions (12) added to current joints and PD-held for
10 substeps. Reward is the 5-term tracking reward; termination on fall,
clip end, or dyn-kin divergence (reference :337-348).

Everything is a pure function over NamedTuple state with arbitrary leading
batch shape — thousands of envs run as one XLA program, replacing the
reference's one-env-per-actor-process farm (SURVEY.md section 2.3).
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lifelike_tpu.costs import tracking
from lifelike_tpu.math import quat
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import dynamics, engine
from lifelike_tpu.physics.dynamics import RobotState
from lifelike_tpu.solver.rollout import ref_foot_positions

PROP_SIZE = 33
ACTION_SIZE = 12
FUTURE_SIZE = 72
STACK = 3


class PrimitiveEnvConfig(NamedTuple):
    params: engine.PhysicsParams = engine.PhysicsParams()
    weights: tracking.TrackingWeights = tracking.TrackingWeights(
        # canonical training weights, reference example_pmc_train.sh:78
        joint_pos=0.3, joint_vel=0.05, end_effector=0.1, root_pose=0.5, root_vel=0.05
    )
    set_obstacle: bool = False  # jump-event obstacles (reference :173-193)
    obstacle_height: float = 0.2

    @property
    def policy_dt(self):
        return self.params.dt * self.params.substeps


class PrimitiveEnvState(NamedTuple):
    robot: RobotState
    t: jnp.ndarray  # (...,) clip time in seconds
    clip_idx: jnp.ndarray  # (...,) int32
    prop_hist: jnp.ndarray  # (..., STACK, PROP_SIZE)
    act_hist: jnp.ndarray  # (..., STACK, ACTION_SIZE)
    steps: jnp.ndarray  # (...,) int32 episode steps
    ep_ret: jnp.ndarray  # (...,) accumulated episode reward (resampling stats)


class Observation(NamedTuple):
    prop: jnp.ndarray  # (..., STACK*PROP_SIZE)
    prop_a: jnp.ndarray  # (..., STACK*ACTION_SIZE)
    future: jnp.ndarray  # (..., FUTURE_SIZE)


def _proprioception(state: RobotState):
    """33-d proprioceptive features (reference primitive_level_env.py:247-254,
    order per the canonical prop_type list)."""
    lin_loc = quat.rotate_inv(state.base_orn, state.base_lin_vel)
    ang_loc = quat.rotate_inv(state.base_orn, state.base_ang_vel)
    e_g = quat.to_matrix(state.base_orn)[..., 2, :]
    return jnp.concatenate(
        [state.joint_pos, state.joint_vel, ang_loc, lin_loc, e_g], axis=-1
    )


def _observe(clips, cfg, env: PrimitiveEnvState) -> Observation:
    fut = motion_lib.sample_future(clips, env.clip_idx, env.t)
    future = motion_lib.future_goal_features(
        env.robot.base_pos, env.robot.base_orn, fut
    )
    return Observation(
        prop=env.prop_hist.reshape(env.prop_hist.shape[:-2] + (-1,)),
        prop_a=env.act_hist.reshape(env.act_hist.shape[:-2] + (-1,)),
        future=future,
    )


def _frame_to_robot(ref: motion_lib.FrameState) -> RobotState:
    return RobotState(
        base_pos=ref.base_pos,
        base_orn=ref.base_orn,
        base_lin_vel=ref.base_lin_vel,
        base_ang_vel=ref.base_ang_vel,
        joint_pos=ref.joint_pos,
        joint_vel=ref.joint_vel,
    )


def reset(model, clips, cfg: PrimitiveEnvConfig, key, clip_probs=None, batch=()):
    """Sample clip + phase and initialize from the interpolated frame
    (reference motion_lib.py:48-57 random-phase reset)."""
    k1, k2 = jax.random.split(key)
    n = clips.num_clips
    if clip_probs is None:
        clip_probs = jnp.full((n,), 1.0 / n)
    clip_idx = jax.random.choice(k1, n, shape=batch, p=clip_probs)
    dtype = clips.frames.dtype
    duration = (
        (jnp.asarray(clips.lengths)[clip_idx] - clips.margin - 1).astype(dtype)
        * clips.frame_step
    )
    t0 = jax.random.uniform(k2, batch, dtype=dtype) * duration
    ref = motion_lib.sample_frame(clips, clip_idx, t0)
    robot = _frame_to_robot(ref)
    prop = _proprioception(robot)
    env = PrimitiveEnvState(
        robot=robot,
        t=t0,
        clip_idx=clip_idx,
        prop_hist=jnp.repeat(prop[..., None, :], STACK, axis=-2),
        act_hist=jnp.zeros(batch + (STACK, ACTION_SIZE), prop.dtype),
        steps=jnp.zeros(batch, jnp.int32),
        ep_ret=jnp.zeros(batch, prop.dtype),
    )
    return env, _observe(clips, cfg, env)


def step(model, clips, cfg: PrimitiveEnvConfig, env: PrimitiveEnvState, action,
         obstacles=None):
    """One 50 Hz step. Returns (env', obs, reward, done, info).

    obstacles: optional motion_lib.ObstacleEvents — when cfg.set_obstacle, the
    clip's jump obstacle terminates the episode on contact (reference
    :337-348 done_collision)."""
    action = jnp.asarray(action, env.robot.joint_pos.dtype)
    target_q = env.robot.joint_pos + action
    robot = engine.control_step(model, cfg.params, env.robot, target_q)
    t = env.t + cfg.policy_dt

    ref = motion_lib.sample_frame(clips, env.clip_idx, t)
    kin = dynamics.forward_kinematics(model, robot)
    ref_feet = ref_foot_positions(model, ref)
    reward = tracking.tracking_reward(robot, kin.p_foot, ref, ref_feet, cfg.weights)

    fall = tracking.fall_terminated(robot)
    ended = motion_lib.is_ended(clips, env.clip_idx, t)
    diverged = tracking.divergence_terminated(robot, ref)
    blown = tracking.blown_up(robot)
    done = fall | ended | diverged | blown
    # a blown-up row's reward is NaN/garbage; zero it so the (T, B) PPO
    # batch stays finite (the row resets via step_autoreset)
    reward = jnp.where(blown, jnp.zeros_like(reward), reward)
    if cfg.set_obstacle and obstacles is not None:
        oxy, oyaw, oactive = motion_lib.current_obstacle(obstacles, env.clip_idx, t)
        pts = jnp.concatenate([kin.p_foot, robot.base_pos[..., None, :]], axis=-2)
        collided = motion_lib.obstacle_collision(
            oxy, oyaw, cfg.obstacle_height, pts
        ) & oactive
        done = done | collided

    prop = _proprioception(robot)
    ep_ret = env.ep_ret + reward
    env = PrimitiveEnvState(
        robot=robot,
        t=t,
        clip_idx=env.clip_idx,
        prop_hist=jnp.concatenate(
            [env.prop_hist[..., 1:, :], prop[..., None, :]], axis=-2
        ),
        act_hist=jnp.concatenate(
            [env.act_hist[..., 1:, :], action[..., None, :]], axis=-2
        ),
        steps=env.steps + 1,
        ep_ret=ep_ret,
    )
    obs = _observe(clips, cfg, env)
    # episode average reward normalized by the CLIP's max steps, as the
    # reference does for prioritized resampling (primitive_level_env.py:236)
    max_steps = (
        (jnp.asarray(clips.lengths)[env.clip_idx] - clips.margin).astype(ep_ret.dtype)
        * clips.frame_step / cfg.policy_dt
    )
    info = {
        "fall": fall, "clip_ended": ended, "diverged": diverged,
        "ep_avg_reward": ep_ret / jnp.maximum(max_steps, 1.0),
    }
    return env, obs, reward, done, info


def step_autoreset(model, clips, cfg, env, action, key, clip_probs=None):
    """Step + masked re-initialization of done episodes (no Python branching:
    done rows are overwritten with freshly sampled reset states)."""
    env2, obs, reward, done, info = step(model, clips, cfg, env, action)
    batch = env.t.shape
    env_reset, obs_reset = reset(model, clips, cfg, key, clip_probs, batch)

    def sel(a, b):
        d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
        return jnp.where(d, a, b)

    env3 = jax.tree.map(sel, env_reset, env2)
    obs3 = jax.tree.map(sel, obs_reset, obs)
    return env3, obs3, reward, done, info
