"""Env factory: reference-compatible construction API for the three tasks.

Parity with reference create_pybullet_envs.py: the same `env_config` flat-dict
vocabulary (arena_id, control_freq, kp/kd/max_tau, data_path, prop_type,
element_id, friction ranges, ...) builds the corresponding batched functional
env. `create_*_game` returns the multi-agent (tuple) form the reference actors
consume; `create_*_env` the single-agent form (reference SingleAgentWrapper
:6-18 just tuple-izes — here both share one EnvBundle and the tuple-ization
is a flag).

The bundle exposes pure functions (reset/step/step_autoreset) closed over the
model + config; everything jit/vmap/shard-ready.
"""
from typing import Any, Callable, NamedTuple

from lifelike_tpu.envs import chase_tag, playground, primitive, randomizer
from lifelike_tpu.motion import motion_lib
from lifelike_tpu.physics import engine
from lifelike_tpu.robot.model import build_max_model
from lifelike_tpu.scene import arena_gen, playground_gen


class EnvBundle(NamedTuple):
    name: str
    model: Any
    cfg: Any
    reset: Callable  # (key, batch=()) -> (state, obs)
    step: Callable  # (state, action, key) -> (state, obs, reward, done, info)
    step_autoreset: Callable
    num_agents: int
    clips: Any = None


def _physics(env_config, kd_default, tau_default):
    return engine.PhysicsParams(
        kp=env_config.get("kp", 50.0),
        kd=env_config.get("kd", kd_default),
        max_tau=env_config.get("max_tau", tau_default),
        foot_friction=env_config.get("foot_lateral_friction", 0.5),
        substeps=int(
            env_config.get("sim_freq", 500.0) / env_config.get("control_freq", 50.0)
        ),
    )


def create_tracking_game(**env_config) -> EnvBundle:
    """PMC mocap-tracking env (reference create_pybullet_envs.py:21-64)."""
    assert env_config.get("arena_id", "LeggedRobotTracking") == "LeggedRobotTracking"
    model = build_max_model()
    clips = motion_lib.load_clips(
        env_config["data_path"],
        policy_step=1.0 / env_config.get("control_freq", 50.0),
    )
    rw = env_config.get("reward_weights", None)
    cfg = primitive.PrimitiveEnvConfig(
        params=_physics(env_config, kd_default=0.5, tau_default=18.0),
        weights=(
            primitive.tracking.TrackingWeights(**rw)
            if rw
            else primitive.PrimitiveEnvConfig().weights
        ),
    )
    return EnvBundle(
        name="tracking",
        model=model,
        cfg=cfg,
        reset=lambda key, batch=(): primitive.reset(model, clips, cfg, key, batch=batch),
        step=lambda s, a, key=None: primitive.step(model, clips, cfg, s, a),
        step_autoreset=lambda s, a, key: primitive.step_autoreset(
            model, clips, cfg, s, a, key
        ),
        num_agents=1,
        clips=clips,
    )


def create_playground_game(**env_config) -> EnvBundle:
    """EPMC terrain-traversal env (reference create_pybullet_envs.py:67-101)."""
    rz = env_config.get("env_randomize_config", {})
    push_cfg = randomizer.PushConfig(
        **{
            k: v
            for k, v in rz.get("disturb_force_config", {}).items()
            if k in randomizer.PushConfig._fields
        }
    )
    model = build_max_model()
    cfg = playground.PlaygroundConfig(
        params=_physics(env_config, kd_default=1.0, tau_default=16.0),
        scene=playground_gen.PlaygroundConfig(
            element_id=rz.get("element_id", 0),
            **(
                {"hole_min_gap": rz["hole_config"].get("min_gap_height", 0.25),
                 "hole_max_gap": rz["hole_config"].get("max_gap_height", 0.3)}
                if rz.get("element_id", 0) == 2 and "hole_config" in rz
                else {}
            ),
        ),
        push=push_cfg,
        max_steps=env_config.get("max_steps", 1000),
        friction_range=tuple(rz.get("friction_range", (0.4, 3.0))),
        target_spd_range=tuple(rz.get("target_spd_range", (0.5, 3.0))),
        cmd_vary_freq_range=tuple(rz.get("cmd_vary_freq_range", (25, 200))),
        # hard_contact=True steps the env on the impulse PGS plant
        # (physics/impulse.py box rows) — the fidelity/eval mode
        hard_contact=bool(env_config.get("hard_contact", False)),
    )
    return EnvBundle(
        name="playground",
        model=model,
        cfg=cfg,
        reset=lambda key, batch=(): playground.reset(model, cfg, key, batch=batch),
        step=lambda s, a, key: playground.step(model, cfg, s, a, key),
        step_autoreset=lambda s, a, key: playground.step_autoreset(
            model, cfg, s, a, key
        ),
        num_agents=1,
    )


def create_chase_tag_game(**env_config) -> EnvBundle:
    """SEPMC two-robot Chase Tag (reference create_pybullet_envs.py:104-140)."""
    rz = env_config.get("env_randomize_config", {})
    el = rz.get("element_config", {})
    model = build_max_model()
    cfg = chase_tag.ChaseTagConfig(
        params=_physics(env_config, kd_default=1.0, tau_default=16.0)._replace(
            substeps=int(
                env_config.get("sim_freq", 500.0) / env_config.get("control_freq", 25.0)
            )
        ),
        arena=arena_gen.ArenaConfig(
            rand_cube=bool(el.get("rand_cube", False)),
            hurdle=bool(el.get("hurdle", False)),
            hole=bool(el.get("hole", False)),
        ),
        version=env_config.get("version", "v4"),
        height_offset=tuple(rz.get("height_offset", (0.0, 0.0))),
        max_steps=env_config.get("max_steps", 1000),
        friction_range=tuple(rz.get("friction_range", (0.4, 1.0))),
        visible_angle=env_config.get("visible_angle", 3.141592653589793),
    )
    return EnvBundle(
        name="chase_tag",
        model=model,
        cfg=cfg,
        reset=lambda key, batch=(): chase_tag.reset(model, cfg, key, batch=batch),
        step=lambda s, a, key: chase_tag.step(model, cfg, s, a, key),
        step_autoreset=lambda s, a, key: chase_tag.step_autoreset(model, cfg, s, a, key),
        num_agents=2,
    )


# single-agent aliases (reference create_*_env unwrappers :143-161): the
# functional bundles are identical; learners only need spaces/shapes.
create_tracking_env = create_tracking_game
create_playground_env = create_playground_game
create_chase_tag_env = create_chase_tag_game
