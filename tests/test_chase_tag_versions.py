"""Chase-Tag env on fixed arena versions (GameManager selector parity)."""
import jax
import numpy as np

from lifelike_tpu.envs import chase_tag, factory


def test_chase_tag_runs_on_v2_arena():
    env = factory.create_chase_tag_game(
        version="v2",
        env_randomize_config={"height_offset": (0.0, 0.1)},
    )
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key, batch=(2,))
    from lifelike_tpu.scene import arena_fixed

    assert state.scene.center.shape == (2, arena_fixed.CAPACITY, 3)
    act = {
        "A_HLC": np.zeros((2, 2, 1), np.float32),
        "A_Z": np.zeros((2, 2), np.int32),
        "A_LLC": np.zeros((2, 2, 12), np.float32),
    }
    act = jax.tree.map(jax.numpy.asarray, act)
    state, obs, rew, done, info = env.step(state, act, jax.random.PRNGKey(1))
    assert obs.prop.shape[:2] == (2, 2)
    assert np.all(np.isfinite(np.asarray(obs.percept_2d)))
