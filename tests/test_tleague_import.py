"""Import of the reference's pretrained TLeague checkpoints.

The five reference ``data/models/*.model`` files are joblib/pickle payloads
of flat TF1 variable lists (SURVEY.md §2.4). These tests pin:
  * stub unpickling without tleague (both plain-pickle and joblib layouts),
  * the PMC positional variable map (28 vars -> PMCNet params),
  * the frozen-LLC hand-off invariant: every higher-level checkpoint embeds
    the PMC LLC + codebook bitwise (reference epmc_net.py:166-174),
  * behavior: the imported pretrained PMC tracks mocap far better than a
    random-init policy in the TPU-native env (end-to-end obs/rms/codebook/
    LLC layout check against the reference's own trained weights).
"""
import os

import jax
import numpy as np
import pytest

from lifelike_tpu.compat import tleague_import as TI

MODELS = "/root/reference/data/models"
MOCAP = "/root/reference/data/mocap_data"

needs_assets = pytest.mark.skipif(
    not os.path.isdir(MODELS), reason="reference assets not present"
)


@needs_assets
def test_load_all_checkpoints():
    sizes = {
        "primitive_level": 28,
        "environmental_level_hurdle": 102,
        "environmental_level_hole": 102,  # joblib numpy-pickle layout
        "environmental_level_cube": 102,
        "strategic_level": 152,
    }
    for name, n in sizes.items():
        m = TI.load_tleague_model(f"{MODELS}/{name}.model")
        assert len(m.arrays) == n, (name, len(m.arrays))
        assert all(isinstance(a, np.ndarray) for a in m.arrays)


@needs_assets
def test_pmc_import_shapes_and_rms_semantics():
    import jax.numpy as jnp

    from lifelike_tpu.models.pmc import PMCNet

    net = PMCNet()
    key = jax.random.PRNGKey(0)
    tmpl = net.init(key, jnp.zeros((2, 99)), jnp.zeros((2, 36)), jnp.zeros((2, 72)))
    params = TI.import_pmc(f"{MODELS}/primitive_level.model", tmpl)

    m = TI.load_tleague_model(f"{MODELS}/primitive_level.model")
    p = params["params"]
    # positional map spot checks (rms mean/std order per layers.py:40-56)
    assert np.array_equal(p["prop_rms"]["moving_mean"], m.arrays[0].reshape(-1))
    assert np.array_equal(p["prop_rms"]["moving_std"], m.arrays[1].reshape(-1))
    assert np.array_equal(p["llc"]["embedding"], m.arrays[16])
    assert np.array_equal(p["llc"]["head"]["logstd"], m.arrays[27].reshape(-1))
    # trained moving_std must be positive and non-trivial
    assert float(p["prop_rms"]["moving_std"].min()) > 0.0


@needs_assets
def test_frozen_llc_identical_across_all_levels():
    llc_pmc = TI.extract_frozen_llc(f"{MODELS}/primitive_level.model")
    for name in [
        "environmental_level_hurdle",
        "environmental_level_hole",
        "environmental_level_cube",
        "strategic_level",
    ]:
        llc = TI.extract_frozen_llc(f"{MODELS}/{name}.model")
        for a, b in zip(jax.tree.leaves(llc), jax.tree.leaves(llc_pmc)):
            assert np.array_equal(a, b), name


@needs_assets
def test_import_llc_into_epmc_params():
    import jax.numpy as jnp

    from lifelike_tpu.models.epmc import EPMCNet

    net = EPMCNet()
    key = jax.random.PRNGKey(0)
    obs = {
        "prop": jnp.zeros((99,)),
        "prop_a": jnp.zeros((36,)),
        "percep_2d": jnp.zeros((25, 13)),
        "percep_1d": jnp.zeros((128,)),
        "percep_front": jnp.zeros((25, 13)),
        "target": jnp.zeros((3,)),
    }
    hs = net.initial_state(())
    tmpl = net.init({"params": key, "z": key}, obs, hs, jnp.zeros(()))
    out = TI.import_llc_into(tmpl, f"{MODELS}/environmental_level_hurdle.model")
    llc = TI.extract_frozen_llc(f"{MODELS}/primitive_level.model")
    assert np.array_equal(out["params"]["llc"]["embedding"], llc["embedding"])
    assert np.array_equal(
        out["params"]["llc"]["decoder"]["Dense_0"]["kernel"],
        llc["decoder"]["Dense_0"]["kernel"],
    )


@needs_assets
def test_epmc_import_positional_map():
    import jax.numpy as jnp

    from lifelike_tpu.models.epmc import EPMCNet

    net = EPMCNet()
    key = jax.random.PRNGKey(0)
    obs = {
        "prop": jnp.zeros((99,)),
        "prop_a": jnp.zeros((36,)),
        "percep_2d": jnp.zeros((25, 13)),
        "percep_1d": jnp.zeros((128,)),
        "percep_front": jnp.zeros((25, 13)),
        "target": jnp.zeros((3,)),
    }
    tmpl = net.init(
        {"params": key, "z": key}, obs, net.initial_state(()), jnp.zeros(())
    )
    params = TI.import_epmc(f"{MODELS}/environmental_level_hurdle.model", tmpl)
    m = TI.load_tleague_model(f"{MODELS}/environmental_level_hurdle.model")
    p = params["params"]
    assert np.array_equal(p["vf_lstm"]["wx"], m.arrays[36])
    assert np.array_equal(p["pi_lstm"]["wh"], m.arrays[80])
    assert np.array_equal(p["z_out"]["kernel"], m.arrays[88])
    assert np.array_equal(p["llc"]["embedding"], m.arrays[90])
    # gradient-tied bias evidence: b, ln_x_beta, ln_h_beta near-identical
    assert np.allclose(p["vf_lstm"]["b"], p["vf_lstm"]["ln_x_beta"], atol=1e-5)
    assert np.array_equal(p["vf_lstm"]["ln_x_beta"], p["vf_lstm"]["ln_h_beta"])


@needs_assets
def test_sepmc_import_positional_map():
    import jax.numpy as jnp

    from lifelike_tpu.models.sepmc import SEPMCNet

    net = SEPMCNet()
    key = jax.random.PRNGKey(0)
    obs = {
        "prop": jnp.zeros((99,)),
        "prop_a": jnp.zeros((36,)),
        "percept_2d": jnp.zeros((25, 13)),
        "percept_1d": jnp.zeros((128,)),
        "percept_front": jnp.zeros((25, 13)),
        "percept_vec": jnp.zeros((5,)),
        "oppo_info": jnp.zeros((15,)),
        "oppo_info_cheat": jnp.zeros((15,)),
        "flag_info": jnp.zeros((7,)),
        "flag_info_cheat": jnp.zeros((7,)),
        "with_flag": jnp.zeros((2,)),
        "control_spd": jnp.zeros((1,)),
    }
    tmpl = net.init(
        {"params": key, "hlc": key, "z": key},
        obs,
        net.initial_state(()),
        jnp.zeros(()),
    )
    params = TI.import_sepmc(f"{MODELS}/strategic_level.model", tmpl)
    m = TI.load_tleague_model(f"{MODELS}/strategic_level.model")
    p = params["params"]
    assert np.array_equal(p["vf_fc1"]["kernel"], m.arrays[2])
    assert np.array_equal(p["vf_fc4"]["kernel"], m.arrays[38])
    assert np.array_equal(p["hlc_mu"]["kernel"], m.arrays[94])
    assert np.array_equal(p["hlc_logvar"], m.arrays[96].reshape(-1))
    assert np.array_equal(p["mlc_cmd"]["vec_fc"]["kernel"], m.arrays[123])
    assert np.array_equal(p["llc"]["embedding"], m.arrays[140])


@needs_assets
@pytest.mark.skipif(not os.path.isdir(MOCAP), reason="mocap assets not present")
def test_imported_pmc_tracks_better_than_random():
    from lifelike_tpu.envs import factory
    from lifelike_tpu.models.pmc import PMCNet

    bundle = factory.create_tracking_game(data_path=MOCAP)
    net = PMCNet()
    key = jax.random.PRNGKey(0)
    env_state, obs = bundle.reset(key)
    params0 = net.init(key, obs.prop, obs.prop_a, obs.future)
    params1 = TI.import_pmc(f"{MODELS}/primitive_level.model", params0)
    fwd = jax.jit(lambda p, o: net.apply(p, o.prop, o.prop_a, o.future).mean)
    step = jax.jit(bundle.step)

    def run(params, seed, max_steps=120):
        env_state, obs = bundle.reset(jax.random.PRNGKey(seed))
        ret, steps = 0.0, 0
        for _ in range(max_steps):
            env_state, obs, r, done, _ = step(env_state, fwd(params, obs))
            ret += float(r)
            steps += 1
            if bool(done):
                break
        return ret, steps

    r_rand, _ = run(params0, 102)
    r_pre, n_pre = run(params1, 102)
    # pretrained reference weights must clearly beat random init
    assert r_pre > 2.0 * r_rand, (r_pre, r_rand)
    assert n_pre >= 50, n_pre  # survives at least 1 s of tracking


@needs_assets
def test_imported_epmc_locomotes():
    """The pretrained hurdle EPMC drives the robot forward (~1 m/s) where a
    random-init policy stands still — validates the LSTM parametrization and
    gate order (i,f,o,u) inferred for tpolicies' lstm_embed_block."""
    import jax.numpy as jnp

    from lifelike_tpu.envs import factory
    from lifelike_tpu.models.epmc import EPMCNet

    bundle = factory.create_playground_game(env_randomize_config={"element_id": 1})
    net = EPMCNet()
    key = jax.random.PRNGKey(0)
    env_state, obs = bundle.reset(key)
    flat = lambda o: {f: getattr(o, f) for f in o._fields}
    hs0 = net.initial_state(())
    p0 = net.init({"params": key, "z": key}, flat(obs), hs0, jnp.zeros(()))
    p1 = TI.import_epmc(f"{MODELS}/environmental_level_hurdle.model", p0)
    fwd = jax.jit(lambda p, o, h, k: net.apply(p, o, h, jnp.zeros(()), rngs={"z": k}))
    step = jax.jit(lambda s, a, k: bundle.step(s, a, k))

    def avg_spd(params, seed, steps=100):
        k = jax.random.PRNGKey(seed)
        env_state, obs = bundle.reset(jax.random.PRNGKey(seed))
        hs = hs0
        info = None
        for _ in range(steps):
            k, k1, k2 = jax.random.split(k, 3)
            out = fwd(params, flat(obs), hs, k1)
            hs = out.hs
            env_state, obs, r, done, info = step(
                env_state, {"A_Z": out.z_idx, "A_LLC": out.mean}, k2
            )
            if bool(done):
                break
        return float(info.ave_spd if hasattr(info, "ave_spd") else info["ave_spd"])

    s_pre = avg_spd(p1, 200)
    s_rand = avg_spd(p0, 200)
    assert s_pre > 0.5, s_pre
    assert s_pre > 4.0 * max(s_rand, 0.01), (s_pre, s_rand)


def test_unpickler_blocks_malicious_globals(tmp_path):
    """The .model files are untrusted content: a pickle that REDUCEs through
    os.system (or any non-allowlisted global) must raise, not execute."""
    import pickle

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned",))

    bad = tmp_path / "evil.model"
    bad.write_bytes(pickle.dumps({"model": Evil()}))
    with pytest.raises(Exception) as ei:
        TI.load_tleague_model(str(bad))
    assert "blocked" in str(ei.value) or "Unpickling" in type(ei.value).__name__

    class DunderChain:
        def __reduce__(self):
            return (getattr, (int, "__class__"),)

    bad2 = tmp_path / "dunder.model"
    bad2.write_bytes(pickle.dumps({"model": DunderChain()}))
    with pytest.raises(Exception):
        TI.load_tleague_model(str(bad2))


def test_extract_frozen_llc_rejects_foreign_lengths():
    """A truncated/foreign array list must not silently yield a wrong LLC."""
    with pytest.raises(ValueError):
        TI.extract_frozen_llc([np.zeros((32, 256))] * 30)
