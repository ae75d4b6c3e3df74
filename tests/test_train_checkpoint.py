"""TrainCheckpoint: atomic full-state save/resume roundtrip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lifelike_tpu.learning import registry


def test_roundtrip_preserves_optax_state(tmp_path):
    path = str(tmp_path / "ck" / "train.pkl")
    ckpt = registry.TrainCheckpoint(path)
    assert ckpt.load() is None

    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(1e-3))
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    up, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, up)

    ckpt.save(7, params=params, opt_state=opt_state)
    st = ckpt.load()
    assert st["step"] == 7
    got_p, got_o = st["trees"]["params"], st["trees"]["opt_state"]
    np.testing.assert_allclose(
        got_p["dense"]["kernel"], np.asarray(params["dense"]["kernel"])
    )
    # optimizer state structure survives (adam mu/nu + counter)
    chex_ok = jax.tree.structure(got_o) == jax.tree.structure(opt_state)
    assert chex_ok
    # resumed state continues training identically
    up2a, _ = tx.update(grads, opt_state, params)
    up2b, _ = tx.update(grads, jax.tree.map(jnp.asarray, got_o), params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        up2a, up2b,
    )
    # atomic write left no temp file
    assert not os.path.exists(path + ".tmp")


def test_overwrite_keeps_latest(tmp_path):
    ckpt = registry.TrainCheckpoint(str(tmp_path / "t.pkl"))
    ckpt.save(0, x=jnp.zeros(3))
    ckpt.save(1, x=jnp.ones(3))
    st = ckpt.load()
    assert st["step"] == 1
    np.testing.assert_array_equal(st["trees"]["x"], np.ones(3))
