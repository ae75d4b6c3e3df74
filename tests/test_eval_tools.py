"""Pins for the eval tooling (tools/make_eval.py) that EVAL.md depends on.

The committed EVAL.md traversal numbers are produced by the UNFLOORED
controller: make_eval.skill_speed_floor must be inert unless its env-var
levers are explicitly set (the floors regressed every cube/hole seed on the
product eval stack — EVAL.md "Speed-floor experiment"). A silent default
change here would invalidate the committed tables.
"""
import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


@pytest.fixture(scope="module")
def me():
    spec = importlib.util.spec_from_file_location(
        "make_eval", os.path.join(_TOOLS, "make_eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Scene:
    """Minimal scene stand-in: one elevated bar + ground plane."""

    def __init__(self):
        self.center = np.array([[0.0, 0.0, -1.0], [3.0, 0.0, 0.35]],
                               np.float32)
        self.half = np.array([[50.0, 50.0, 1.0], [0.05, 1.0, 0.02]],
                             np.float32)
        self.active = np.array([True, True])


def test_speed_floor_inert_by_default(me, monkeypatch):
    for var in ("LIFELIKE_CLIMB_SPD", "LIFELIKE_CRAWL_SPD",
                "LIFELIKE_WALK_SPD_FLOOR"):
        monkeypatch.delenv(var, raising=False)
    scene = _Scene()
    pos = np.zeros(3, np.float32)
    for eid in (1, 2, 3):
        for gate in (-1, 0, 1):
            for spd in (0.4, 0.73, 1.24):
                out = me.skill_speed_floor(scene, pos, eid, gate,
                                           jnp.float32(spd))
                assert float(out) == pytest.approx(spd), (eid, gate, spd)


def test_speed_floor_opt_in(me, monkeypatch):
    scene = _Scene()
    pos = np.zeros(3, np.float32)
    monkeypatch.setenv("LIFELIKE_CLIMB_SPD", "1.3")
    assert float(me.skill_speed_floor(scene, pos, 3, 1,
                                      jnp.float32(0.9))) == pytest.approx(1.3)
    monkeypatch.setenv("LIFELIKE_CRAWL_SPD", "0.8")
    assert float(me.skill_speed_floor(scene, pos, 2, 1,
                                      jnp.float32(0.6))) == pytest.approx(0.8)
    # walk floor respects the bar-approach slowdown zone: inside 0.8 m of
    # the bar front face it must NOT override the 0.7 approach cap
    monkeypatch.setenv("LIFELIKE_WALK_SPD_FLOOR", "1.15")
    near = np.array([2.5, 0.0, 0.0], np.float32)  # bar front at x=2.95
    assert float(me.skill_speed_floor(scene, near, 2, 0,
                                      jnp.float32(0.7))) == pytest.approx(0.7)
    far = np.array([0.0, 0.0, 0.0], np.float32)
    assert float(me.skill_speed_floor(scene, far, 2, 0,
                                      jnp.float32(0.7))) == pytest.approx(1.15)


def test_approach_cap_zone(me):
    scene = _Scene()
    # inside 0.8 m of the bar front face (x=2.95): capped to 0.7
    assert me.approach_speed_cap(scene, np.array([2.3, 0, 0]), 2,
                                 1.3) == pytest.approx(0.7)
    # far away: passthrough
    assert me.approach_speed_cap(scene, np.array([0.0, 0, 0]), 2,
                                 1.3) == pytest.approx(1.3)
    # other elements: passthrough
    assert me.approach_speed_cap(scene, np.array([2.3, 0, 0]), 3,
                                 1.3) == pytest.approx(1.3)
