"""Profiling subsystem: cost analysis, roofline math, chained latency."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from lifelike_tpu.utils import profiling as P


def test_cost_analysis_matmul_flops():
    a = jnp.zeros((256, 256), jnp.float32)
    ca = P.cost_analysis(lambda x: x @ x, a)
    if not ca:  # backend without a cost model: nothing to assert
        return
    # XLA counts 2*M*N*K for a matmul.
    assert abs(ca["flops"] - 2 * 256**3) / (2 * 256**3) < 0.2, ca["flops"]
    assert ca.get("bytes accessed", 0) >= 2 * 256 * 256 * 4


def test_speed_of_light_explicit_counts():
    spec = P.ChipSpec("fake", 1e12, 2e12, 1e11, 1 << 20)
    r = P.speed_of_light(
        flops=1e9, bytes_accessed=1e7, spec=spec, measured_s=2e-3
    )
    assert np.isclose(r.t_compute_s, 1e-3)
    assert np.isclose(r.t_memory_s, 1e-4)
    assert r.bound == "compute" and np.isclose(r.sol_s, 1e-3)
    assert np.isclose(r.achieved_fraction, 0.5)
    assert "50.0% of speed of light" in P.format_report(r)


def test_speed_of_light_memory_bound_from_fn():
    # Elementwise add: ~n flops vs 3*4n bytes -> memory-bound on any chip.
    x = jnp.zeros((1 << 16,), jnp.float32)
    r = P.speed_of_light(lambda a: a + a, x, spec=P.CHIP_SPECS["TPU v5e"])
    if r.flops == 0 and r.bytes_accessed == 0:
        return  # no cost model on this backend
    assert r.bound == "memory"


def test_detect_chip_substring_and_fallback():
    class Dev:
        device_kind = "TPU v5e chip"

    assert P.detect_chip(Dev()).name == "TPU v5e"

    class Unk:
        device_kind = "weird"

    assert P.detect_chip(Unk()).name == "weird"


def test_chained_latency_positive_and_sane():
    def step(s):
        return s @ s * 0.999 + 1e-3

    s = jnp.eye(128, dtype=jnp.float32)
    dt = P.chained_latency(step, s, m_lo=2, m_hi=10, reps=2)
    assert 0.0 <= dt < 1.0, dt


def test_trace_writes_events(tmp_path):
    logdir = str(tmp_path / "trace")
    with P.trace(logdir):
        with P.annotate("unit-test-region"):
            jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files
