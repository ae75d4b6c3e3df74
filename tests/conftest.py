"""Test configuration: run everything on a virtual 8-device CPU mesh.

The image boots every interpreter through an axon sitecustomize that
registers a remote-TPU backend and sets jax.config jax_platforms='axon,cpu'
(overriding the JAX_PLATFORMS env var). Unit tests must stay local: the
tunnel is single-tenant and slow per dispatch. jax.config.update after
import — before any backend is instantiated — wins.

Multi-chip sharding paths are validated on fake CPU devices
(xla_force_host_platform_device_count); real-TPU perf is bench.py's job.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
