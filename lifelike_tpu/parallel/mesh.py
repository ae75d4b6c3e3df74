"""Device mesh + sharding helpers for scenario-parallel scale-out.

The reference scales by launching actor processes over ZMQ and Horovod
allreduce across learner GPUs (SURVEY.md section 2.3). The TPU design is a
single SPMD program: one mesh axis 'batch' shards scenarios/environments;
parameters are replicated (the nets are tiny, section 2.3: no TP/PP needed);
gradient and statistics reductions become psum/pmean over the mesh, riding
ICI within a slice and DCN across hosts via jax.distributed.
"""
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BATCH_AXIS = "batch"


def make_mesh(n_devices=None, axis=BATCH_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh):
    """Shard leading axis over the batch mesh axis."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree whose leaves have a leading batch axis onto the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
