"""Multi-host execution: jax.distributed glue for DCN scale-out.

The reference scales training across machines by Horovod rank: each process
picks its learner spec from `hvd.rank()` and allreduces gradients over
NCCL/MPI (reference bin/run_pg_learner.py:76-85). The TPU-native equivalent
is one SPMD program joined across hosts through `jax.distributed.initialize`:
every process sees the GLOBAL device list, one `Mesh` spans all of them, and
the same `jit` + `NamedSharding` programs that run single-host now place the
batch/scenario axis across hosts — XLA's collectives ride ICI inside a slice
and DCN between hosts, with no separate comm library.

On CPU test rigs (this container, CI) the identical code path runs with
gloo collectives over localhost: each process hosts
`xla_force_host_platform_device_count` virtual devices and the 2x4-device
"pod" is exercised end-to-end by tests/test_multihost.py via
tools/multihost_worker.py.

Env-var contract (used by tools/launch_multihost.py and the run_learner
flags): LIFELIKE_COORDINATOR host:port, LIFELIKE_NUM_PROCESSES,
LIFELIKE_PROCESS_ID, LIFELIKE_LOCAL_DEVICES (CPU rigs only).
"""
import os

import numpy as np


def initialize(coordinator=None, num_processes=None, process_id=None,
               cpu=False, local_devices=None):
    """Join (or skip, when single-process) the jax.distributed runtime.

    Must run before the first JAX backend touch. Arguments default from the
    LIFELIKE_* env vars so launcher-spawned workers need no flag plumbing.
    Returns True when a multi-process runtime was initialized.
    """
    coordinator = coordinator or os.environ.get("LIFELIKE_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("LIFELIKE_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("LIFELIKE_PROCESS_ID", "0"))
    if local_devices is None and os.environ.get("LIFELIKE_LOCAL_DEVICES"):
        local_devices = int(os.environ["LIFELIKE_LOCAL_DEVICES"])

    if cpu or local_devices:
        # CPU rig: per-process virtual devices + gloo collectives. The flag
        # must be set before the backend initializes.
        n = local_devices or 4
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            )
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    else:
        import jax  # noqa: F401

    if num_processes <= 1:
        return False
    if not coordinator:
        raise ValueError(
            "multi-process run needs a coordinator address "
            "(--coordinator or LIFELIKE_COORDINATOR)"
        )
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_main():
    import jax

    return jax.process_index() == 0


def global_mesh(axis="batch"):
    """Mesh over ALL processes' devices (== parallel.mesh.make_mesh when
    single-process)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def host_local_batch(mesh, tree, axis="batch"):
    """Assemble globally-sharded arrays from per-process local shards.

    Each process passes its LOCAL slice of the batch (leading axis); the
    returned pytree is sharded over `axis` of the global mesh with global
    leading size num_processes * local. Single-process: plain device_put.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    nproc = jax.process_count()
    if nproc == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def place(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(place, tree)


def host_local_axis(mesh, tree, axis_idx, axis="batch"):
    """host_local_batch for a NON-leading batch axis.

    The recurrent replay buffer's data leaves are (slots, W, B, ...) —
    the env batch sits at axis 2 (learning/replay.py windows) — so sharding
    them across processes needs a PartitionSpec with `axis` at `axis_idx`.
    Leaves with <= axis_idx dims (the replay cursor/filled scalars) are
    replicated instead: every process advances them identically inside the
    SPMD step.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    nproc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        if x.ndim <= axis_idx:
            sh = NamedSharding(mesh, P())
            if nproc == 1:
                return jax.device_put(x, sh)
            return jax.make_array_from_process_local_data(sh, x, x.shape)
        sh = NamedSharding(mesh, P(*([None] * axis_idx + [axis])))
        if nproc == 1:
            return jax.device_put(x, sh)
        global_shape = (
            x.shape[:axis_idx]
            + (x.shape[axis_idx] * nproc,)
            + x.shape[axis_idx + 1:]
        )
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(place, tree)


def replicate(mesh, tree):
    """Replicate a host-local pytree onto every device of the global mesh
    (all processes must pass identical values — e.g. same-seed inits)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    nproc = jax.process_count()
    if nproc == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, x.shape
        )

    return jax.tree.map(place, tree)


def fetch(x):
    """Host value of a replicated (or otherwise fully-addressable-shard)
    global array: reads this process's first addressable shard."""
    import jax

    if hasattr(x, "addressable_shards"):
        # Reading shard 0 is only SPMD-safe when every process sees the same
        # value; a sharded metric here would silently diverge clip-sampling
        # probabilities across processes.
        if hasattr(x, "is_fully_replicated") and not x.is_fully_replicated:
            raise ValueError(
                "fetch() requires a fully-replicated array; got sharding "
                f"{getattr(x, 'sharding', None)}"
            )
        return np.asarray(jax.device_get(x.addressable_shards[0].data))
    return np.asarray(x)
