"""Device-resident replay memory of rollout windows.

The reference learner stages actor unrolls in a host replay memory
(rm_size=1024 unrolls, reference run_pg_learner.py:36) and its batch workers
sample rollout_len=8 windows into batches of 256 for multiple optimizer
steps per unroll (sample reuse). Here the same stage is a fixed-shape
circular buffer of window slots living in HBM: writes are scatter updates,
sampling is a gather, and the whole collect -> stage -> multi-update
iteration stays inside one jit (no host round trips, no batch/pull worker
threads — SURVEY.md section 2.3 'Replay/batch pipeline parallelism').

Works for any pytree of unroll tensors with (T, B, ...) leaves — recurrent
rollouts stage per-step hidden states as just another leaf.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class Replay(NamedTuple):
    data: Any  # pytree, leaves (S, W, ...) — S slots of W-step windows
    cursor: jnp.ndarray  # () int32, next write position
    filled: jnp.ndarray  # () int32, number of valid slots


def windows_from_unroll(rollout, window: int):
    """Split (T, B, ...) unroll leaves into (T//W * B, W, ...) window slots."""

    def split(x):
        T, B = x.shape[0], x.shape[1]
        assert T % window == 0, (T, window)
        x = x.reshape((T // window, window, B) + x.shape[2:])
        x = jnp.moveaxis(x, 2, 1)  # (T//W, B, W, ...)
        return x.reshape((T // window * B, window) + x.shape[3:])

    return jax.tree.map(split, rollout)


def windows_overlapping(rollout, window: int, stride: int):
    """Split (T, B, ...) unroll leaves into overlapping (N*B, window, ...)
    slots with the given stride — for burn-in staging, where each
    rollout_len training window carries its `burn_in` predecessor steps
    (window = burn_in + rollout_len, stride = rollout_len)."""
    import numpy as np

    T = jax.tree.leaves(rollout)[0].shape[0]
    starts = np.arange(0, T - window + 1, stride)
    idx = starts[:, None] + np.arange(window)[None, :]  # (N, W)

    def split(x):
        B = x.shape[1]
        w = x[idx]  # (N, W, B, ...)
        w = jnp.moveaxis(w, 2, 1)  # (N, B, W, ...)
        return w.reshape((len(starts) * B, window) + w.shape[3:])

    return jax.tree.map(split, rollout)


def replay_init(example_window, size: int) -> Replay:
    """Empty buffer shaped after one window slot (leaves (W, ...))."""
    data = jax.tree.map(
        lambda x: jnp.zeros((size,) + jnp.shape(x), jnp.asarray(x).dtype),
        example_window,
    )
    return Replay(
        data=data,
        cursor=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
    )


def replay_add(rep: Replay, windows) -> Replay:
    """Circular write of (N, W, ...) window slots at the cursor."""
    size = jax.tree.leaves(rep.data)[0].shape[0]
    n = jax.tree.leaves(windows)[0].shape[0]
    idx = (rep.cursor + jnp.arange(n, dtype=jnp.int32)) % size
    data = jax.tree.map(
        lambda buf, w: buf.at[idx].set(w.astype(buf.dtype)), rep.data, windows
    )
    return Replay(
        data=data,
        cursor=(rep.cursor + n) % size,
        filled=jnp.minimum(rep.filled + n, size),
    )


def replay_sample(rep: Replay, key, batch: int):
    """Uniform sample of `batch` slots -> leaves (batch, W, ...)."""
    idx = jax.random.randint(key, (batch,), 0, jnp.maximum(rep.filled, 1))
    return jax.tree.map(lambda buf: buf[idx], rep.data)


def as_time_major(batch_windows):
    """(batch, W, ...) sampled slots -> (W, batch, ...) for the loss scans."""
    return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), batch_windows)
