"""Pallas projected-Gauss-Seidel sweep for the hard-contact impulse mode.

physics/impulse.py's XLA path issues iterations x 60 sequential row updates
per substep — ~600 tiny ops whose latency dominates the hard-contact step
(~38 ms per 10-substep control step measured on a v5e). This kernel runs
the ENTIRE sweep in VMEM with the batch on the 128-lane axis: v (18, 128)
and the 60 impulse rows live in vector registers, so each row update costs
VPU latency, not XLA op dispatch + HBM traffic.

The sequential row ORDER is the solver's semantics (Gauss-Seidel matches
tools/bullet_oracle.py's compacted active-row iteration bit-for-bit via
zero-clamped inactive rows) — so the kernel unrolls iterations x 60 updates
verbatim; the win is locality, not reordering. Pinned against impulse._pgs
in tests/test_impulse_contact.py (interpret mode on CPU).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lifelike_tpu.physics.impulse import _MU_IDX, N_ROWS, NV

LANES = 128


def _pgs_kernel(iterations, mu_ref, v_ref, lam_ref, J_ref, MinvJT_ref,
                d_ref, b_ref, lo_ref, hi_ref, v_out, lam_out):
    """One lane-tile (batch of 128) of the full PGS sweep.

    v_ref: (NV, 128); lam/d/b/lo/hi: (N_ROWS, 128); J/MinvJT:
    (N_ROWS, NV, 128). mu_ref: (1, 1) SMEM scalar.
    """
    mu = mu_ref[0, 0]
    v = v_ref[:]  # (18, 128)
    lam = [lam_ref[i, :] for i in range(N_ROWS)]  # each (128,)
    b = b_ref[:]
    d = d_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]

    for _ in range(iterations):
        for i in range(N_ROWS):
            Ji = J_ref[i]  # (18, 128)
            dv = b[i, :] - jnp.sum(Ji * v, axis=0)
            dl = dv / d[i, :]
            if _MU_IDX[i] >= 0:
                bound = mu * jnp.maximum(lam[_MU_IDX[i]], 0.0)
                lo_i, hi_i = -bound, bound
            else:
                lo_i, hi_i = lo[i, :], hi[i, :]
            new = jnp.clip(lam[i] + dl, lo_i, hi_i)
            delta = new - lam[i]
            lam[i] = new
            v = v + MinvJT_ref[i] * delta[None, :]

    v_out[:] = v
    for i in range(N_ROWS):
        lam_out[i, :] = lam[i]


@functools.partial(jax.jit, static_argnames=("iterations", "interpret"))
def pgs_sweep(v, lam0, J, MinvJT, d, b, lo, hi, mu, iterations=10,
              interpret=None):
    """Batched PGS, identical semantics to impulse._pgs.

    v: (B, NV) free velocity AFTER warm-start impulses; lam0: (B, N_ROWS);
    J/MinvJT: (B, N_ROWS, NV); d/b/lo/hi: (B, N_ROWS); mu scalar.
    B must be a multiple of 128 (the caller pads or falls back to the XLA
    path). Returns (v', lam').
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B = v.shape[0]
    assert B % LANES == 0, B
    n_tiles = B // LANES
    dtype = v.dtype

    # batch -> lane axis
    vT = jnp.moveaxis(v, 0, -1)  # (NV, B)
    lamT = jnp.moveaxis(lam0, 0, -1)  # (N_ROWS, B)
    JT = jnp.moveaxis(J, 0, -1)  # (N_ROWS, NV, B)
    MT = jnp.moveaxis(MinvJT, 0, -1)
    dT = jnp.moveaxis(jnp.maximum(d, 1e-12), 0, -1)
    bT = jnp.moveaxis(b, 0, -1)
    loT = jnp.moveaxis(lo, 0, -1)
    hiT = jnp.moveaxis(hi, 0, -1)
    mu_arr = jnp.full((1, 1), mu, dtype)

    def spec2(rows):
        return pl.BlockSpec(
            (rows, LANES), lambda t: (0, t), memory_space=pltpu.VMEM
        )

    def spec3(rows):
        return pl.BlockSpec(
            (rows, NV, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM
        )

    v_out, lam_out = pl.pallas_call(
        functools.partial(_pgs_kernel, iterations),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
            spec2(NV),
            spec2(N_ROWS),
            spec3(N_ROWS),
            spec3(N_ROWS),
            spec2(N_ROWS),
            spec2(N_ROWS),
            spec2(N_ROWS),
            spec2(N_ROWS),
        ],
        out_specs=[spec2(NV), spec2(N_ROWS)],
        out_shape=[
            jax.ShapeDtypeStruct((NV, B), dtype),
            jax.ShapeDtypeStruct((N_ROWS, B), dtype),
        ],
        interpret=interpret,
    )(mu_arr, vT, lamT, JT, MT, dT, bT, loT, hiT)

    return jnp.moveaxis(v_out, -1, 0), jnp.moveaxis(lam_out, -1, 0)
