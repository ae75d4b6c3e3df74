"""Pallas Riccati backward sweep: the block-banded KKT factorization of the
horizon LQ subproblem, solved entirely in VMEM.

The iLQR backward pass factorizes a block-banded KKT system (horizon H,
state n=37, control m=12 blocks) by backward recursion — the structure the
BASELINE north-star names ("block-banded Riccati/KKT QP factorizations").
On TPU the whole per-scenario recursion chain fits on-chip: one grid program
per scenario streams its (H, n, n) linearization blocks HBM->VMEM once and
runs the full backward sweep without touching HBM again, so the sequential
dependency chain pays VMEM latency, not HBM latency, per step. The inner
12x12 SPD solve is an unrolled Gauss-Jordan elimination (no pivoting needed:
Quu is Levenberg-Marquardt regularized), because there is no LAPACK inside a
kernel.

`riccati_sweep_ref` is the XLA oracle (vmapped scan + jnp.linalg.solve) the
kernel is pinned against in tests/test_riccati_pallas.py; interpret mode
makes the kernel itself runnable on CPU.

Reference provenance: the reference repo has no trajectory optimizer at all
(policies come from PPO; PyBullet integrates passively) — this layer is
TPU-native engineering against BASELINE.json's north_star, not a port.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gj_inverse(mat, m):
    """Inverse of an SPD (m, m) matrix by unrolled Gauss-Jordan elimination
    (diagonal pivots; safe because the caller adds LM regularization)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    X = jnp.eye(m, dtype=mat.dtype)
    M = mat
    for j in range(m):
        inv_p = 1.0 / M[j, j]
        row_m = M[j] * inv_p  # (m,)
        row_x = X[j] * inv_p
        f_m = M[:, j : j + 1]  # (m, 1) elimination factors
        is_j = rows == j
        M = jnp.where(is_j, row_m[None, :], M - f_m * row_m[None, :])
        X = jnp.where(is_j, row_x[None, :], X - f_m * row_x[None, :])
    return X


def _backward_step(A_t, B_t, cx_t, cu_t, Cxx_t, Cuu_t, Vx, Vxx, reg, m):
    """One Riccati recursion step. cx/cu/Vx are (n,1)/(m,1) column vectors.

    Returns (k (m,1), K (m,n), Vx' (n,1), Vxx' (n,n))."""
    f32 = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    At, Bt = A_t.T, B_t.T
    VA = f32(Vxx, A_t)  # (n, n)
    VB = f32(Vxx, B_t)  # (n, m)
    Qx = cx_t + f32(At, Vx)  # (n, 1)
    Qu = cu_t + f32(Bt, Vx)  # (m, 1)
    Qxx = Cxx_t + f32(At, VA)
    Quu = Cuu_t + f32(Bt, VB) + reg * jnp.eye(m, dtype=A_t.dtype)
    Quu = 0.5 * (Quu + Quu.T)
    Qux = f32(Bt, VA)  # (m, n)
    Quu_inv = _gj_inverse(Quu, m)
    k = -f32(Quu_inv, Qu)  # (m, 1)
    K = -f32(Quu_inv, Qux)  # (m, n)
    Kt = K.T
    Vx2 = Qx + f32(Kt, f32(Quu, k) + Qu) + f32(Qux.T, k)
    Vxx2 = Qxx + f32(Kt, f32(Quu, K) + Qux) + f32(Qux.T, K)
    Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
    return k, K, Vx2, Vxx2


def _riccati_kernel(a_ref, b_ref, cx_ref, cu_ref, cxx_ref, cuu_ref,
                    ks_ref, Ks_ref, *, H, n, m, reg):
    """Full backward sweep for ONE scenario; every block lives in VMEM."""

    def body(i, carry):
        Vx, Vxx = carry
        t = H - 1 - i
        k, K, Vx2, Vxx2 = _backward_step(
            a_ref[0, t], b_ref[0, t], cx_ref[0, t], cu_ref[0, t],
            cxx_ref[0, t], cuu_ref[0, t], Vx, Vxx, reg, m,
        )
        ks_ref[0, t] = k
        Ks_ref[0, t] = K
        return Vx2, Vxx2

    dtype = a_ref.dtype
    init = (jnp.zeros((n, 1), dtype), jnp.zeros((n, n), dtype))
    jax.lax.fori_loop(0, H, body, init)


def riccati_sweep(A, Bm, cx, cu, Cxx, Cuu, reg=1e-3, interpret=None):
    """Batched Riccati backward sweep on TPU.

    A: (S, H, n, n) dynamics Jacobians fx; Bm: (S, H, n, m) fu;
    cx: (S, H, n), cu: (S, H, m) cost gradients;
    Cxx: (S, H, n, n), Cuu: (S, H, m, m) cost Hessians.
    Returns (ks (S, H, m) feedforward, Ks (S, H, m, n) feedback gains).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    S, H, n, _ = A.shape
    m = Bm.shape[-1]
    dtype = jnp.result_type(A, Bm, cx, cu, Cxx, Cuu)
    A, Bm, cx, cu, Cxx, Cuu = (
        x.astype(dtype) for x in (A, Bm, cx, cu, Cxx, Cuu)
    )

    def spec(*trail):
        return pl.BlockSpec((1, H) + trail, lambda s: (s, 0) + (0,) * len(trail),
                            memory_space=pltpu.VMEM)

    ks, Ks = pl.pallas_call(
        functools.partial(_riccati_kernel, H=H, n=n, m=m, reg=float(reg)),
        grid=(S,),
        in_specs=[spec(n, n), spec(n, m), spec(n, 1), spec(m, 1),
                  spec(n, n), spec(m, m)],
        out_specs=[spec(m, 1), spec(m, n)],
        out_shape=[
            jax.ShapeDtypeStruct((S, H, m, 1), dtype),
            jax.ShapeDtypeStruct((S, H, m, n), dtype),
        ],
        interpret=interpret,
    )(A, Bm, cx[..., None], cu[..., None], Cxx, Cuu)
    return ks[..., 0], Ks


def riccati_sweep_ref(A, Bm, cx, cu, Cxx, Cuu, reg=1e-3):
    """XLA oracle: same recursion via vmapped reverse scan + linalg.solve."""
    S, H, n, _ = A.shape
    m = Bm.shape[-1]
    dtype = jnp.result_type(A, Bm, cx, cu, Cxx, Cuu)
    A, Bm, cx, cu, Cxx, Cuu = (
        x.astype(dtype) for x in (A, Bm, cx, cu, Cxx, Cuu)
    )
    eye_m = jnp.eye(m, dtype=dtype)

    def one(A_s, B_s, cx_s, cu_s, Cxx_s, Cuu_s):
        def backward(carry, inp):
            Vx, Vxx = carry
            At, Bt, cxt, cut, Cxxt, Cuut = inp
            Qx = cxt + At.T @ Vx
            Qu = cut + Bt.T @ Vx
            Qxx = Cxxt + At.T @ Vxx @ At
            Quu = Cuut + Bt.T @ Vxx @ Bt + reg * eye_m
            Quu = 0.5 * (Quu + Quu.T)
            Qux = Bt.T @ Vxx @ At
            k = -jnp.linalg.solve(Quu, Qu)
            K = -jnp.linalg.solve(Quu, Qux)
            Vx2 = Qx + K.T @ (Quu @ k + Qu) + Qux.T @ k
            Vxx2 = Qxx + K.T @ (Quu @ K + Qux) + Qux.T @ K
            return (Vx2, 0.5 * (Vxx2 + Vxx2.T)), (k, K)

        init = (jnp.zeros(n, dtype), jnp.zeros((n, n), dtype))
        _, (ks, Ks) = jax.lax.scan(
            backward, init, (A_s, B_s, cx_s, cu_s, Cxx_s, Cuu_s), reverse=True
        )
        return ks, Ks

    return jax.vmap(one)(A, Bm, cx, cu, Cxx, Cuu)
