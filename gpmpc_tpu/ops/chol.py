"""Cholesky factorization helpers and rank-1 updates.

The reference leans on LAPACK through numpy/casadi for its Gram-matrix
factorizations [SURVEY §2.2].  Here the factorization-consuming code goes
through these wrappers so the backend (jnp.linalg today, Pallas blocked
kernels for large N on TPU) can be swapped in one place.

``cholupdate`` has no reference counterpart — the reference GP is fixed after
construction ("no online/streaming conditioning" [SURVEY C5]) — it exists for
the batched-study config's online GP conditioning (BASELINE config 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def cholesky_psd(a: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix."""
    return jnp.linalg.cholesky(a)


def tri_solve(l: jnp.ndarray, b: jnp.ndarray, *, trans: bool = False,
              lower: bool = True) -> jnp.ndarray:
    """Triangular solve L x = b (or L^T x = b with trans=True)."""
    return solve_triangular(l, b, trans=1 if trans else 0, lower=lower)


def chol_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given A = L L^T."""
    return tri_solve(l, tri_solve(l, b), trans=True)


def chol_small(a: jnp.ndarray, clamp: bool = True) -> jnp.ndarray:
    """Trace-time-unrolled Cholesky for small static n (stage matrices,
    EM covariance blocks; n <= ~16).

    On this TPU backend, *batched* ``jnp.linalg.cholesky`` / triangular-solve
    HLOs (under vmap, e.g. per output dim or per rollout) are pathologically
    slow (~0.3 ms each) or hang the compiler when nested in scans.  These
    unrolled forms are pure elementwise/matmul ops: vmap just adds batch
    dimensions, and XLA fuses the whole factorization into a handful of
    kernels.  Use ONLY for small static n — the unroll is O(n^2) ops.
    """
    n = a.shape[-1]
    l = jnp.zeros_like(a)
    for j in range(n):
        # d = a[j,j] - sum_{k<j} l[j,k]^2
        d = a[..., j, j] - sum(l[..., j, k] * l[..., j, k] for k in range(j))
        # clamp=False keeps the NaN of a non-PD pivot so callers (Riccati)
        # can detect failure and regularize
        dsqrt = jnp.sqrt(jnp.maximum(d, 1e-30) if clamp else d)
        l = l.at[..., j, j].set(dsqrt)
        for i in range(j + 1, n):
            s = a[..., i, j] - sum(l[..., i, k] * l[..., j, k]
                                   for k in range(j))
            l = l.at[..., i, j].set(s / dsqrt)
    return l


def tri_solve_small(l: jnp.ndarray, b: jnp.ndarray,
                    trans: bool = False) -> jnp.ndarray:
    """Unrolled triangular solve L x = b (or L^T x = b); L (..., n, n) lower,
    b (..., n) or (..., n, m).  Same rationale as :func:`chol_small`."""
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    x = jnp.zeros_like(b)
    idx = range(n) if not trans else range(n - 1, -1, -1)
    for i in idx:
        acc = b[..., i, :]
        if not trans:
            for k in range(i):
                acc = acc - l[..., i, k, None] * x[..., k, :]
        else:
            for k in range(i + 1, n):
                acc = acc - l[..., k, i, None] * x[..., k, :]
        x = x.at[..., i, :].set(acc / l[..., i, i, None])
    return x[..., 0] if vec else x


def spd_solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """A^{-1} b for small SPD A via unrolled Cholesky."""
    l = chol_small(a)
    return tri_solve_small(l, tri_solve_small(l, b), trans=True)


def spd_inverse_small(a: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of small SPD A (unrolled)."""
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    return spd_solve_small(a, eye)


def chol_logdet_small(l: jnp.ndarray) -> jnp.ndarray:
    """log det A from its small Cholesky factor (sum of 2 log diag)."""
    n = l.shape[-1]
    return 2.0 * sum(jnp.log(l[..., i, i]) for i in range(n))


def ge_solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Trace-time-unrolled general linear solve A X = B for small static n
    via Gauss elimination with partial pivoting (mask-based row swaps).

    For the NONSYMMETRIC small systems in the parallel Riccati combine
    ((I + C J) with C, J PSD — positive-stable but not SPD).  Same rationale
    as :func:`chol_small`: batched LAPACK HLOs are pathological on this
    backend; these unrolled forms vmap transparently.
    """
    n = a.shape[-1]
    vec = b.ndim == a.ndim - 1
    if vec:
        b = b[..., None]
    m = jnp.concatenate([a, b], axis=-1)          # augmented (n, n+k)
    rows = jnp.arange(n)
    for j in range(n):
        # partial pivot: largest |m[i, j]| over i >= j
        col = jnp.abs(m[..., :, j])
        col = jnp.where(rows >= j, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)              # (...,)
        onehot_p = (rows == p[..., None]).astype(m.dtype)      # (..., n)
        onehot_j = (rows == j).astype(m.dtype)
        # swap rows j and p:  m += outer(e_j - e_p, row_p - row_j)
        row_p = jnp.einsum("...i,...ik->...k", onehot_p, m)
        row_j = jnp.einsum("...i,...ik->...k", onehot_j, m)
        m = (m + (onehot_j - onehot_p)[..., :, None]
             * (row_p - row_j)[..., None, :])
        # eliminate below and above (Gauss-Jordan keeps the unroll simple)
        pivot_row = jnp.einsum("...i,...ik->...k", onehot_j, m)
        piv = pivot_row[..., j:j + 1]
        # dtype-aware singular-pivot floor: a 1e-300 literal underflows to
        # 0.0 in float32 (the TPU production dtype), making the guard a no-op
        tiny = jnp.finfo(m.dtype).tiny
        piv = jnp.where(jnp.abs(piv) > tiny, piv, tiny)
        pivot_row = pivot_row / piv
        factors = m[..., :, j]                    # (..., n)
        factors = jnp.where(rows == j, 0.0, factors)
        m = m - factors[..., :, None] * pivot_row[..., None, :]
        # set row j to the normalized pivot row
        m = jnp.where((rows == j)[..., :, None],
                      jnp.broadcast_to(pivot_row[..., None, :], m.shape), m)
    x = m[..., n:]
    return x[..., 0] if vec else x


def cholupdate(l: jnp.ndarray, x: jnp.ndarray,
               downdate: bool = False) -> jnp.ndarray:
    """Rank-1 Cholesky update: factor of L L^T +/- x x^T in O(N^2).

    Classic (hyperbolic-)rotation sweep expressed as a ``lax.scan`` over
    columns — each column update is a fused vector op on the VPU, no host
    round-trips.  Library utility with oracle tests (tests/test_gp_core.py);
    the online-GP conditioning path itself uses the bordered-inverse form
    (:mod:`gpmpc_tpu.parallel.online_gp`), which subsumed the round-1
    cholupdate-based scheme.
    """
    sign = -1.0 if downdate else 1.0
    n = l.shape[0]
    rows = jnp.arange(n)

    def col_step(carry, k):
        x_vec, l_cur = carry
        lkk = l_cur[k, k]
        xk = x_vec[k]
        r = jnp.sqrt(jnp.maximum(lkk * lkk + sign * xk * xk,
                                 jnp.finfo(l.dtype).tiny))
        c = r / lkk
        s = xk / lkk
        col = l_cur[:, k]
        new_col = (col + sign * s * x_vec) / c
        new_col = jnp.where(rows == k, r, new_col)
        new_col = jnp.where(rows < k, col, new_col)
        new_x = c * x_vec - s * new_col
        new_x = jnp.where(rows <= k, jnp.zeros_like(x_vec), new_x)
        return (new_x, l_cur.at[:, k].set(new_col)), None

    (_, l_out), _ = jax.lax.scan(col_step, (x, l), rows)
    return l_out
