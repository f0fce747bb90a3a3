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


def cholupdate(l: jnp.ndarray, x: jnp.ndarray,
               downdate: bool = False) -> jnp.ndarray:
    """Rank-1 Cholesky update: factor of L L^T +/- x x^T in O(N^2).

    Classic (hyperbolic-)rotation sweep expressed as a ``lax.scan`` over
    columns — each column update is a fused vector op on the VPU, no host
    round-trips.  Used for online GP conditioning in the batched closed-loop
    study (BASELINE config 5).
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
