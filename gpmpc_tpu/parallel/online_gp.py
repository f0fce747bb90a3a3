"""Online (streaming) GP conditioning with fixed-capacity factors.

No reference counterpart — the reference GP is frozen after construction
("no online/streaming conditioning" [SURVEY C5]); this exists for BASELINE
config 5 (1024 parallel closed-loop rollouts *with online GP conditioning*).

Design: everything is fixed-shape so it jits and vmaps.  The posterior is
padded to a static ``capacity``; unused slots hold sentinel inputs far away
in normalized space (kernel values underflow to exactly 0 after the -0.5*d^2
exponent) and identity rows in the Cholesky factor, so

    K_pad = blkdiag(K_n, I),   L_pad = blkdiag(chol(K_n), I),

and padded predictions equal the unpadded ones.  Conditioning on a new point
at slot m = count is then a *bordered* Cholesky insert done with full-size
ops: one (C, C) triangular solve for the new row + an O(C^2) alpha refresh —
O(C^2) per observation instead of O(C^3) refactorization, vectorized over
the Ny output dims and over thousands of rollouts by ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models.propagate import Normalization
from gpmpc_tpu.ops.chol import tri_solve
from gpmpc_tpu.ops.kernels import se_ard_cross

_SENTINEL = 1e6  # normalized-space position of unused slots


class OnlinePosterior(NamedTuple):
    """Fixed-capacity GP posterior (arrays only — scan/vmap carryable)."""

    x: jnp.ndarray        # (C, D) normalized inputs (sentinel-padded)
    y: jnp.ndarray        # (C, Ny) normalized targets (zero-padded)
    chol: jnp.ndarray     # (Ny, C, C) padded lower Cholesky of K + sn2 I
    alpha: jnp.ndarray    # (Ny, C) K^{-1} y (zero on unused slots)
    count: jnp.ndarray    # () int32 number of live points
    log_ell: jnp.ndarray  # (Ny, D)
    log_sf2: jnp.ndarray  # (Ny,)
    sn2: jnp.ndarray      # (Ny,) noise variance incl. floor


def from_gp(gp, capacity: int) -> Tuple[OnlinePosterior, Normalization]:
    """Pad a trained :class:`gpmpc_tpu.models.gp.GP` posterior to capacity."""
    n, d = gp.Xn.shape
    ny = gp.Ny
    if capacity < n:
        raise ValueError(f"capacity {capacity} < training size {n}")
    dtype = gp.Xn.dtype
    c = capacity

    x_pad = jnp.full((c, d), _SENTINEL, dtype).at[:n].set(gp.Xn)
    y_pad = jnp.zeros((c, ny), dtype).at[:n].set(gp.Yn)
    eye = jnp.eye(c, dtype=dtype)
    chol_pad = jnp.broadcast_to(eye, (ny, c, c))
    chol_pad = chol_pad.at[:, :n, :n].set(gp.post.chol)
    # zero out the off-diagonal coupling introduced by broadcasting trick
    chol_pad = chol_pad.at[:, n:, :n].set(0.0)
    alpha_pad = jnp.zeros((ny, c), dtype).at[:, :n].set(gp.post.alpha)
    sn2 = jnp.exp(gp.hyper.log_sn2) + gp.cfg.min_noise
    post = OnlinePosterior(
        x=x_pad, y=y_pad, chol=chol_pad, alpha=alpha_pad,
        count=jnp.asarray(n, jnp.int32),
        log_ell=gp.hyper.log_ell, log_sf2=gp.hyper.log_sf2, sn2=sn2)
    return post, gp.norm


def predict(post: OnlinePosterior, norm: Normalization,
            z_raw: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw-space predictive mean/variance at one point: (D,) -> ((Ny,), (Ny,))."""
    zn = (z_raw - norm.z_mean) / norm.z_std

    def one(log_ell, log_sf2, chol_l, alpha):
        ks = se_ard_cross(zn[None], post.x, jnp.exp(log_ell),
                          jnp.exp(log_sf2))[0]
        mu = jnp.dot(ks, alpha)
        v = tri_solve(chol_l, ks)
        var = jnp.maximum(jnp.exp(log_sf2) - jnp.dot(v, v), 0.0)
        return mu, var

    mu_n, var_n = jax.vmap(one)(post.log_ell, post.log_sf2, post.chol,
                                post.alpha)
    return norm.y_mean + norm.y_std * mu_n, (norm.y_std ** 2) * var_n


def mean_fn(post: OnlinePosterior, norm: Normalization):
    """Raw-space predictive mean closure z -> (Ny,) (for MPC dynamics)."""
    def f(z):
        return predict(post, norm, z)[0]
    return f


def condition(post: OnlinePosterior, norm: Normalization,
              z_raw: jnp.ndarray, y_raw: jnp.ndarray) -> OnlinePosterior:
    """Bayesian update on one observed transition (z, y).

    Bordered Cholesky insert at slot ``count`` + O(C^2) alpha refresh; if the
    buffer is full the observation is dropped (saturating policy).
    """
    c = post.x.shape[0]
    m = post.count
    full = m >= c
    idx = jnp.minimum(m, c - 1)

    zn = (z_raw - norm.z_mean) / norm.z_std
    yn = (y_raw - norm.y_mean) / norm.y_std
    x_new = post.x.at[idx].set(jnp.where(full, post.x[idx], zn))
    y_new = post.y.at[idx].set(jnp.where(full, post.y[idx], yn))

    rows = jnp.arange(c)

    def one(log_ell, log_sf2, sn2, chol_l, y_col):
        ell = jnp.exp(log_ell)
        sf2 = jnp.exp(log_sf2)
        # kernel vector vs live points only (sentinel slots underflow to 0,
        # but mask anyway for exactness at the insert slot)
        ks = se_ard_cross(zn[None], x_new, ell, sf2)[0]
        ks = jnp.where(rows < m, ks, 0.0)
        l21 = tri_solve(chol_l, ks)                       # (C,)
        l22 = jnp.sqrt(jnp.maximum(sf2 + sn2 - jnp.dot(l21, l21), 1e-12))
        new_row = jnp.where(rows < m, l21, 0.0)
        new_row = jnp.where(rows == idx, l22, new_row)
        chol_new = chol_l.at[idx].set(jnp.where(full, chol_l[idx], new_row))
        # alpha refresh: two fixed-size triangular solves on padded system
        yy = jnp.where(rows < jnp.minimum(m + 1, c), y_col, 0.0)
        alpha = tri_solve(chol_new, tri_solve(chol_new, yy), trans=True)
        alpha = jnp.where(rows < jnp.minimum(m + 1, c), alpha, 0.0)
        return chol_new, alpha

    chol_new, alpha_new = jax.vmap(one)(
        post.log_ell, post.log_sf2, post.sn2, post.chol, y_new.T)
    return OnlinePosterior(
        x=x_new, y=y_new, chol=chol_new, alpha=alpha_new,
        count=jnp.where(full, m, m + 1).astype(jnp.int32),
        log_ell=post.log_ell, log_sf2=post.log_sf2, sn2=post.sn2)
