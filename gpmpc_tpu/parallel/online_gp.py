"""Online (streaming) GP conditioning with fixed-capacity posteriors.

No reference counterpart — the reference GP is frozen after construction
("no online/streaming conditioning" [SURVEY C5]); this exists for BASELINE
config 5 (1024 parallel closed-loop rollouts *with online GP conditioning*).

Design: everything is fixed-shape so it jits and vmaps.  The posterior is
padded to a static ``capacity``; unused slots hold sentinel inputs far away
in normalized space (kernel values underflow to exactly 0) and identity
rows in the precision matrix, so

    K_pad = blkdiag(K_n, I)   =>   invK_pad = blkdiag(invK_n, I),

and padded predictions equal the unpadded ones.  Conditioning on a new
point at slot m = count is a *bordered inverse* (Schur-complement) update:

    K' = [[K, k], [k', kappa]],
    invK' = [[invK + w w'/s, -w/s], [-w'/s, 1/s]],
    w = invK k,  s = kappa - k'w,

O(C^2) in pure matmuls/outer products.  This matters on this TPU backend:
the earlier Cholesky-factor variant needed batched triangular solves, which
are pathologically slow under vmap — the inverse form took the batched
study from ~10.5k to far higher rollout-solve throughput (see
benchmarks/RESULTS.md).  Numerical note: repeated rank-1 inverse updates
accumulate roundoff faster than factor updates; per-rollout update counts
in the hundreds are fine in f32 (validated against batch retraining in
tests), refresh offline for long-lived posteriors.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models.mean_functions import mean_value
from gpmpc_tpu.models.propagate import Normalization
from gpmpc_tpu.ops.kernels import kernel_cross

_SENTINEL = 1e6  # normalized-space position of unused slots


class OnlinePosterior(NamedTuple):
    """Fixed-capacity GP posterior (arrays only — scan/vmap carryable)."""

    x: jnp.ndarray        # (C, D) normalized inputs (sentinel-padded)
    y: jnp.ndarray        # (C, Ny) normalized targets (zero-padded)
    inv_k: jnp.ndarray    # (Ny, C, C) padded inverse of K + sn2 I
    alpha: jnp.ndarray    # (Ny, C) invK (y - m(X)) (zero on unused slots)
    count: jnp.ndarray    # () int32 number of live points
    log_ell: jnp.ndarray  # (Ny, D)
    log_sf2: jnp.ndarray  # (Ny,)
    sn2: jnp.ndarray      # (Ny,) noise variance incl. floor
    mean_w: jnp.ndarray   # (Ny, F) prior-mean weights (F=0 for 'zero')


def from_gp(gp, capacity: int) -> Tuple[OnlinePosterior, Normalization]:
    """Pad a trained :class:`gpmpc_tpu.models.gp.GP` posterior to capacity.

    The trained prior mean rides along (``mean_w`` + the GP's
    ``cfg.mean_func``): ``alpha`` is residual-based exactly as in
    ``gp_core.refit_posterior`` (invK (y - m(X))), so conditioning and
    prediction below subtract/add m(.) in normalized space and the
    bordered-inverse algebra is untouched — the mean weights are FROZEN
    at their trained values (only the kernel posterior adapts online).
    """
    if getattr(gp, "inducing", None):
        # the bordered-inverse update assumes post.inv_k is the data-space
        # precision (K + sn2 I)^-1; a sparse posterior's Lambda is not, so
        # conditioning on it would corrupt every subsequent prediction
        raise ValueError("online conditioning requires a full (non-sparse) "
                         "GP; got inducing="
                         f"{gp.inducing} — train without `inducing`")
    n, d = gp.Xn.shape
    ny = gp.Ny
    if capacity < n:
        raise ValueError(f"capacity {capacity} < training size {n}")
    dtype = gp.Xn.dtype
    c = capacity

    x_pad = jnp.full((c, d), _SENTINEL, dtype).at[:n].set(gp.Xn)
    y_pad = jnp.zeros((c, ny), dtype).at[:n].set(gp.Yn)
    eye = jnp.eye(c, dtype=dtype)
    invk_pad = jnp.broadcast_to(eye, (ny, c, c))
    invk_pad = invk_pad.at[:, :n, :n].set(gp.post.inv_k)
    invk_pad = invk_pad.at[:, n:, :n].set(0.0)
    alpha_pad = jnp.zeros((ny, c), dtype).at[:, :n].set(gp.post.alpha)
    sn2 = jnp.exp(gp.hyper.log_sn2) + gp.cfg.min_noise
    post = OnlinePosterior(
        x=x_pad, y=y_pad, inv_k=invk_pad, alpha=alpha_pad,
        count=jnp.asarray(n, jnp.int32),
        log_ell=gp.hyper.log_ell, log_sf2=gp.hyper.log_sf2, sn2=sn2,
        mean_w=gp.hyper.mean_w)
    return post, gp.norm


def as_gp_posterior(post: OnlinePosterior):
    """View an OnlinePosterior as a :class:`gp_core.GPPosterior` so the
    ME/TA/EM propagation stack runs on it unchanged.

    Valid because the whole prediction/propagation path is invK-based on
    this backend (no triangular solves); the ``chol`` field is filled with
    ``inv_k`` as a placeholder and MUST NOT be consumed downstream.
    """
    from gpmpc_tpu.models import gp_core
    hypers = gp_core.GPHypers(
        log_ell=post.log_ell, log_sf2=post.log_sf2,
        log_sn2=jnp.log(post.sn2), mean_w=post.mean_w)
    return gp_core.GPPosterior(x=post.x, chol=post.inv_k, alpha=post.alpha,
                               inv_k=post.inv_k, hypers=hypers)


def predict(post: OnlinePosterior, norm: Normalization,
            z_raw: jnp.ndarray, kernel: str = "se",
            mean_func: str = "zero"
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw-space predictive mean/variance at one point: (D,) -> ((Ny,), (Ny,)).

    ``kernel`` / ``mean_func`` are the trained GP's static config
    (``GPConfig.kernel`` / ``GPConfig.mean_func``) — the conditioning
    algebra below is family-agnostic (it only consumes cross-kernel rows
    and the stationary diagonal k(x,x)=sf2), and the sentinel-padding
    contract holds for every supported family: at the 1e6 normalized
    sentinel distance both the SE exp and the Matérn poly*exp underflow
    to exactly 0.  The prior mean enters exactly as in
    ``gp_core.predict``: mu = m(z) + k*' alpha with residual-based alpha.
    """
    zn = (z_raw - norm.z_mean) / norm.z_std

    def one(log_ell, log_sf2, inv_k, alpha, mw):
        ks = kernel_cross(kernel, zn[None], post.x, jnp.exp(log_ell),
                          jnp.exp(log_sf2))[0]
        mu = mean_value(zn, mw, mean_func) + jnp.dot(ks, alpha)
        # matmul variance path — no triangular solves (backend pathology).
        # Pinned precision: sf2 - k*^T K^-1 k* is a small difference of
        # large quadratic forms (see gp_core.predict)
        hi = jax.lax.Precision.HIGHEST
        var = jnp.maximum(
            jnp.exp(log_sf2)
            - jnp.dot(ks, jnp.matmul(inv_k, ks, precision=hi),
                      precision=hi), 0.0)
        return mu, var

    mu_n, var_n = jax.vmap(one)(post.log_ell, post.log_sf2, post.inv_k,
                                post.alpha, post.mean_w)
    return norm.y_mean + norm.y_std * mu_n, (norm.y_std ** 2) * var_n


def mean_fn(post: OnlinePosterior, norm: Normalization, kernel: str = "se",
            mean_func: str = "zero"):
    """Raw-space predictive mean closure z -> (Ny,) (for MPC dynamics)."""
    def f(z):
        return predict(post, norm, z, kernel, mean_func)[0]
    return f


def condition(post: OnlinePosterior, norm: Normalization,
              z_raw: jnp.ndarray, y_raw: jnp.ndarray,
              novelty_threshold: float = 1e-6,
              kernel: str = "se",
              policy: str = "saturate",
              mean_func: str = "zero") -> OnlinePosterior:
    """Bayesian update on one observed transition (z, y).

    Bordered Schur-complement inverse update at slot ``count`` + O(C^2)
    alpha refresh.  The observation is DROPPED when (a) the buffer is full
    under the default ``policy='saturate'``, or (b) it fails the novelty
    gate: if the Schur complement s = k** - k*' invK k* is a tiny fraction
    of the prior variance, the point is (numerically) linearly dependent
    on the existing set — it adds no information, and folding it in
    amplifies roundoff by 1/s per update, which compounds catastrophically
    at steady state (observed: 1e143 blow-ups on near-duplicate points).
    This is the classic kernel linear-independence test of online sparse
    GPs (Csato & Opper).  The gate is global across output dims (the slot
    insert is shared): min_d s_d / (sf2_d + sn2_d) must exceed the
    threshold.

    ``policy='fifo'`` keeps adapting past capacity: the OLDEST live point
    (insertion order, starting with the original training set) is evicted
    by an exact O(C) Schur-complement downdate of the bordered inverse —
    zero its row/col back to the identity padding and re-sentinel its
    input — then the new point is inserted into the freed slot.  During
    the fill phase (count < capacity) the downdate is algebraically a
    no-op on the virgin slot, so fifo and saturate coincide until the
    buffer is full.  This is the long-deployment mode: a saturated buffer
    under 'saturate' silently stops adapting.  (``count`` then wraps into
    [capacity, 2*capacity) so the insertion cursor ``count % capacity``
    keeps cycling without int32 growth.)
    """
    if policy not in ("saturate", "fifo"):
        raise ValueError(f"policy must be 'saturate' or 'fifo'; "
                         f"got {policy!r}")
    c = post.x.shape[0]
    m = post.count
    full = m >= c
    if policy == "fifo":
        idx = m % c                     # insertion cursor, wraps after fill
    else:
        idx = jnp.minimum(m, c - 1)

    zn = (z_raw - norm.z_mean) / norm.z_std
    yn = (y_raw - norm.y_mean) / norm.y_std

    rows = jnp.arange(c)
    is_idx = rows == idx

    # pre-eviction posterior: a novelty-REJECTED insert must leave the
    # posterior untouched, including under fifo where the eviction below
    # has already been applied speculatively
    post0 = post

    if policy == "fifo":
        # exact downdate evicting slot idx: for P = (K + sn2 I)^-1 padded,
        # the inverse WITHOUT row/col j is P_~j,~j - q q'/p_jj (q = P[:,j],
        # Schur complement in reverse), and the evicted alpha is the O(C)
        # form alpha - q * (alpha_j / p_jj).  Row/col j is masked back to
        # the identity padding explicitly (the subtraction leaves last-ulp
        # residuals there), and x_j re-sentineled.  On a virgin slot
        # (q = e_j, p_jj = 1) every step reproduces the inputs exactly, so
        # this branch is safe to run unconditionally.
        def evict(inv_k, alpha_old):
            q = inv_k[:, idx]
            pjj = inv_k[idx, idx]
            inv_e = inv_k - jnp.outer(q, q) / pjj
            inv_e = jnp.where(is_idx[:, None] | is_idx[None, :], 0.0, inv_e)
            inv_e = inv_e + (is_idx[:, None]
                             & is_idx[None, :]).astype(inv_k.dtype)
            alpha_e = jnp.where(is_idx, 0.0,
                                alpha_old - q * (alpha_old[idx] / pjj))
            return inv_e, alpha_e

        inv_evicted, alpha_evicted = jax.vmap(evict)(post.inv_k, post.alpha)
        post = post._replace(
            x=post.x.at[idx].set(_SENTINEL),
            y=post.y.at[idx].set(0.0),
            inv_k=inv_evicted, alpha=alpha_evicted)
        live = (rows < jnp.minimum(m, c)) & ~is_idx
    else:
        live = rows < m

    # HBM-traffic note (this is the hot op of the batched study — the inv_k
    # buffers are (B, Ny, C, C)): per output dim, inv_k is read ONCE for the
    # matvec w = invK k*, then read+written once in the fused elementwise
    # rank-1 update.  The novelty gate reuses the same (ks, w, s); the alpha
    # refresh uses the exact bordered O(C) form
    #     alpha_new = alpha - w_b e,  e = (y* - k*'alpha)/s,  w_b = [w; -1]
    # instead of a third full-matrix matvec (inv_new @ y).  This cut the
    # B=1024 study step from ~15 ms to ~9 ms on the v5e.
    # first pass: per-dim (ks, w) products + gate decisions (no writes yet;
    # the accept decision is global across dims because the slot is shared)
    def gate_and_vectors(log_ell, log_sf2, sn2, inv_k, alpha_old, y_d, mw):
        ell = jnp.exp(log_ell)
        sf2 = jnp.exp(log_sf2)
        # kernel vs the CURRENT live points (insert slot still sentinel)
        ks = kernel_cross(kernel, zn[None], post.x, ell, sf2)[0]
        ks = jnp.where(live, ks, 0.0)
        # pinned precision: s_raw is the same Schur-complement
        # cancellation as the predictive variance, and it feeds both the
        # novelty gate and the 1/s scaling of the bordered update
        hi = jax.lax.Precision.HIGHEST
        w = jnp.matmul(inv_k, ks, precision=hi)    # (C,) zero beyond m
        s_raw = sf2 + sn2 - jnp.dot(ks, w, precision=hi)
        # novelty gate (per dim): the prior-conditional variance s must
        # exceed both a noise-relative floor (3 sn2 — blocks the duplicate-
        # compounding that blows up the inverse form) and a signal-relative
        # floor (novelty_threshold * (sf2+sn2) — protects when the learned
        # sn2 is absurdly tiny).  Classic kernel linear-independence test
        # of online sparse GPs (Csato & Opper).
        ok_d = s_raw > jnp.maximum(3.0 * sn2,
                                   novelty_threshold * (sf2 + sn2))
        s = jnp.maximum(s_raw, 1e-12 * (sf2 + sn2))
        # extended border vector w_b = [w; -1] (w[idx] = 0 since ks is
        # masked); the bordered inverse and alpha updates below are exact:
        #   inv_new = inv_k + w_b w_b'/s - e_idx e_idx'
        # (the -e_idx e_idx' cancels the identity padding at the slot)
        wb = jnp.where(is_idx, -1.0, w)
        # residual target: alpha is invK (y - m(X)) throughout, so the
        # bordered refresh conditions on r* = y* - m(z*) (mean FROZEN at
        # its trained weights; only the kernel posterior adapts)
        r_d = y_d - mean_value(zn, mw, mean_func)
        e_d = (r_d - jnp.dot(ks, alpha_old)) / s
        return wb, s, ok_d, e_d

    wb, s, ok, e = jax.vmap(gate_and_vectors)(
        post.log_ell, post.log_sf2, post.sn2, post.inv_k, post.alpha, yn,
        post.mean_w)
    if policy == "fifo":
        add = jnp.all(ok)               # eviction always frees the slot
    else:
        add = (~full) & jnp.all(ok)

    x_new = jnp.where(add, post.x.at[idx].set(zn), post0.x)
    y_new = jnp.where(add, post.y.at[idx].set(yn), post0.y)

    # second pass: fused rank-1 inverse update + O(C) alpha refresh
    def apply(inv_k, alpha_old, inv0, alpha0, wb_d, s_d, e_d):
        upd = (wb_d[:, None] * wb_d[None, :]) / s_d \
            - (is_idx[:, None] & is_idx[None, :]).astype(inv_k.dtype)
        inv_new = jnp.where(add, inv_k + upd, inv0)
        alpha = jnp.where(add, alpha_old - wb_d * e_d, alpha0)
        return inv_new, alpha

    inv_new, alpha_new = jax.vmap(apply)(post.inv_k, post.alpha,
                                         post0.inv_k, post0.alpha, wb, s, e)
    mp1 = m + 1
    if policy == "fifo":
        # wrap into [c, 2c): keeps the cursor m % c cycling forever
        mp1 = jnp.where(mp1 >= 2 * c, mp1 - c, mp1)
    return OnlinePosterior(
        x=x_new, y=y_new, inv_k=inv_new, alpha=alpha_new,
        count=jnp.where(add, mp1, m).astype(jnp.int32),
        log_ell=post.log_ell, log_sf2=post.log_sf2, sn2=post.sn2,
        mean_w=post.mean_w)
