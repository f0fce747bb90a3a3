"""Sparse (inducing-point) GP regression — Titsias variational free energy.

Beyond-reference production-scale capability: the reference
(``gp_mpc/optimize.py`` / ``gp_class.py`` [SURVEY C4/C5]) trains exact GPs,
which is O(N^3) per NLL evaluation and O(N^2) per embedded prediction —
fine at its N~100 thesis scale, a wall at production data sizes.  This
module adds the standard sparse variational treatment (Titsias 2009, "
Variational Learning of Inducing Variables in Sparse Gaussian Processes"):
M << N inducing inputs Z summarize the data; training minimizes the
variational free energy (a provable upper bound on the exact NLL), and
prediction costs O(M) mean / O(M^2) variance regardless of N.

TPU-native shape: every term of the bound is a dense matmul — K_MN is an
(M, N) cross-kernel (one MXU matmul + exp), the bound needs one O(M^2 N)
matmul and two O(M^3) Cholesky factorizations per evaluation.  No
sparsity-pattern scatter/gather anywhere, so XLA tiles it straight onto
the MXU; N in the tens of thousands trains on-chip.

The payoff for the MPC stack: the VFE posterior has the SAME algebraic
form as the exact posterior —

    mean(x*) = m(x*) + k_*M beta
    var(x*)  = sf2 - k_*M Lambda k_M*

with ``beta = sigma^-2 Sigma K_MN r`` and ``Lambda = K_MM^-1 - Sigma``
(``Sigma = (K_MM + sigma^-2 K_MN K_NM)^-1``, PSD by construction).  So it
is exposed as an ordinary :class:`gpmpc_tpu.models.gp_core.GPPosterior`
with ``x -> Z``, ``alpha -> beta``, ``inv_k -> Lambda``, and EVERYTHING
downstream — deterministic predict, ME/TA/EM moment propagation
[SURVEY C3b-d], the MPC embedding, AOT export — works unchanged, with
per-stage propagation cost dropping from O(N^2) to O(M^2).

Not compatible with online conditioning (`parallel/online_gp.py`), whose
update algebra assumes ``inv_k`` is the data-space precision; guarded at
``from_gp``.

Kernel-family generic: every term of the bound consumes only cross-kernel
blocks plus the stationary diagonal tr(K_NN) = N*sf2, so the SE and Matérn
ARD families (``GPConfig.kernel``) train through the identical program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models import gp_core
from gpmpc_tpu.models.gp_core import GPHypers, GPPosterior, _jitter_floor, _noise_var
from gpmpc_tpu.models.mean_functions import mean_value
from gpmpc_tpu.ops.kernels import kernel_cross, kernel_gram
from gpmpc_tpu.ops.chol import tri_solve
from gpmpc_tpu.ops.dispatch import cholesky_auto as cholesky_psd
from gpmpc_tpu.utils.config import GPConfig


def select_inducing(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """Greedy k-center (farthest-point) subset: indices of ``m`` rows of
    ``x`` (N, D) that cover the data, deterministically.

    Starts at the medoid (closest point to the mean) and repeatedly adds
    the point farthest from the current set.  O(N m) distance evaluations,
    each an (N,) vectorized op under ``lax.fori_loop`` — no Python loop
    over N.  Deterministic given ``x``, so a saved model can rebuild its
    inducing set from (X, M) alone.
    """
    n = x.shape[0]
    if not 1 <= m <= n:
        raise ValueError(f"inducing count m={m} must be in [1, N={n}]")
    first = jnp.argmin(jnp.sum((x - jnp.mean(x, axis=0)) ** 2, axis=1))
    idx = jnp.zeros(m, jnp.int32).at[0].set(first.astype(jnp.int32))
    mind = jnp.sum((x - x[first]) ** 2, axis=1)          # (N,)

    def body(i, carry):
        idx, mind = carry
        nxt = jnp.argmax(mind).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        d2 = jnp.sum((x - x[nxt]) ** 2, axis=1)
        return idx, jnp.minimum(mind, d2)

    idx, _ = jax.lax.fori_loop(1, m, body, (idx, mind))
    return idx


def _factor_terms(log_ell, log_sf2, log_sn2, z_ind, x, cfg: GPConfig):
    """Shared factorization: L_M = chol(K_MM), A = L_M^-1 K_MN / sigma,
    L_B = chol(I + A A^T).  One O(M^2 N) matmul + two O(M^3) Choleskys."""
    ell = jnp.exp(log_ell)
    sf2 = jnp.exp(log_sf2)
    sn2 = _noise_var(log_sn2, cfg)
    # The exact NLL's Gram gets sn2 >= min_noise on its diagonal, which
    # bounds its condition number no matter where L-BFGS pushes the
    # lengthscales.  K_MM has NO noise term — as ell grows it tends to
    # sf2*(ones + jit*I), condition ~ M/jit, which at the plain 50-ulp
    # floor (~6e-6 in f32) crosses f32's ~1e7 limit for M ~ 64 and lets
    # the factorization degrade mid-optimization (measured on v5e: the
    # VFE bound then diverges to -inf through the quad term below).
    # Mirror the guard with a dtype-aware floor ~800 ulps (1e-4 in f32,
    # cond(K_MM) <~ M*1e4; ~1.8e-13 in f64 where cfg.jitter dominates).
    jit = max(_jitter_floor(cfg, x.dtype),
              800.0 * float(jnp.finfo(x.dtype).eps))
    k_mm = kernel_gram(cfg.kernel, z_ind, ell, sf2, 0.0, jitter=jit)
    l_m = cholesky_psd(k_mm)
    k_mn = kernel_cross(cfg.kernel, z_ind, x, ell, sf2)  # (M, N)
    a = tri_solve(l_m, k_mn) / jnp.sqrt(sn2)             # (M, N)
    m_ind = z_ind.shape[0]
    b = jnp.eye(m_ind, dtype=x.dtype) + a @ a.T
    l_b = cholesky_psd(b)
    return l_m, a, l_b, sf2, sn2


def vfe_nll_single(log_ell: jnp.ndarray, log_sf2: jnp.ndarray,
                   log_sn2: jnp.ndarray, mean_w: jnp.ndarray,
                   z_ind: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   cfg: GPConfig, mean_func: str) -> jnp.ndarray:
    """Variational free energy (negative ELBO) for ONE output dimension —
    the sparse stand-in for ``gp_core.nll_single`` [SURVEY C4]:

        F = 0.5 [ N log(2 pi sn2) + log|B| + (r^T r - c^T c) / sn2 ]
            + (N sf2 / sn2 - tr(A A^T)) / 2        (Titsias trace term)

    with r = y - m(X), c = L_B^-1 A r.  F >= exact NLL for every Z, with
    equality at Z = X — the trace term penalizes unsummarized variance, so
    minimizing F trades fit against sparsity-induced overconfidence
    (plain FITC/DTC has no such guard).
    """
    import math
    n = x.shape[0]
    l_m, a, l_b, sf2, sn2 = _factor_terms(
        log_ell, log_sf2, log_sn2, z_ind, x, cfg)
    r = y - mean_value(x, mean_w, mean_func)
    c = tri_solve(l_b, a @ r)                            # (M,)
    # r^T r - c^T c >= 0 exactly (c is a projection of r), but the
    # difference is catastrophically cancellation-prone when the fit is
    # tight; a numerically-negative value scaled by 1/sn2 hands L-BFGS an
    # unbounded descent direction (bound -> -inf, NaN hypers — seen on
    # v5e f32 even at full matmul precision).  Clamping at 0 removes the
    # spurious descent while logdet + trace keep their gradients.
    quad = jnp.maximum(jnp.dot(r, r) - jnp.dot(c, c), 0.0) / sn2
    logdet = jnp.sum(jnp.log(jnp.diagonal(l_b))) + 0.5 * n * jnp.log(sn2)
    # n*sf2/sn2 = tr(K_NN)/sn2 >= tr(A A^T) exactly (Nystrom Q_NN <= K_NN),
    # but at ill-conditioned points (tiny lengthscales, K_MM near-singular)
    # the f32 tri_solve overestimates tr(A A^T) by orders of magnitude and
    # L-BFGS rides the difference to -1e6-scale "bounds" (measured).  Same
    # clamp as quad: both terms are provably nonnegative, and with both
    # clamps the whole objective is bounded below by the logdet terms.
    trace = 0.5 * jnp.maximum(n * sf2 / sn2 - jnp.sum(a * a), 0.0)
    nll = (0.5 * quad + logdet + 0.5 * n * math.log(2.0 * math.pi) + trace)
    prior = (max(cfg.ell_prior, 1e-4) * jnp.sum(log_ell ** 2)
             + 1e-4 * log_sn2 ** 2
             + max(cfg.sf2_prior, 1e-4) * log_sf2 ** 2)
    return nll + prior


def fit_sparse(x: jnp.ndarray, y: jnp.ndarray, z_ind: jnp.ndarray,
               cfg: GPConfig, key: jax.Array,
               mesh=None) -> Tuple[GPHypers, jnp.ndarray]:
    """Train all Ny sparse GPs (multistart L-BFGS on the VFE bound) — the
    sparse counterpart of ``gp_core.fit`` [SURVEY C4], same one-program
    (multistart x output-dim) grid.

    The grid gets one extra informed start: an EXACT fit on a small
    k-center subset (O(256^3) — negligible next to the VFE fit).  The VFE
    landscape has a wide "predict the mean" local optimum (trace term
    n*sf2/sn2 explodes when short initial lengthscales leave the inducing
    set unable to summarize, so L-BFGS kills sf2 / inflates sn2 instead);
    data-blind random starts land there for a fraction of output dims at
    production N (measured: 2-3 of 4 four-tank dims at held-out SMSE ~1.0
    from the heuristic grid alone, vs all dims ~5e-4 with the subset
    seed).  Subset-exact hypers start inside the good basin.
    """
    def nll_fn(log_ell, log_sf2, log_sn2, mean_w, xx, yy, cfg_, mf):
        return vfe_nll_single(log_ell, log_sf2, log_sn2, mean_w,
                              z_ind, xx, yy, cfg_, mf)

    n = x.shape[0]
    sub = select_inducing(x, min(n, 256))
    k_warm, key = jax.random.split(key)
    warm, _ = gp_core.fit(x[sub], y[sub], cfg, k_warm, mesh=mesh)
    return gp_core.fit(x, y, cfg, key, nll_fn=nll_fn, extra_starts=warm,
                       mesh=mesh)


def optimize_inducing(x: jnp.ndarray, y: jnp.ndarray, z0: jnp.ndarray,
                      hypers: GPHypers, cfg: GPConfig,
                      max_iters: int = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage-2 refinement of the inducing locations: L-BFGS on Z itself,
    minimizing the SUMMED per-dim VFE bound with the hyperparameters held
    fixed.

    Z is shared across all Ny output dims (the drop-in ``GPPosterior``
    carries one ``x`` field), so unlike the hyperparameters it cannot ride
    the per-dim multistart grid — it gets its own (M*D)-variable solve,
    warm-started from the greedy k-center subset.  The bound is
    differentiable in Z through the same two Choleskys the training pass
    already uses, so this is ~one extra `fit`-sized program, not new math.

    Returns ``(z_opt, total_bound)``.  Coordinate descent: callers
    typically re-fit the hyperparameters on ``z_opt`` afterwards
    (:meth:`gpmpc_tpu.models.gp.GP.train` with ``optimize_inducing=True``
    does fit -> Z-opt -> refit).
    """
    if max_iters is None:
        max_iters = cfg.max_iters

    def fun(t):
        def one(log_ell, log_sf2, log_sn2, mean_w, y_d):
            return vfe_nll_single(log_ell, log_sf2, log_sn2, mean_w,
                                  t["z"], x, y_d, cfg, cfg.mean_func)

        vals = jax.vmap(one, in_axes=(0, 0, 0, 0, 1))(
            hypers.log_ell, hypers.log_sf2, hypers.log_sn2,
            hypers.mean_w, y)
        return jnp.sum(vals)

    theta, val = gp_core._run_lbfgs(fun, {"z": z0}, max_iters, cfg.grad_tol)
    # L-BFGS can land on a NaN/degenerate point if two inducing points
    # merge and the K_MM factor collapses; keep the k-center set then
    ok = jnp.isfinite(val) & (val <= fun({"z": z0}))
    z_opt = jnp.where(ok, theta["z"], z0)
    return z_opt, jnp.where(ok, val, fun({"z": z0}))


def refit_sparse(x: jnp.ndarray, y: jnp.ndarray, z_ind: jnp.ndarray,
                 hypers: GPHypers, cfg: GPConfig
                 ) -> Tuple[GPHypers, jnp.ndarray]:
    """Re-fit the hyperparameters on a NEW inducing set, warm-started from
    already-trained values — the cheap second leg of the coordinate
    descent (single start per dim; the multistart exploration already
    happened in the first :func:`fit_sparse` pass)."""
    def fit_one(args):
        log_ell, log_sf2, log_sn2, mean_w, y_d = args
        theta0 = {"log_ell": log_ell, "log_sf2": log_sf2,
                  "log_sn2": log_sn2, "mean_w": mean_w}

        def fun(t):
            return vfe_nll_single(t["log_ell"], t["log_sf2"], t["log_sn2"],
                                  t["mean_w"], z_ind, x, y_d, cfg,
                                  cfg.mean_func)

        return gp_core._run_lbfgs(fun, theta0, cfg.max_iters, cfg.grad_tol)

    problems = (hypers.log_ell, hypers.log_sf2, hypers.log_sn2,
                hypers.mean_w, y.T)
    thetas, values = jax.lax.map(fit_one, problems)
    return GPHypers(log_ell=thetas["log_ell"], log_sf2=thetas["log_sf2"],
                    log_sn2=thetas["log_sn2"],
                    mean_w=thetas["mean_w"]), values


def sparse_posterior(x: jnp.ndarray, y: jnp.ndarray, z_ind: jnp.ndarray,
                     hypers: GPHypers, cfg: GPConfig) -> GPPosterior:
    """Precompute the VFE posterior as a drop-in :class:`GPPosterior`:

    ``x`` = Z (M, D), ``alpha`` = beta (Ny, M), ``inv_k`` = Lambda (Ny, M, M)
    with Lambda = K_MM^-1 - Sigma (PSD: Sigma = (K_MM + P)^-1 <= K_MM^-1
    for P >= 0), ``chol`` = L_M.  ``gp_core.predict`` and the ME/TA/EM
    propagators then evaluate the exact VFE predictive moments unchanged.
    """
    def one(log_ell, log_sf2, log_sn2, mean_w, y_d):
        l_m, a, l_b, _, sn2 = _factor_terms(
            log_ell, log_sf2, log_sn2, z_ind, x, cfg)
        r = y_d - mean_value(x, mean_w, cfg.mean_func)
        c = tri_solve(l_b, a @ r)                        # (M,)
        # beta = sigma^-1 L_M^-T L_B^-T c
        beta = tri_solve(l_m, tri_solve(l_b, c, trans=True),
                         trans=True) / jnp.sqrt(sn2)
        m_ind = z_ind.shape[0]
        eye = jnp.eye(m_ind, dtype=x.dtype)
        inv_lm = tri_solve(l_m, eye)                     # L_M^-1
        w = tri_solve(l_b, inv_lm)                       # L_B^-1 L_M^-1
        lam = inv_lm.T @ inv_lm - w.T @ w                # K_MM^-1 - Sigma
        return l_m, beta, lam

    l, beta, lam = jax.vmap(one, in_axes=(0, 0, 0, 0, 1))(
        hypers.log_ell, hypers.log_sf2, hypers.log_sn2, hypers.mean_w, y)
    return GPPosterior(x=z_ind, chol=l, alpha=beta, inv_k=lam, hypers=hypers)
