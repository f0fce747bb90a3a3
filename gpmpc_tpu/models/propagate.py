"""Uncertainty propagation through the GP dynamics model.

TPU-native rebuild of ``gp_mpc/gp_functions.py::{gp, gp_taylor_approx,
gp_exact_moment}`` [SURVEY C3b-d].  The reference builds these as CasADi SX
expressions embedded in the MPC's NLP graph; here they are pure JAX functions
traced into the same jitted program as the solver [SURVEY §1 "key
architectural fact"].

Three schemes, one signature.  Given GP input z ~ N(mu_z, Sigma_z) with
z = [x; u] (raw, unnormalized space):

* ME  (mean equivalent): output moments at the input mean only —
  mu = gp_mean(mu_z), Sigma = diag(gp_var(mu_z)); input covariance ignored.
* TA  (first-order Taylor, Girard et al. 2003): mean as ME;
  Sigma = diag(gp_var(mu_z)) + J Sigma_z J^T with J = d mu / d z computed by
  ``jax.jacfwd`` (autodiff replaces the reference's hand-derived kernel
  derivatives).
* EM  (exact moment matching, Candela/Girard/Rasmussen 2003; PILCO): exact
  output mean and FULL output covariance (cross-covariances between output
  dims included) for the SE-ARD kernel under Gaussian input; closed forms
  vectorized as batched matmuls.

Beyond-reference additions with the same signature: UT (unscented sigma
points, 2D+1 evaluations, any kernel/mean) and GH (tensor Gauss–Hermite
quadrature, order**D evaluations, any kernel/mean — converges to EM's
exact SE answer with order, and is the full-covariance scheme for the
Matérn families).

Each returns ``(mu_y (Ny,), Sigma_y (Ny,Ny), C (D,Ny))`` where
``C = cov(z, y)`` is the input-output cross-covariance (needed for delta-state
targets and hybrid models; zero for ME).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.models import gp_core
from gpmpc_tpu.ops.chol import (chol_small, tri_solve_small,
                                chol_logdet_small)
from gpmpc_tpu.utils.config import GPConfig


class Normalization(NamedTuple):
    """z-score statistics mapping raw <-> normalized spaces [SURVEY C5]."""

    z_mean: jnp.ndarray   # (D,)
    z_std: jnp.ndarray    # (D,)
    y_mean: jnp.ndarray   # (Ny,)
    y_std: jnp.ndarray    # (Ny,)

    @staticmethod
    def identity(d: int, ny: int, dtype=jnp.float32) -> "Normalization":
        return Normalization(jnp.zeros(d, dtype), jnp.ones(d, dtype),
                             jnp.zeros(ny, dtype), jnp.ones(ny, dtype))


def _raw_mean_var(post: gp_core.GPPosterior, norm: Normalization,
                  cfg: GPConfig, z_raw: jnp.ndarray):
    """Predictive mean/variance in raw space at a raw input point."""
    zn = (z_raw - norm.z_mean) / norm.z_std
    mu_n, var_n = gp_core.predict(post, zn, cfg)
    return norm.y_mean + norm.y_std * mu_n, (norm.y_std ** 2) * var_n


# ------------------------------------------------------------------ ME

def propagate_me(post: gp_core.GPPosterior, norm: Normalization,
                 cfg: GPConfig, mu_z: jnp.ndarray, cov_z: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mean-equivalent: input covariance ignored [SURVEY C3b/§3.3 'ME']."""
    mu, var = _raw_mean_var(post, norm, cfg, mu_z)
    d = mu_z.shape[0]
    c = jnp.zeros((d, mu.shape[0]), dtype=mu.dtype)
    return mu, jnp.diag(var), c


# ------------------------------------------------------------------ TA

def propagate_ta(post: gp_core.GPPosterior, norm: Normalization,
                 cfg: GPConfig, mu_z: jnp.ndarray, cov_z: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """First-order Taylor (Girard 2003) [SURVEY C3c].

    Sigma_y = diag(var(mu_z)) + J Sigma_z J^T,  C = Sigma_z J^T.
    """
    def mean_fn(z):
        return _raw_mean_var(post, norm, cfg, z)[0]

    mu, var = _raw_mean_var(post, norm, cfg, mu_z)
    jac = jax.jacfwd(mean_fn)(mu_z)                     # (Ny, D)
    sigma = jnp.diag(var) + jac @ cov_z @ jac.T
    c = cov_z @ jac.T                                   # (D, Ny)
    return mu, sigma, c


# ------------------------------------------------------------------ EM

def propagate_em(post: gp_core.GPPosterior, norm: Normalization,
                 cfg: GPConfig, mu_z: jnp.ndarray, cov_z: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact moment matching for the SE-ARD kernel under Gaussian input
    [SURVEY C3d]; Candela/Girard/Rasmussen 2003 eqns (PILCO forms).

    Requires a zero prior mean (in normalized space) — enforced by the GP
    wrapper when ``gp_method='EM'`` is selected.

    All training-point sums are batched matmuls: per output dim the q-vector
    is one triangular solve + row-reduction; the pairwise Q-matrix for each
    output pair (a, b) factorizes into rank-structured terms whose coupling
    is a single (N, D) x (D, N) matmul — MXU work, no Python loops.
    """
    if cfg.kernel != "se":
        raise ValueError("exact moment matching is SE-specific "
                         f"(kernel={cfg.kernel!r}); use ME/TA/UT")
    h = post.hypers
    x = post.x                                          # (N, D) normalized
    n, d = x.shape
    ny = h.log_sf2.shape[0]
    dtype = mu_z.dtype

    # move the Gaussian into normalized input space
    m = (mu_z - norm.z_mean) / norm.z_std
    s = cov_z / (norm.z_std[:, None] * norm.z_std[None, :])

    nu = x - m[None, :]                                 # (N, D)
    beta = post.alpha                                   # (Ny, N)
    ell2 = jnp.exp(2.0 * h.log_ell)                     # (Ny, D)
    sf2 = jnp.exp(h.log_sf2)                            # (Ny,)
    eye_d = jnp.eye(d, dtype=dtype)

    # ---- per-dim mean + cross-covariance --------------------------------
    # NOTE: all small factorizations below use the trace-time-unrolled
    # routines from ops.chol — batched LAPACK-style HLOs (vmapped cholesky /
    # triangular_solve) are pathologically slow on this TPU backend.
    def per_dim(ell2_a, sf2_a, beta_a):
        t = s + jnp.diag(ell2_a)                        # S + Lambda_a (SPD)
        lt = chol_small(t)
        # (S + Lam)^-1 nu_i for all i: solve with chol, (D, N)
        sol = tri_solve_small(lt, nu.T)
        quad = jnp.sum(sol * sol, axis=0)               # nu^T T^-1 nu, (N,)
        # |S Lam^-1 + I|^{-1/2} = |Lam|^{1/2} |S + Lam|^{-1/2}
        logdet = (0.5 * jnp.sum(jnp.log(ell2_a))
                  - 0.5 * chol_logdet_small(lt))
        q = sf2_a * jnp.exp(logdet - 0.5 * quad)        # (N,)
        mu_a = jnp.dot(beta_a, q)
        tinv_nu = tri_solve_small(lt, sol, trans=True)  # T^-1 nu_i, (D, N)
        c_a = (s @ tinv_nu) @ (beta_a * q)              # (D,)
        return mu_a, q, c_a

    mu_n, q_all, c_n = jax.vmap(per_dim)(ell2, sf2, beta)
    # c_n: (Ny, D) -> cross-cov (D, Ny)
    c_n = c_n.T

    # ---- pairwise covariance -------------------------------------------
    # log k_a(x_i, m) for all dims a and points i: (Ny, N)
    def log_k(ell2_a, sf2_a):
        return jnp.log(sf2_a) - 0.5 * jnp.sum(nu * nu / ell2_a, axis=1)

    log_km = jax.vmap(log_k)(ell2, sf2)

    def pair(a, b):
        il_a = 1.0 / ell2[a]                            # (D,)
        il_b = 1.0 / ell2[b]
        # R = S P + I with P = diag(il_a + il_b) is not symmetric; use the
        # Woodbury form with M = I + sqrt(P) S sqrt(P) (SPD):
        #   R^{-1} S = S - S sqrt(P) M^{-1} sqrt(P) S,   det R = det M.
        dsq = jnp.sqrt(il_a + il_b)                     # (D,)
        m = eye_d + dsq[:, None] * s * dsq[None, :]
        lm = chol_small(m)
        sd = s * dsq[None, :]                           # S sqrt(P), (D, D)
        minv_sd = tri_solve_small(lm, tri_solve_small(lm, sd.T), trans=True)
        ris = s - sd @ minv_sd                          # symmetric R^{-1} S
        logdet_r = chol_logdet_small(lm)
        u = nu * il_a[None, :]                          # (N, D)
        v = nu * il_b[None, :]                          # (N, D)
        # matmuls below are PINNED to full f32 fidelity regardless of the
        # global matmul-precision setting: uv sits in an exponent (bf16's
        # 4e-3 relative noise becomes multiplicative on q2), and the
        # beta^T Q2 beta - mu_a mu_b covariance is a difference of
        # comparable quadratic forms — the same cancellation class that
        # measurably corrupted the Gram path (RESULTS.md round 3b)
        hi = jax.lax.Precision.HIGHEST
        uu = jnp.sum((u @ ris) * u, axis=1)             # (N,)
        vv = jnp.sum((v @ ris) * v, axis=1)             # (N,)
        uv = jnp.matmul(jnp.matmul(u, ris, precision=hi), v.T,
                        precision=hi)                   # (N, N) matmul
        log_q2 = (log_km[a][:, None] + log_km[b][None, :]
                  - 0.5 * logdet_r
                  + 0.5 * (uu[:, None] + vv[None, :]) + uv)
        q2 = jnp.exp(log_q2)
        val = (jnp.dot(jnp.matmul(beta[a], q2, precision=hi), beta[b],
                       precision=hi)
               - mu_n[a] * mu_n[b])
        diag_term = sf2[a] - jnp.sum(post.inv_k[a] * q2)
        return val + jnp.where(a == b, diag_term, 0.0)

    # symmetry: only the Ny(Ny+1)/2 upper-triangle pairs are computed
    # (static index lists), then scattered into the symmetric matrix
    import numpy as _np
    iu, ju = _np.triu_indices(ny)
    vals = jax.vmap(pair)(jnp.asarray(iu), jnp.asarray(ju))
    sigma_n = jnp.zeros((ny, ny), dtype=dtype)
    sigma_n = sigma_n.at[iu, ju].set(vals)
    sigma_n = sigma_n.at[ju, iu].set(vals)

    # ---- denormalize ----------------------------------------------------
    mu = norm.y_mean + norm.y_std * mu_n
    sigma = sigma_n * (norm.y_std[:, None] * norm.y_std[None, :])
    c = c_n * (norm.z_std[:, None] * norm.y_std[None, :])
    return mu, sigma, c


# ------------------------------------------------------------------ UT

def propagate_ut(post: gp_core.GPPosterior, norm: Normalization,
                 cfg: GPConfig, mu_z: jnp.ndarray, cov_z: jnp.ndarray,
                 *, alpha: float = 1.0, beta: float = 2.0,
                 kappa: float = 0.0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unscented-transform propagation (sigma points through the GP mean).

    Beyond the reference's ME/TA/EM set [SURVEY C3]: the standard GP-UKF
    scheme (Ko & Fox 2009) — deterministic sigma points of the input
    Gaussian pushed through the posterior mean, with the GP's own
    predictive variance folded in as the sigma-point-weighted process
    noise.  Exact for GP means up to odd third-order input terms (one
    order beyond TA's linearization), at 2D+1 mean/variance evaluations
    per step instead of EM's O(N^2) pairwise forms — the middle point of
    the accuracy/cost frontier, and unlike EM it supports all mean
    functions.

    Default scaling (alpha=1, kappa=0, beta=2) keeps every covariance
    weight nonnegative, so ``Sigma_y`` is PSD by construction — the
    property the MPC's chance tightening needs along the horizon.

    Vs TA on a near-linear mean: the deviation terms coincide with
    J Sigma_z J^T, but the additive GP-variance term is the sigma-point
    average E[var(z)] (law of total variance) rather than TA's var(mu_z)
    — second-order-different, and the better estimate of the two.
    """
    d = mu_z.shape[0]
    dtype = mu_z.dtype
    lam = alpha * alpha * (d + kappa) - d
    # matrix square root of (d+lam) Sigma_z; the jitter floor keeps the
    # factorization (and its jacfwd derivative inside the solver trace)
    # defined at Sigma_z = 0, the t=0 stage of every rollout
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-8, dtype)
    root = chol_small((d + lam) * cov_z + eps * jnp.eye(d, dtype=dtype))
    offsets = jnp.concatenate(
        [jnp.zeros((1, d), dtype), root.T, -root.T], axis=0)  # (2D+1, D)
    pts = mu_z[None, :] + offsets
    w_m = jnp.concatenate(
        [jnp.full((1,), lam / (d + lam), dtype),
         jnp.full((2 * d,), 0.5 / (d + lam), dtype)])
    w_c = w_m.at[0].add(1.0 - alpha * alpha + beta)

    mus, vars_ = jax.vmap(
        lambda z: _raw_mean_var(post, norm, cfg, z))(pts)   # (2D+1, Ny)
    mu = w_m @ mus
    dev = mus - mu[None, :]                                 # (2D+1, Ny)
    sigma = (dev * w_c[:, None]).T @ dev + jnp.diag(w_m @ vars_)
    c = (offsets * w_c[:, None]).T @ dev                    # (D, Ny)
    return mu, sigma, c


def _tensor_gh_rule(d: int, order: int):
    """Tensor-product Gauss–Hermite nodes/weights for N(0, I_d).

    order**d points, ALL weights positive (Sigma_y PSD by construction).
    Exact for polynomial integrands up to per-dim degree 2*order-1.
    """
    import numpy as _np
    n_pts = order ** d
    if n_pts > 20000:
        raise ValueError(
            f"GH tensor grid has order**D = {order}**{d} = {n_pts} points "
            "(cap 20000); lower `order`, use gh_grid='cubature5' "
            "(2 D^2 + 1 points), or gp_method='UT'")
    # probabilists' Hermite: sum_i w_i f(x_i) ~ sqrt(2 pi) E[f(X)], X~N(0,1)
    nodes_1d, w_1d = _np.polynomial.hermite_e.hermegauss(order)
    w_1d = w_1d / _np.sqrt(2.0 * _np.pi)                 # normalized: sum=1
    grids = _np.meshgrid(*([nodes_1d] * d), indexing="ij")
    xi = _np.stack([g.reshape(-1) for g in grids], axis=-1)     # (P, D)
    wg = _np.ones(n_pts)
    for g in _np.meshgrid(*([w_1d] * d), indexing="ij"):
        wg = wg * g.reshape(-1)
    return xi, wg


def _cubature5_rule(d: int):
    """Degree-5 fully symmetric cubature for N(0, I_d) in 2 d^2 + 1 points
    (McNamee–Stenger 1967; the rule behind the 5th-degree cubature Kalman
    filter).  Point sets: origin; +-sqrt(d+2) e_i; sqrt((d+2)/2)(+-e_i+-e_j).

    Exact for ALL polynomials of total degree <= 5 — the same degree the
    order-3 TENSOR grid is exact for per dim — at 129 points for d=8
    instead of 6561.  CAVEAT: the axial weight (4-d)/(2(d+2)^2) is negative
    for d > 4, so the quadrature covariance is not PSD by construction; the
    caller must clip (see propagate_gh's eigenvalue floor).
    """
    import numpy as _np
    w0 = 2.0 / (d + 2.0)
    w1 = (4.0 - d) / (2.0 * (d + 2.0) ** 2)
    w2 = 1.0 / (d + 2.0) ** 2
    pts = [_np.zeros((1, d))]
    wts = [_np.full(1, w0)]
    r1 = _np.sqrt(d + 2.0)
    eye = _np.eye(d)
    pts += [r1 * eye, -r1 * eye]
    wts += [_np.full(d, w1), _np.full(d, w1)]
    r2 = _np.sqrt((d + 2.0) / 2.0)
    iu, ju = _np.triu_indices(d, k=1)
    for sa, sb in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        pts.append(r2 * (sa * eye[iu] + sb * eye[ju]))
        wts.append(_np.full(iu.shape[0], w2))
    return _np.concatenate(pts, axis=0), _np.concatenate(wts)


def propagate_gh(post: gp_core.GPPosterior, norm: Normalization,
                 cfg: GPConfig, mu_z: jnp.ndarray, cov_z: jnp.ndarray,
                 *, order: int = 3, grid: str = "auto"
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gauss–Hermite / cubature moment matching (beyond-reference).

    Quadrature of the exact moment integrals

        mu_y    = E[mu(z)],
        Sigma_y = Cov[mu(z)] + E[diag(var(z))],
        C       = Cov[z, mu(z)],

    under z ~ N(mu_z, Sigma_z).  Unlike EM's closed forms [SURVEY C3d]
    this is KERNEL-GENERIC: the full-covariance moment-matching scheme for
    the Matérn families (and any mean function), converging to EM's exact
    SE answer with quadrature accuracy.

    ``grid`` selects the point set:

    * ``'tensor'`` — order**D Gauss–Hermite tensor grid; per input dim
      exact to degree 2*order-1 (order=3: degree 5 per dim); all weights
      positive, so Sigma_y is PSD by construction.  The right choice up
      to D~6 (four-tank: 3**6 = 729 points x N~100 rows — one (P, N)
      cross-kernel matmul the MXU eats).
    * ``'cubature5'`` — degree-5 fully symmetric sparse cubature in
      2 D^2 + 1 points (McNamee–Stenger); exact for total degree <= 5.
      The right choice for D >= 8 (quadrotor hybrid: 129 points instead
      of 6561).  Its axial weights are negative for D > 4, so Sigma_y is
      eigenvalue-floored at 0 here (branchless eigh clip; Ny x Ny is
      tiny) to restore the PSD guarantee the chance tightening needs.
    * ``'auto'`` (default) — tensor while order**D <= 1000; above that,
      switches to cubature5 ONLY when order <= 3 (cubature5 is a
      degree-5 rule — substituting it for an explicitly requested
      higher-order tensor grid would silently downgrade accuracy, so
      those still go tensor and hit its cap).  D<=6 keeps the old
      tensor behavior exactly; D>=7 at the default order 3 switches to
      the sparse rule instead of exploding.

    Nodes/weights are trace-time numpy constants (static shapes).
    """
    import numpy as _np
    d = mu_z.shape[0]
    dtype = mu_z.dtype
    if grid not in ("auto", "tensor", "cubature5"):
        raise ValueError(f"gh_grid must be 'auto'|'tensor'|'cubature5'; "
                         f"got {grid!r}")
    use_cub = (grid == "cubature5"
               or (grid == "auto" and order <= 3 and order ** d > 1000))
    if use_cub:
        xi, wg = _cubature5_rule(d)
        clip_psd = d > 4        # negative axial weights only for d > 4
    else:
        xi, wg = _tensor_gh_rule(d, order)
        clip_psd = False
    xi = jnp.asarray(xi, dtype)
    wg = jnp.asarray(wg, dtype)

    # same jitter floor as UT: keeps the factorization (and its jacfwd
    # derivative inside the solver trace) defined at Sigma_z = 0
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-8, dtype)
    root = chol_small(cov_z + eps * jnp.eye(d, dtype=dtype))     # lower
    offsets = xi @ root.T                                        # (P, D)
    pts = mu_z[None, :] + offsets

    mus, vars_ = jax.vmap(
        lambda z: _raw_mean_var(post, norm, cfg, z))(pts)        # (P, Ny)
    mu = wg @ mus
    dev = mus - mu[None, :]                                      # (P, Ny)
    sigma = (dev * wg[:, None]).T @ dev + jnp.diag(wg @ vars_)
    if clip_psd:
        # negative cubature weights can push tiny eigenvalues below zero;
        # floor them branchlessly (Ny x Ny eigh — tiny)
        sigma = 0.5 * (sigma + sigma.T)
        evals, evecs = jnp.linalg.eigh(sigma)
        sigma = (evecs * jnp.maximum(evals, 0.0)) @ evecs.T
    c = (offsets * wg[:, None]).T @ dev                          # (D, Ny)
    return mu, sigma, c


PROPAGATORS = {
    "ME": propagate_me,
    "TA": propagate_ta,
    "EM": propagate_em,
    "UT": propagate_ut,
    "GH": propagate_gh,
}


def get_propagator(method: str):
    """Select the propagation scheme [SURVEY C5 ``set_method('ME'|'TA'|'EM')``;
    'UT' and 'GH' are beyond-reference additions]."""
    try:
        return PROPAGATORS[method.upper()]
    except KeyError:
        raise ValueError(
            f"unknown gp_method {method!r}; expected ME, TA, EM, UT, or GH"
        ) from None
