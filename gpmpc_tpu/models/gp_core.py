"""Functional GP core: NLL, hyperparameter training, posterior, prediction.

TPU-native rebuild of the reference's GP math and trainer:

* NLL / training — ``gp_mpc/optimize.py::{calc_NLL, train_gp}`` [SURVEY C4]:
  per output dim d, K = K_SE + sn2*I, L = chol(K), alpha = K^{-1}(y - m(X)),
  NLL = 0.5 y^T alpha + sum(log diag L) + (N/2) log 2pi, minimized over
  theta_d with multistart.  The reference solves this with IPOPT under
  positivity bounds, one output dim at a time, in a Python loop; here the
  hypers live in log space (unconstrained), the optimizer is on-device L-BFGS
  (optax), and both the Ny output dims *and* the multistart restarts are a
  single ``vmap`` — one compiled program trains every GP at once.

* Prediction — ``gp_mpc/gp_functions.py::gp`` [SURVEY C3b]: per dim,
  mu = m(z) + k*^T alpha, var = sf2 - k*^T K^{-1} k*.

All shapes are static; everything is jit/vmap-safe.  Inputs here are in
*normalized* space — the :class:`gpmpc_tpu.models.gp.GP` wrapper owns
normalization [SURVEY C5].
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu

from gpmpc_tpu.ops.kernels import kernel_cross
from gpmpc_tpu.ops.dispatch import kernel_gram_auto
from gpmpc_tpu.ops.dispatch import cholesky_auto as cholesky_psd
from gpmpc_tpu.ops.chol import chol_solve, tri_solve
from gpmpc_tpu.models.mean_functions import mean_value, num_mean_params
from gpmpc_tpu.utils.config import GPConfig


class GPHypers(NamedTuple):
    """Stacked hyperparameters, one row per output dimension (Ny leading)."""

    log_ell: jnp.ndarray    # (Ny, D) log lengthscales
    log_sf2: jnp.ndarray    # (Ny,)   log signal variance
    log_sn2: jnp.ndarray    # (Ny,)   log noise variance
    mean_w: jnp.ndarray     # (Ny, F) mean-function weights (F may be 0)

    @property
    def ell(self):
        return jnp.exp(self.log_ell)

    @property
    def sf2(self):
        return jnp.exp(self.log_sf2)

    @property
    def sn2(self):
        return jnp.exp(self.log_sn2)


class GPPosterior(NamedTuple):
    """Precomputed per-dim factorizations, the analog of the reference's
    stored ``invK``/``alpha``/``chol`` [SURVEY C5, §3.2]."""

    x: jnp.ndarray          # (N, D) training inputs (normalized)
    chol: jnp.ndarray       # (Ny, N, N) lower Cholesky of K + sn2 I
    alpha: jnp.ndarray      # (Ny, N) K^{-1} (y - m(X))
    inv_k: jnp.ndarray      # (Ny, N, N) explicit inverse (EM propagation path)
    hypers: GPHypers


def _noise_var(log_sn2: jnp.ndarray, cfg: GPConfig) -> jnp.ndarray:
    return jnp.exp(log_sn2) + cfg.min_noise


def _jitter_floor(cfg: GPConfig, dtype) -> float:
    """Dtype-aware jitter floor (~50 ulps of the signal variance): the f32
    Gram carries ~eps*sf2*N rounding from the norms-minus-cross-products
    form, which a fixed 1e-8-scale jitter cannot cover.  Used by BOTH the
    training NLL and the served posterior so they factor the same Gram
    matrix (ADVICE r2: a floor applied only at serve time meant the trained
    NLL and the posterior saw slightly different K in f32)."""
    return max(cfg.jitter, 50.0 * float(jnp.finfo(dtype).eps))


def nll_single(log_ell: jnp.ndarray, log_sf2: jnp.ndarray,
               log_sn2: jnp.ndarray, mean_w: jnp.ndarray,
               x: jnp.ndarray, y: jnp.ndarray, cfg: GPConfig,
               mean_func: str) -> jnp.ndarray:
    """Negative log marginal likelihood for ONE output dimension.

    Parity target: ``gp_mpc/optimize.py::calc_NLL`` [SURVEY C4, §3.2].
    """
    n = x.shape[0]
    sf2 = jnp.exp(log_sf2)
    sn2 = _noise_var(log_sn2, cfg)
    k = kernel_gram_auto(cfg.kernel, x, jnp.exp(log_ell), sf2, sn2,
                         jitter=_jitter_floor(cfg, x.dtype))
    l = cholesky_psd(k)
    r = y - mean_value(x, mean_w, mean_func)
    a = chol_solve(l, r)
    nll = (0.5 * jnp.dot(r, a)
           + jnp.sum(jnp.log(jnp.diagonal(l)))
           + 0.5 * n * math.log(2.0 * math.pi))
    # log-space priors: a weak 1e-4 floor keeps L-BFGS out of overflow
    # territory (the reference's IPOPT bounds / lam_x regularization play
    # this role [SURVEY C4, confidence L]); the ell/sf2 terms additionally
    # carry the variance-calibration priors (GPConfig.{ell,sf2}_prior:
    # keep the fit off the flat ell,sf2->inf linear-kernel ridge, whose
    # numerically-singular Gram yields garbage predictive variances and
    # breaks every uncertainty consumer downstream)
    prior = (max(cfg.ell_prior, 1e-4) * jnp.sum(log_ell ** 2)
             + 1e-4 * log_sn2 ** 2
             + max(cfg.sf2_prior, 1e-4) * log_sf2 ** 2)
    return nll + prior


def _init_hypers(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
                 n_starts: int, mean_func: str) -> GPHypers:
    """Data-driven multistart initializations (stacked over starts and dims).

    Base point: lengthscales at the per-dim input std, signal variance at
    var(y), noise at var(y)/100; restarts perturb in log space.
    """
    n, d = x.shape
    ny = y.shape[1]
    f = num_mean_params(mean_func, d)
    x_std = jnp.std(x, axis=0) + 1e-8
    y_var = jnp.var(y, axis=0) + 1e-8

    base_log_ell = jnp.broadcast_to(jnp.log(x_std), (ny, d))
    base_log_sf2 = jnp.log(y_var)
    base_log_sn2 = jnp.log(y_var) - jnp.log(100.0)

    # perturbations carry the DATA's dtype: the default (f64 under x64)
    # silently promoted the whole hyperparameter fit and posterior of an
    # f32 model to f64 — an f32 Model + GP under jax_enable_x64 then failed
    # scan carry-type checks in the controller (found round 3 via the car
    # bench on CPU)
    k1, k2, k3 = jax.random.split(key, 3)
    pert_ell = jax.random.normal(k1, (n_starts, ny, d), x.dtype) * 0.7
    pert_sf2 = jax.random.normal(k2, (n_starts, ny), x.dtype) * 0.7
    pert_sn2 = jax.random.normal(k3, (n_starts, ny), x.dtype) * 1.5
    # first start is the unperturbed heuristic
    pert_ell = pert_ell.at[0].set(0.0)
    pert_sf2 = pert_sf2.at[0].set(0.0)
    pert_sn2 = pert_sn2.at[0].set(0.0)

    return GPHypers(
        log_ell=base_log_ell[None] + pert_ell,
        log_sf2=base_log_sf2[None] + pert_sf2,
        log_sn2=base_log_sn2[None] + pert_sn2,
        mean_w=jnp.zeros((n_starts, ny, f), dtype=x.dtype),
    )


def _run_lbfgs(fun, theta0, max_iters: int, tol: float):
    """Minimize ``fun`` from ``theta0`` with optax L-BFGS under a
    ``lax.while_loop`` (bounded iterations, jit/vmap-safe)."""
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        theta, state = carry
        value, grad = value_and_grad(theta, state=state)
        updates, state = opt.update(grad, state, theta, value=value,
                                    grad=grad, value_fn=fun)
        theta = optax.apply_updates(theta, updates)
        return theta, state

    def cont(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        err = otu.tree_norm(grad)
        return (count == 0) | ((count < max_iters) & (err >= tol))

    theta, state = jax.lax.while_loop(cont, step, (theta0, opt.init(theta0)))
    return theta, fun(theta)


def fit(x: jnp.ndarray, y: jnp.ndarray, cfg: GPConfig,
        key: jax.Array, nll_fn=None,
        extra_starts: GPHypers = None,
        mesh=None) -> Tuple[GPHypers, jnp.ndarray]:
    """Train all Ny GPs with multistart; returns best hypers + final NLLs.

    Parity target: ``gp_mpc/optimize.py::train_gp`` [SURVEY C4] — but the
    (multistart x output-dim) grid runs as one vmapped compiled program
    instead of a sequential Python loop over IPOPT calls [SURVEY §2.3 DP row].

    ``nll_fn`` (same signature as :func:`nll_single`) swaps the per-dim
    objective — used by :mod:`gpmpc_tpu.models.sparse` to train on the
    variational free energy bound with the identical multistart machinery.

    ``extra_starts`` appends informed initializations (per-dim ``GPHypers``,
    Ny leading) to the random-perturbation grid — the sparse path seeds the
    VFE fit with an exact subset fit this way, because the VFE landscape
    has a wide "predict the mean" basin that swallows data-blind starts.

    ``mesh`` (any ``jax.sharding.Mesh``; the grid shards over ALL of its
    axes, so both the 1D ``("dp",)`` and the multi-host 2D
    ``("dcn", "dp")`` layouts work unchanged) shards the
    (multistart x Ny) problem grid over its devices with ``shard_map``
    (data parallelism over independent training problems; the grid is
    padded to a device multiple with copies of problem 0 and the pad is
    discarded).  Results are identical to the unsharded fit — each
    problem is solved by the same per-problem program, just on a
    different device [SURVEY §2.3 'DP over GP training'].
    """
    ny = y.shape[1]
    s = cfg.multistart
    starts = _init_hypers(key, x, y, s, cfg.mean_func)
    if extra_starts is not None:
        starts = GPHypers(*(jnp.concatenate([a, b[None].astype(a.dtype)])
                            for a, b in zip(starts, extra_starts)))
        s = s + 1
    nll = nll_fn if nll_fn is not None else nll_single

    def fit_one_x(xr, args):
        log_ell, log_sf2, log_sn2, mean_w, y_d = args
        theta0 = {"log_ell": log_ell, "log_sf2": log_sf2,
                  "log_sn2": log_sn2, "mean_w": mean_w}

        def fun(t):
            return nll(t["log_ell"], t["log_sf2"], t["log_sn2"],
                       t["mean_w"], xr, y_d, cfg, cfg.mean_func)

        return _run_lbfgs(fun, theta0, cfg.max_iters, cfg.grad_tol)

    def fit_one(args):
        return fit_one_x(x, args)

    # the (multistart x output-dim) grid runs under lax.map, NOT vmap: the
    # per-problem Cholesky/linesearch stays unbatched, which this backend
    # executes ~3x faster (and compiles ~12x faster) than the batched form
    # (batched LAPACK-style HLOs are pathological here)
    problems = (
        starts.log_ell.reshape(s * ny, -1),
        starts.log_sf2.reshape(s * ny),
        starts.log_sn2.reshape(s * ny),
        starts.mean_w.reshape(s * ny, -1),
        jnp.tile(y.T, (s, 1)),                 # (S*Ny, N)
    )
    if mesh is not None:
        from jax.sharding import PartitionSpec as _P

        # the problem-grid axis shards over ALL mesh axes: a 1D ("dp",)
        # mesh and a multi-host 2D ("dcn", "dp") mesh (parallel.
        # distributed.make_study_mesh) run the identical program
        axis = tuple(mesh.axis_names)
        n_dev = int(math.prod(mesh.devices.shape))
        total = s * ny
        pad = (-total) % n_dev
        if pad:
            problems = tuple(jnp.concatenate(
                [p, jnp.broadcast_to(p[:1], (pad,) + p.shape[1:])])
                for p in problems)

        def shard_fit(xr, *probs):
            # x rides replicated; each device lax.maps its problem shard
            return jax.lax.map(lambda args: fit_one_x(xr, args), probs)

        mapped = jax.shard_map(
            shard_fit, mesh=mesh,
            in_specs=(_P(),) + (_P(axis),) * len(problems),
            out_specs=(jax.tree.map(lambda _: _P(axis),
                                    {"log_ell": 0, "log_sf2": 0,
                                     "log_sn2": 0, "mean_w": 0}),
                       _P(axis)),
            # optax's L-BFGS recovery cond mixes replicated and varying
            # outputs, which the static varying-axis checker rejects even
            # though the program is correct (every operand is per-shard)
            check_vma=False)
        thetas, values = jax.jit(mapped)(x, *problems)
        if pad:
            thetas = jax.tree.map(lambda a: a[:total], thetas)
            values = values[:total]
    else:
        thetas, values = jax.lax.map(fit_one, problems)
    values = jnp.where(jnp.isfinite(values), values, jnp.inf)
    values = values.reshape(s, ny)
    thetas = jax.tree.map(lambda a: a.reshape(s, ny, *a.shape[1:]), thetas)
    best = jnp.argmin(values, axis=0)                      # (Ny,)
    dims = jnp.arange(ny)
    hypers = GPHypers(
        log_ell=thetas["log_ell"][best, dims],
        log_sf2=thetas["log_sf2"][best, dims],
        log_sn2=thetas["log_sn2"][best, dims],
        mean_w=thetas["mean_w"][best, dims],
    )
    return hypers, values[best, dims]


def posterior(x: jnp.ndarray, y: jnp.ndarray, hypers: GPHypers,
              cfg: GPConfig) -> GPPosterior:
    """Precompute per-dim chol/alpha/invK [SURVEY C5 'per-dim invK'].

    The factorization is guarded for the f32 production path: the jitter
    floor is dtype-aware (f32 Gram construction carries ~eps*sf2*N rounding
    from the norms-minus-cross-products form, which a fixed 1e-8-scale
    jitter cannot cover), and a failed Cholesky is retried at escalating
    jitter — hyperparameters trained in x64 can sit exactly on an f32
    conditioning cliff (measured: benchmarks/device_parity.py's x64 fit
    drives sn2 to ~2e-8 with sf2 ~ 40; the unguarded factor NaN'd and the
    controller silently applied zero input)."""
    eye = jnp.eye(x.shape[0], dtype=x.dtype)
    jit_floor = _jitter_floor(cfg, x.dtype)

    def one(log_ell, log_sf2, log_sn2, mean_w, y_d):
        sn2 = _noise_var(log_sn2, cfg)
        sf2 = jnp.exp(log_sf2)
        k = kernel_gram_auto(cfg.kernel, x, jnp.exp(log_ell), sf2, sn2,
                             jitter=jit_floor)

        def try_factor(kk):
            # failure = NaN (jnp.linalg.cholesky) OR finite garbage (a
            # backend that clamps non-PD pivots, e.g. the Pallas blocked
            # kernel); the reconstruction test catches both.  Threshold is
            # deliberately loose (0.1): a clamped-pivot garbage factor has
            # reconstruction error of ~1e10, while a SUCCESSFUL factor on
            # TPU can show ~1e-3 (XLA's f32 Cholesky runs bf16 passes
            # internally) — a tight threshold here silently escalated the
            # jitter on perfectly good factors and changed the posterior
            l = cholesky_psd(kk)
            err = jnp.max(jnp.abs(l @ l.T - kk)) / (1.0 + jnp.max(jnp.abs(kk)))
            return l, (~jnp.all(jnp.isfinite(l))) | (err > 0.1)

        l, bad = try_factor(k)
        # the retries run unconditionally: ``one`` executes under vmap,
        # where lax.cond lowers to select (both branches evaluated anyway),
        # so gating buys nothing — and posterior() is a once-per-training
        # cost, not a hot-path one (ADVICE r2 considered and documented)
        for mult in (1e2, 1e4):          # escalate on a failed factor
            l_retry, bad_retry = try_factor(
                k + (mult * jit_floor) * sf2 * eye)
            l = jnp.where(bad, l_retry, l)
            bad = bad & bad_retry
        r = y_d - mean_value(x, mean_w, cfg.mean_func)
        alpha = chol_solve(l, r)
        inv_l = tri_solve(l, jnp.eye(x.shape[0], dtype=x.dtype))
        inv_k = inv_l.T @ inv_l
        return l, alpha, inv_k

    l, alpha, inv_k = jax.vmap(one, in_axes=(0, 0, 0, 0, 1))(
        hypers.log_ell, hypers.log_sf2, hypers.log_sn2, hypers.mean_w, y)
    return GPPosterior(x=x, chol=l, alpha=alpha, inv_k=inv_k, hypers=hypers)


def predict(post: GPPosterior, z: jnp.ndarray, cfg: GPConfig
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic-input predictive mean/variance at z: (D,) -> ((Ny,), (Ny,)).

    Parity target: ``gp_mpc/gp_functions.py::gp`` [SURVEY C3b].
    """
    def one(log_ell, log_sf2, log_sn2, mean_w, alpha, inv_k):
        ks = kernel_cross(cfg.kernel, z[None, :], post.x, jnp.exp(log_ell),
                          jnp.exp(log_sf2))[0]                    # (N,)
        mu = mean_value(z, mean_w, cfg.mean_func) + jnp.dot(ks, alpha)
        # variance via the precomputed explicit inverse: two matvecs that
        # batch/vmap onto the MXU.  (A vmapped triangular solve here costs
        # ~0.3 ms EACH on TPU — catastrophic inside the per-stage scan of
        # covariance propagation; invK turns it into fused matmuls.)
        # Pinned to full f32 fidelity: near data k*^T K^-1 k* approaches
        # sf2, so var is a small difference of large quadratic forms — a
        # single-pass bf16 matvec leaves ~4e-3*sf2 of noise in a variance
        # whose honest value can be 1e-4*sf2 (tightening then inflates on
        # rounding error, not uncertainty)
        hi = jax.lax.Precision.HIGHEST
        var = (jnp.exp(log_sf2)
               - jnp.dot(ks, jnp.matmul(inv_k, ks, precision=hi),
                         precision=hi))
        if cfg.predict_includes_noise:
            var = var + _noise_var(log_sn2, cfg)
        return mu, jnp.maximum(var, 0.0)

    h = post.hypers
    return jax.vmap(one)(h.log_ell, h.log_sf2, h.log_sn2, h.mean_w,
                         post.alpha, post.inv_k)
