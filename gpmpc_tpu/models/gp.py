"""Stateful GP model wrapper.

TPU-native rebuild of ``gp_mpc/gp_class.py::GP`` [SURVEY C5]: stores training
data, z-score normalizes inputs/outputs, trains hyperparameters (multistart
L-BFGS on the Cholesky NLL — the functional core in
:mod:`gpmpc_tpu.models.gp_core`), precomputes per-dim factorizations, selects
the uncertainty-propagation scheme (``set_method('ME'|'TA'|'EM'|'UT'|'GH')``), predicts,
validates (SMSE / MNLP), and persists to ``.npz``.

Like the reference, the data set is fixed after construction; online
conditioning for the batched study lives in :mod:`gpmpc_tpu.parallel`
(rank-1 Cholesky updates) rather than here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.models import gp_core
from gpmpc_tpu.models.propagate import Normalization, get_propagator
from gpmpc_tpu.utils.config import GPConfig


def mean_fn_functional(post: gp_core.GPPosterior, norm: Normalization,
                       cfg: GPConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Raw-space predictive mean with the posterior as an explicit argument
    (jit-boundary-safe on backends where captured constants are costly)."""
    zn = (z - norm.z_mean) / norm.z_std
    mu_n, _ = gp_core.predict(post, zn, cfg)
    return norm.y_mean + norm.y_std * mu_n


class GP:
    """Multi-output GP regressor: one independent SE-ARD GP per output dim.

    Parity surface (``gp_mpc/gp_class.py`` [SURVEY C5]): ``train``,
    ``predict``, ``set_method``, ``validate``, ``save_model``/``load_model``,
    ``print_hyper_parameters``, ``get_size``.

    Beyond-reference: ``inducing=M`` switches to the sparse variational GP
    (:mod:`gpmpc_tpu.models.sparse`): M k-center inducing points, training
    on the Titsias free-energy bound, O(M^2) embedded prediction — the
    production-scale path for N in the thousands, transparent to every
    consumer of ``self.post`` (predict/propagate/MPC/export).
    ``optimize_inducing=True`` additionally gradient-refines the inducing
    locations on the summed bound (fit -> Z-step -> warm refit).
    """

    def __init__(self,
                 X,
                 Y,
                 mean_func: str = "zero",
                 gp_method: str = "TA",
                 hyper: Optional[gp_core.GPHypers] = None,
                 normalize: bool = True,
                 multistart: int = 2,
                 max_iters: int = 250,
                 optimizer_opts: Optional[dict] = None,
                 train: bool = True,
                 seed: int = 0,
                 dtype=None,
                 inducing: Optional[int] = None,
                 optimize_inducing: bool = False,
                 mesh=None,
                 kernel: str = "se",
                 gh_order: int = 3,
                 gh_grid: str = "auto"):
        X = jnp.asarray(X, dtype)
        Y = jnp.asarray(Y, dtype)
        if X.ndim != 2 or Y.ndim != 2 or X.shape[0] != Y.shape[0]:
            raise ValueError("X must be (N, D) and Y (N, Ny) with equal N")
        if inducing is not None and not 1 <= int(inducing) < X.shape[0]:
            raise ValueError(
                f"inducing={inducing} must be in [1, N={X.shape[0]}) — "
                "at M >= N the exact GP is both cheaper and tighter")
        self.inducing = int(inducing) if inducing is not None else None
        if optimize_inducing and inducing is None:
            raise ValueError("optimize_inducing=True requires inducing=M")
        self.optimize_inducing = bool(optimize_inducing)
        self.X_raw = X
        self.Y_raw = Y
        self.N, self.D = X.shape
        self.Ny = Y.shape[1]
        from gpmpc_tpu.ops.kernels import KERNELS
        if kernel not in KERNELS:
            raise ValueError(f"unknown kernel {kernel!r}; "
                             f"supported: {KERNELS}")
        opts = dict(optimizer_opts or {})
        self.cfg = GPConfig(mean_func=mean_func, multistart=multistart,
                            max_iters=max_iters, normalize=normalize,
                            kernel=kernel, **opts)
        self.gp_method = gp_method.upper()
        # GH quadrature knobs (only read when gp_method == 'GH'):
        # tensor order and grid choice ('auto' switches to the degree-5
        # sparse cubature when order**D would exceed 1000 points — see
        # propagate.propagate_gh)
        if gh_grid not in ("auto", "tensor", "cubature5"):
            raise ValueError(f"gh_grid must be 'auto'|'tensor'|'cubature5';"
                             f" got {gh_grid!r}")
        self.gh_order = int(gh_order)
        self.gh_grid = gh_grid
        self._key = jax.random.PRNGKey(seed)
        # optional device mesh (1D or multi-host 2D, see
        # parallel.distributed.make_study_mesh): shards the (multistart
        # x Ny) training grid over ALL its devices (DP over independent
        # training problems [SURVEY §2.3]); identical results to the
        # local fit
        self.mesh = mesh

        if normalize:
            z_std = jnp.std(X, axis=0)
            y_std = jnp.std(Y, axis=0)
            self.norm = Normalization(
                z_mean=jnp.mean(X, axis=0),
                z_std=jnp.where(z_std > 1e-12, z_std, 1.0),
                y_mean=jnp.mean(Y, axis=0),
                y_std=jnp.where(y_std > 1e-12, y_std, 1.0))
        else:
            self.norm = Normalization.identity(self.D, self.Ny, X.dtype)

        self.Xn = (X - self.norm.z_mean) / self.norm.z_std
        self.Yn = (Y - self.norm.y_mean) / self.norm.y_std

        if self.inducing is not None:
            from gpmpc_tpu.models.sparse import select_inducing
            self.z_idx = select_inducing(self.Xn, self.inducing)
            self.Zn = self.Xn[self.z_idx]               # (M, D) inducing inputs
        else:
            self.z_idx = None
            self.Zn = None

        self.hyper: Optional[gp_core.GPHypers] = hyper
        self.nll: Optional[jnp.ndarray] = None
        self.post: Optional[gp_core.GPPosterior] = None
        if hyper is not None:
            self._build_posterior()
        elif train:
            self.train()
        self.set_method(self.gp_method)

    # ------------------------------------------------------------ training

    def train(self, key: Optional[jax.Array] = None) -> None:
        """Multistart L-BFGS hyperparameter training [SURVEY C4/C5].

        With ``inducing=M`` set, trains on the Titsias variational free
        energy instead of the exact NLL (:mod:`gpmpc_tpu.models.sparse`) —
        same multistart grid, O(M^2 N) per objective evaluation."""
        if key is None:
            key = self._key
        if self.inducing is not None:
            from gpmpc_tpu.models import sparse
            self.hyper, self.nll = sparse.fit_sparse(self.Xn, self.Yn,
                                                     self.Zn, self.cfg, key,
                                                     mesh=self.mesh)
            if self.optimize_inducing:
                # coordinate descent: Z-step on the summed bound with
                # hypers fixed, then a warm-started hyper refit on the
                # moved set (single start; exploration already happened)
                self.Zn, _ = sparse.optimize_inducing(
                    self.Xn, self.Yn, self.Zn, self.hyper, self.cfg)
                self.hyper, self.nll = sparse.refit_sparse(
                    self.Xn, self.Yn, self.Zn, self.hyper, self.cfg)
        else:
            self.hyper, self.nll = gp_core.fit(self.Xn, self.Yn, self.cfg,
                                               key, mesh=self.mesh)
        self._build_posterior()

    def _build_posterior(self) -> None:
        if self.inducing is not None:
            from gpmpc_tpu.models.sparse import sparse_posterior
            self.post = sparse_posterior(self.Xn, self.Yn, self.Zn,
                                         self.hyper, self.cfg)
        else:
            self.post = gp_core.posterior(self.Xn, self.Yn, self.hyper,
                                          self.cfg)

    # ------------------------------------------------------------ predict

    def set_method(self, gp_method: str):
        """Select the propagation scheme and build the one-step moment map
        ``(mu_z, Sigma_z) -> (mu_y, Sigma_y, C)`` [SURVEY C5 set_method].

        The posterior/normalization arrays are passed as runtime ARGUMENTS
        to the jitted kernel — captured array constants cost ~25 ms per call
        on this TPU backend (re-uploaded each execution)."""
        self.gp_method = gp_method.upper()
        if self.gp_method == "EM" and self.cfg.mean_func != "zero":
            raise ValueError(
                "exact moment matching (EM) requires mean_func='zero' "
                "(PILCO closed forms assume a zero prior mean)")
        if self.gp_method == "EM" and self.cfg.kernel != "se":
            raise ValueError(
                "exact moment matching (EM) requires kernel='se' — the "
                "PILCO closed forms are SE-specific; use ME/TA/UT with "
                f"kernel={self.cfg.kernel!r}")
        prop = get_propagator(self.gp_method)
        if self.gp_method == "GH":
            import functools
            prop = functools.partial(prop, order=self.gh_order,
                                     grid=self.gh_grid)
        cfg = self.cfg
        jitted = jax.jit(lambda post, norm, mu_z, cov_z:
                         prop(post, norm, cfg, mu_z, cov_z))

        def moment_map(mu_z, cov_z):
            return jitted(self.post, self.norm, mu_z, cov_z)

        self._moment_map = moment_map
        return self._moment_map

    def predict(self, x, u=None, cov=None,
                gp_method: Optional[str] = None):
        """One-step prediction.  ``x`` (+ optional ``u``) forms the GP input
        z; with ``cov`` given, propagates input uncertainty by the selected
        scheme and returns ``(mean (Ny,), cov (Ny,Ny))``; without, returns
        the deterministic-input ``(mean (Ny,), var (Ny,))``.
        Parity: ``GP.predict(x, u, cov)`` [SURVEY C5]."""
        z = jnp.asarray(x)
        if u is not None:
            z = jnp.concatenate([z, jnp.asarray(u)])
        if gp_method is not None and gp_method.upper() != self.gp_method:
            self.set_method(gp_method)
        if cov is None:
            d = z.shape[0]
            mu, sig, _ = self._moment_map(z, jnp.zeros((d, d), z.dtype))
            return mu, jnp.diagonal(sig)
        mu, sig, _ = self._moment_map(z, jnp.asarray(cov))
        return mu, sig

    def moment_map(self):
        """The jitted ``(mu_z, Sigma_z) -> (mu_y, Sigma_y, C)`` map — what the
        MPC embeds in its rollout (the analog of the reference's CasADi
        Function built by set_method [SURVEY C5])."""
        return self._moment_map

    def mean_fn(self):
        """Raw-space predictive mean ``z -> (Ny,)`` for embedding as
        deterministic dynamics and for linearization.  NOTE: closes over the
        posterior — do not jit this closure directly on the TPU backend; use
        :func:`mean_fn_functional` + explicit (post, norm) args in hot paths.
        """
        post, norm, cfg = self.post, self.norm, self.cfg

        def f(z):
            return mean_fn_functional(post, norm, cfg, z)

        return f

    def linearize(self, z) -> jnp.ndarray:
        """Jacobian of the predictive mean at z, (Ny, D) — used for the LQR
        feedback gain when the dynamics are GP-based [SURVEY C5, conf. L]."""
        return jax.jacfwd(self.mean_fn())(jnp.asarray(z))

    def noise_cov(self) -> jnp.ndarray:
        """Learned process-noise covariance diag(sn2) in raw output units."""
        sn2 = jnp.exp(self.hyper.log_sn2) + self.cfg.min_noise
        return jnp.diag(sn2 * self.norm.y_std ** 2)

    # ------------------------------------------------------------ validate

    def validate(self, X_test, Y_test, verbose: bool = True):
        """Held-out metrics per output dim: SMSE, MNLP and RMSE
        [SURVEY C4/C5 validate, §4 test strategy]."""
        X_test = jnp.asarray(X_test)
        Y_test = np.asarray(Y_test)
        post, norm = self.post, self.norm
        cfg = dataclasses.replace(self.cfg, predict_includes_noise=True)

        def one(z):
            zn = (z - norm.z_mean) / norm.z_std
            mu_n, var_n = gp_core.predict(post, zn, cfg)
            return (norm.y_mean + norm.y_std * mu_n,
                    jnp.maximum(norm.y_std ** 2 * var_n, 1e-12))

        mu, var = jax.vmap(one)(X_test)
        mu, var = np.asarray(mu), np.asarray(var)
        err2 = (mu - Y_test) ** 2
        rmse = np.sqrt(err2.mean(axis=0))
        smse = err2.mean(axis=0) / Y_test.var(axis=0)
        mnlp = 0.5 * (err2 / var + np.log(2 * np.pi * var)).mean(axis=0)
        if verbose:
            for d in range(self.Ny):
                print(f"dim {d}: RMSE={rmse[d]:.4g}  SMSE={smse[d]:.4g}  "
                      f"MNLP={mnlp[d]:.4g}")
        return smse, mnlp, rmse

    # ------------------------------------------------------------ persist

    def save_model(self, path: str) -> None:
        """Persist X, Y, hypers to ``.npz`` [SURVEY C5 save_model]."""
        np.savez(path,
                 X=np.asarray(self.X_raw), Y=np.asarray(self.Y_raw),
                 log_ell=np.asarray(self.hyper.log_ell),
                 log_sf2=np.asarray(self.hyper.log_sf2),
                 log_sn2=np.asarray(self.hyper.log_sn2),
                 mean_w=np.asarray(self.hyper.mean_w),
                 mean_func=self.cfg.mean_func,
                 gp_method=self.gp_method,
                 normalize=self.cfg.normalize,
                 kernel=self.cfg.kernel,
                 inducing=self.inducing or 0,
                 # the (possibly gradient-optimized) inducing set in
                 # NORMALIZED coordinates — stored explicitly so a loaded
                 # model reproduces the trained posterior even when Z has
                 # moved off the deterministic k-center subset
                 Zn=(np.asarray(self.Zn) if self.Zn is not None
                     else np.zeros((0, 0))))

    @classmethod
    def load_model(cls, path: str) -> "GP":
        """Rebuild a trained GP from ``.npz`` [SURVEY C5 load_model]."""
        z = np.load(path)
        hyper = gp_core.GPHypers(
            log_ell=jnp.asarray(z["log_ell"]),
            log_sf2=jnp.asarray(z["log_sf2"]),
            log_sn2=jnp.asarray(z["log_sn2"]),
            mean_w=jnp.asarray(z["mean_w"]))
        inducing = int(z["inducing"]) if "inducing" in z else 0
        gp = cls(z["X"], z["Y"], mean_func=str(z["mean_func"]),
                 gp_method=str(z["gp_method"]), hyper=hyper,
                 normalize=bool(z["normalize"]),
                 inducing=inducing or None,
                 # pre-round-4 archives carry no kernel field (SE-only era)
                 kernel=str(z["kernel"]) if "kernel" in z else "se")
        if inducing and "Zn" in z and z["Zn"].size:
            zn = jnp.asarray(z["Zn"], gp.Xn.dtype)
            if not np.array_equal(np.asarray(gp.Zn), np.asarray(zn)):
                gp.Zn = zn                       # optimized, not k-center
                gp._build_posterior()
                gp.set_method(gp.gp_method)
        return gp

    # ------------------------------------------------------------ misc

    def get_size(self) -> Tuple[int, int, int]:
        """(N, D, Ny) — training-set size, input dim, output dim."""
        return self.N, self.D, self.Ny

    def print_hyper_parameters(self) -> None:
        """Pretty-print trained hypers [SURVEY C5]."""
        h = self.hyper
        for d in range(self.Ny):
            ell = ", ".join(f"{v:.4g}" for v in np.exp(h.log_ell[d]))
            print(f"GP dim {d}: ell=[{ell}]  "
                  f"sf2={float(np.exp(h.log_sf2[d])):.4g}  "
                  f"sn2={float(np.exp(h.log_sn2[d])):.4g}"
                  + (f"  NLL={float(self.nll[d]):.4g}"
                     if self.nll is not None else ""))
