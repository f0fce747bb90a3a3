"""Receding-horizon GP-MPC controller.

TPU-native rebuild of ``gp_mpc/mpc_class.py::MPC`` [SURVEY C6].  Same
capability surface — multiple-shooting NLP over the horizon, mean + covariance
propagation (ME/TA/EM/UT), chance-constraint tightening, linear state feedback,
expected quadratic / saturating costs, delta-u penalties, soft state
constraints, pluggable inequality constraints with per-solve runtime
parameters, four discretization modes (gp | rk4 | exact | hybrid) — but a
fundamentally different execution model:

* the reference builds a CasADi NLP once and then calls IPOPT from Python at
  every control step, crossing the Python->C++ boundary thousands of times
  per solve [SURVEY §3.4]; here the NLP solve is the pure-JAX AL-SQP of
  :mod:`gpmpc_tpu.solvers.al_sqp` (Riccati KKT sweep), and the ENTIRE
  receding-horizon closed loop — covariance propagation, tightening, solve,
  plant step, logging — is one jit-compiled ``lax.scan`` with zero host
  round-trips (BASELINE north star).

* covariance handling is *zero-order*: Sigma_t is propagated along the
  current iterate's trajectory between SQP passes and enters the NLP as a
  per-stage parameter (tightened bounds, trace cost terms), not as decision
  variables.  This matches the zero-order GP-MPC scheme (Lahr et al.,
  arXiv:2211.15522, listed in PAPERS.md) and resolves SURVEY C6's open
  question ("whether Sigma is eliminated into the graph vs lifted as
  decision variables": we parameterize it) in the TPU-friendly direction —
  fixed QP structure, exact Riccati factorization.

* the delta-u penalty S is handled by state augmentation (the previous
  input rides in the state vector), keeping the NLP stage-separable so the
  Riccati sweep still factors the KKT system exactly.

* EVERY array the NLP needs (GP posterior, weights, bounds, gains) is
  threaded through the jit boundary as a runtime argument in
  :class:`MPCConsts` — on this TPU backend a closed-over array constant is
  re-uploaded on every executable call (~25 ms each, measured), so captured
  buffers in the hot path are forbidden.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.mpc import costs as cost_lib
from gpmpc_tpu.models.dynamics import Model
from gpmpc_tpu.models.gp import GP, mean_fn_functional
from gpmpc_tpu.models.propagate import get_propagator
from gpmpc_tpu.solvers import al_sqp, riccati
from gpmpc_tpu.utils.config import SQPConfig, resolve_solver_opts

_BIG = 1e10


class MPCConsts(NamedTuple):
    """All device arrays the NLP reads, passed as one runtime argument."""

    q: jnp.ndarray
    p: jnp.ndarray
    r: jnp.ndarray
    s: Optional[jnp.ndarray]          # delta-u weight (None = no penalty)
    u_sp: jnp.ndarray
    xlb: jnp.ndarray
    xub: jnp.ndarray
    ulb: jnp.ndarray
    uub: jnp.ndarray
    dulb: Optional[jnp.ndarray]       # hard input-rate bounds (None = off)
    duub: Optional[jnp.ndarray]
    x_scale: jnp.ndarray
    u_scale: jnp.ndarray
    u_guard_lo: jnp.ndarray
    u_guard_hi: jnp.ndarray
    k_fb: jnp.ndarray
    noise_cov: jnp.ndarray
    model_r: jnp.ndarray
    bd: Optional[jnp.ndarray]         # hybrid residual selector
    post: Optional[object]            # GPPosterior (pytree) or None
    norm: Optional[object]            # Normalization (pytree) or None


class MPCParams(NamedTuple):
    """Per-solve runtime parameters (the analog of the reference NLP's
    parameter vector packed each step [SURVEY §3.4]) + the constant arrays."""

    x0: jnp.ndarray          # (Nx,) current state
    x_sp: jnp.ndarray        # (Nt+1, Nx) per-stage reference window (a fixed
    #                          setpoint is broadcast; a trajectory reference
    #                          gives the NLP true preview — beyond-reference,
    #                          the upstream x_sp is a single point [SURVEY C6])
    u_prev: jnp.ndarray      # (Nu,) last applied input (delta-u penalty)
    margins_x: jnp.ndarray   # (Nt+1, Nx) chance tightening on state bounds
    margins_u: jnp.ndarray   # (Nt, Nu) tightening on input bounds (feedback)
    sigmas: jnp.ndarray      # (Nt+1, Nx, Nx) propagated covariances
    con_par: jnp.ndarray     # (num_con_par,) user-constraint parameters
    consts: MPCConsts


class StepInfo(NamedTuple):
    """Per-control-step diagnostics, stacked over the closed loop — the
    structured analog of the reference's printed IPOPT status and wall time
    [SURVEY C6 runtime, §5 'failure detection' / 'observability']."""

    obj: jnp.ndarray
    defect: jnp.ndarray
    con_viol: jnp.ndarray
    stat: jnp.ndarray        # relative KKT dual infeasibility
    iters: jnp.ndarray
    converged: jnp.ndarray


class MPC:
    """Uncertainty-aware receding-horizon controller.

    Parity surface (``gp_mpc/mpc_class.py::MPC.__init__`` option set
    [SURVEY C6]): ``horizon, model, gp, Q, P, R, S, lam, ulb, uub, xlb, xub,
    terminal_constraint, feedback, percentile, gp_method, costFunc,
    discrete_method, inequality_constraints, num_con_par, solver_opts``.

    ``inequality_constraints(x, cov, u, par) -> (num_con,)`` returns general
    constraint values with the convention g <= 0; ``par`` is a
    ``num_con_par``-vector supplied per solve via ``con_par_func`` (this is
    how the car example injects obstacle ellipses [SURVEY C6/C8]).
    """

    def __init__(self,
                 horizon: float,
                 model: Model,
                 gp: Optional[GP] = None,
                 Q=None, P=None, R=None, S=None,
                 lam: Optional[float] = None,
                 lam_state: Optional[float] = None,
                 ulb=None, uub=None, xlb=None, xub=None,
                 dulb=None, duub=None,
                 terminal_constraint: Optional[float] = None,
                 feedback: bool = True,
                 percentile: Optional[float] = None,
                 gp_method: str = "TA",
                 costFunc: str = "quad",
                 discrete_method: str = "gp",
                 hybrid_Bd=None,
                 inequality_constraints: Optional[Callable] = None,
                 num_con_par: int = 0,
                 solver_opts: Optional[Union[str, dict]] = None,
                 init_solver_opts: Optional[Union[str, dict]] = None,
                 u_sp=None,
                 op_x=None, op_u=None,
                 include_noise_cov: bool = True,
                 cov_updates: int = 2,
                 online_capacity: Optional[int] = None,
                 online_policy: str = "saturate",
                 solve_precision: Optional[str] = None,
                 dtype=None):
        self.model = model
        self.gp = gp
        self.dt = model.dt
        self.Nt = int(round(horizon / model.dt))
        self.Nx, self.Nu = model.Nx, model.Nu
        dtype = dtype or model.dtype
        self.dtype = dtype

        dm = discrete_method.lower()
        if dm not in ("gp", "rk4", "exact", "hybrid"):
            raise ValueError(f"unknown discrete_method {discrete_method!r}")
        if dm in ("gp", "hybrid") and gp is None:
            raise ValueError(f"discrete_method={dm!r} requires a GP")
        if dm == "exact" and getattr(model, "fused_integrator", False):
            # discrete_method='exact' embeds model.integrate in the NLP and
            # linearizes it (jacfwd); the fused Pallas RK4 kernel is plant-
            # truth-only (f32, not reverse-differentiable) and fails at
            # trace time with an opaque Mosaic/AD error.  Fail clearly here
            # instead (ADVICE r2).
            raise ValueError(
                "discrete_method='exact' traces model.integrate into the "
                "NLP and differentiates it, which the fused Pallas "
                "integrator does not support; build the Model with "
                "fused_integrator=False for exact-mode MPC")
        self.discrete_method = dm
        self.gp_method = gp_method.upper()
        if gp is not None and gp.gp_method != self.gp_method:
            gp.set_method(self.gp_method)
        self._gp_cfg = gp.cfg if gp is not None else None
        self._propagator = (get_propagator(self.gp_method)
                            if gp is not None else None)
        if self._propagator is not None and self.gp_method == "GH":
            # honor the GP's quadrature knobs (tensor order / sparse grid
            # for high-D inputs — propagate.propagate_gh)
            import functools
            self._propagator = functools.partial(
                self._propagator, order=gp.gh_order, grid=gp.gh_grid)
        # costFunc: 'quad' | 'sat' (the reference's option set [SURVEY C6])
        # or, beyond-reference, a CALLABLE (mu, Sigma, x_ref, W) -> scalar
        # expected stage cost (W is this stage's weight: Q at stages, P at
        # the terminal stage); pure JAX — it is traced into the NLP and
        # differentiated like the built-ins
        self.cost_func = costFunc
        if not callable(costFunc) and costFunc not in ("quad", "sat"):
            raise ValueError(f"unknown costFunc {costFunc!r}")
        self.feedback = bool(feedback)
        self.cov_updates = int(cov_updates)
        self.include_noise_cov = bool(include_noise_cov)
        # steady-state (warm-started / RTI) budget for the receding loop,
        # plus a separate cold-start budget for the first solve — standard
        # real-time-iteration practice: pay full convergence once, then
        # track with a few Gauss-Newton steps per control period
        self.sqp_cfg = SQPConfig(
            **resolve_solver_opts(solver_opts, dtype))
        self.init_sqp_cfg = (
            SQPConfig(**resolve_solver_opts(init_solver_opts, dtype))
            if init_solver_opts is not None else SQPConfig())
        # Matmul-precision scope for the SOLVE program only.  The package
        # default is full-fidelity f32 matmuls (see gpmpc_tpu/__init__.py:
        # XLA's default single-bf16-pass matmul corrupted GP TRAINING on
        # TPU).  The solve-time program is a different numerical regime:
        # every cancellation-critical form in it (Gram expansion, variance
        # Schur forms, EM covariance) carries an explicit local
        # Precision.HIGHEST pin, and the remaining matmuls (QP assembly,
        # Jacobian contractions, rollout algebra) feed a solver that
        # iterates to a merit-guarded fixed point, so ~4e-3 relative noise
        # there costs closed-loop nothing (measured: see RESULTS.md round
        # 3c).  None inherits the package-wide setting.
        if solve_precision is not None and solve_precision not in (
                "default", "high", "highest"):
            raise ValueError(
                "solve_precision must be one of None, 'default', 'high', "
                f"'highest'; got {solve_precision!r}")
        self.solve_precision = solve_precision
        if (dtype == jnp.float64
                and (self.sqp_cfg.fused_kkt or self.init_sqp_cfg.fused_kkt)):
            raise ValueError(
                "fused_kkt runs the KKT sweep in f32 (TPU production "
                "dtype) — it would silently degrade the x64 parity path; "
                "use parallel_kkt or the default sweep for float64 models")

        def mat(m, n, default_diag):
            if m is None:
                return default_diag * jnp.eye(n, dtype=dtype)
            m = jnp.asarray(m, dtype)
            return jnp.diag(m) if m.ndim == 1 else m

        self.Q = mat(Q, self.Nx, 1.0)
        self.P = mat(P, self.Nx, 0.0) if P is not None else self.Q * 10.0
        self.R = mat(R, self.Nu, 0.01)
        self.S = mat(S, self.Nu, 0.0) if S is not None else None
        # soft constraints [SURVEY C6 'slack variables for soft constraints',
        # penalties lam/lam_state]: each penalty is the stage-separable
        # analog of the reference's slack formulation — a quadratic slack
        # penalty eliminated analytically into the cost, replacing the hard
        # AL constraint set for that constraint group.
        #   lam_state: (tightened) state boxes become soft.
        #   lam:       GENERAL constraints become soft — the user
        #              inequality callback (obstacles etc.) and the terminal
        #              constraint; the reference's `eps` slack on
        #              inequality_constraints with penalty weight lam
        #              [SURVEY C6 callback signature].
        # Default deviates from the reference (which always softens general
        # constraints, lam=1e3): hard-AL handling is the default here (the
        # stronger guarantee); pass lam= to opt into soft behavior — see
        # docs/MIGRATION.md.
        self.lam = None if lam is None else float(lam)
        self.lam_state = None if lam_state is None else float(lam_state)
        # hard input-rate bounds dulb <= u_t - u_{t-1} <= duub
        # (beyond-reference: the reference expresses rate handling only as
        # the soft S penalty — its inequality callback sees (x, u) per
        # stage, never u_prev, so hard rate bounds are inexpressible
        # there [SURVEY C6]).  Stage-separable via the same previous-input
        # state augmentation the S penalty uses, so the KKT stays banded.
        self.has_du_bounds = dulb is not None or duub is not None
        # delta-u penalty or rate bounds -> augment the state with the
        # previous input so the NLP stays stage-separable (Riccati-factorable)
        self.aug = self.S is not None or self.has_du_bounds
        if self.has_du_bounds and self.S is None:
            self.S = jnp.zeros((self.Nu, self.Nu), dtype)  # no-op penalty
        self.Nxa = self.Nx + (self.Nu if self.aug else 0)

        def vec(v, n, fill):
            if v is None:
                return jnp.full((n,), fill, dtype)
            return jnp.asarray(v, dtype)

        self.ulb = vec(ulb, self.Nu, -_BIG)
        self.uub = vec(uub, self.Nu, _BIG)
        self.xlb = vec(xlb, self.Nx, -_BIG)
        self.xub = vec(xub, self.Nx, _BIG)
        self.dulb = vec(dulb, self.Nu, -_BIG) if self.has_du_bounds else None
        self.duub = vec(duub, self.Nu, _BIG) if self.has_du_bounds else None
        self.terminal_constraint = terminal_constraint
        self.u_sp = vec(u_sp, self.Nu, 0.0)

        # quantile for chance-constraint tightening: Phi^{-1}(percentile)
        # via ndtri — the on-device analog of the reference's
        # scipy.stats.norm.ppf [SURVEY C6 'chance-constraint tightening']
        if percentile is not None:
            self.quantile = float(jax.scipy.special.ndtri(
                jnp.asarray(percentile, jnp.float64 if dtype == jnp.float64
                            else jnp.float32)))
        else:
            self.quantile = 0.0
        self.percentile = percentile

        # hybrid: GP models residuals on dims selected by Bd (Nx, Ny_gp)
        # [SURVEY C6 'hybrid' discrete method, conf. M]
        if hybrid_Bd is not None:
            self.Bd = jnp.asarray(hybrid_Bd, dtype)
        elif dm == "hybrid":
            if gp.Ny != self.Nx:
                raise ValueError("hybrid without Bd requires gp.Ny == Nx")
            self.Bd = jnp.eye(self.Nx, dtype=dtype)
        else:
            self.Bd = None

        # user constraints: probe once for the static constraint count
        self.user_ineq = inequality_constraints
        self.num_con_par = int(num_con_par)
        if inequality_constraints is not None:
            probe = inequality_constraints(
                jnp.zeros(self.Nx, dtype), jnp.zeros((self.Nx, self.Nx), dtype),
                jnp.zeros(self.Nu, dtype), jnp.zeros(self.num_con_par, dtype))
            self.num_user_con = int(np.asarray(probe).shape[0])
        else:
            self.num_user_con = 0

        # feedback gain from discrete LQR at the operating point
        # [SURVEY C6 'linear state feedback', §3.3 lqr helper].  In pure-GP
        # mode the controller's dynamics are the learned GP mean, so the
        # gain is derived from its linearization (GP.linearize [SURVEY C5
        # linearization row]) — not from the known model, which the
        # controller does not otherwise use in this mode.
        if self.feedback:
            ox = jnp.asarray(op_x, dtype) if op_x is not None else \
                jnp.zeros(self.Nx, dtype)
            ou = jnp.asarray(op_u, dtype) if op_u is not None else \
                jnp.zeros(self.Nu, dtype)
            if dm == "gp" and gp is not None:
                jac = gp.linearize(jnp.concatenate([ox, ou]))  # (Nx, Nx+Nu)
                ad, bd = jac[:, :self.Nx], jac[:, self.Nx:]
            else:
                ad, bd = model.discrete_linearize(ox, ou)
            self.K_fb, k_ok = riccati.lqr_gain(ad, bd, self.Q, self.R,
                                               return_converged=True)
            if not bool(k_ok):
                import warnings
                warnings.warn("LQR Riccati iteration for the feedback gain "
                              "did not converge; check (A, B) at the "
                              "operating point", stacklevel=2)
        else:
            self.K_fb = jnp.zeros((self.Nu, self.Nx), dtype)

        noise_cov = (gp.noise_cov() if (gp is not None and include_noise_cov)
                     else jnp.zeros((self.Nx, self.Nx), dtype))

        # constraint scaling keeps AL penalties well-conditioned when some
        # bounds are "infinite" (large finite placeholders)
        x_scale = jnp.where(self.xub - self.xlb < _BIG,
                            jnp.maximum(self.xub - self.xlb, 1e-6), 1.0)
        u_scale = jnp.where(self.uub - self.ulb < _BIG,
                            jnp.maximum(self.uub - self.ulb, 1e-6), 1.0)
        pad = 0.5 * jnp.where(self.uub - self.ulb < _BIG,
                              self.uub - self.ulb, _BIG)

        self.consts = MPCConsts(
            q=self.Q, p=self.P, r=self.R, s=self.S,
            u_sp=self.u_sp, xlb=self.xlb, xub=self.xub,
            ulb=self.ulb, uub=self.uub,
            dulb=self.dulb, duub=self.duub,
            x_scale=x_scale, u_scale=u_scale,
            u_guard_lo=self.ulb - pad, u_guard_hi=self.uub + pad,
            k_fb=self.K_fb, noise_cov=noise_cov,
            model_r=self.model.R,
            bd=self.Bd,
            post=gp.post if gp is not None else None,
            norm=gp.norm if gp is not None else None)

        # online (adaptive) GP: with ``online_capacity`` set, the closed
        # loop conditions the GP posterior on every observed transition
        # (Schur-complement inverse updates; gpmpc_tpu.parallel.online_gp).
        # Beyond-reference capability — the reference GP is frozen
        # [SURVEY C5]; this is single-rollout adaptive GP-MPC.
        self.online_capacity = online_capacity
        if online_capacity is not None:
            if gp is None or dm not in ("gp", "hybrid"):
                raise ValueError("online_capacity requires a GP-based "
                                 "discrete_method")
            from gpmpc_tpu.parallel import online_gp as _og
            self._og = _og
            # conditioning consumes cross-kernel rows only — family-agnostic;
            # a nonzero prior mean rides along frozen (residual-based alpha)
            self._online_kernel = gp.cfg.kernel
            self._online_mean_func = gp.cfg.mean_func
            if online_policy not in ("saturate", "fifo"):
                raise ValueError("online_policy must be 'saturate' or "
                                 f"'fifo'; got {online_policy!r}")
            self.online_policy = online_policy
            self.online_post0, _ = _og.from_gp(gp, online_capacity)
            # in hybrid mode the GP models the residual Bd^+ (x+ - rk4(x,u)),
            # NOT the raw next state; conditioning must map the observed
            # transition into that residual space or the posterior silently
            # drifts (the GP's normalization stats are residual-space too)
            self._bd_pinv = (jnp.linalg.pinv(self.Bd) if dm == "hybrid"
                             else None)

        # the static (non-array) option set as one frozen record — the
        # introspectable analog of the reference's stored constructor args
        # [SURVEY §5 'Config']; also what __repr__ prints
        from gpmpc_tpu.utils.config import MPCOptions
        self.options = MPCOptions(
            gp_method=self.gp_method, discrete_method=dm,
            cost_func=self.cost_func, feedback=self.feedback,
            percentile=percentile, terminal_constraint=terminal_constraint,
            cov_updates=self.cov_updates, num_con_par=self.num_con_par,
            solver=self.sqp_cfg, solve_precision=solve_precision)

        self._build_problem()
        scope = self._precision_scope
        self._solve_step_jit = jax.jit(scope(self._solve_step))
        self._solve_step_init_jit = jax.jit(
            scope(lambda *a: self._solve_step(*a, cfg=self.init_sqp_cfg)))
        self._closed_loop_jit = jax.jit(
            scope(self._closed_loop), static_argnames=("n_steps", "noise"))

        def _mc_loop(x0s, ref_windows, u0_guess, con_pars, noise_ws, consts,
                     opost, n_steps, noise):
            # vmap over (initial state, noise realization); everything else
            # broadcasts.  opost broadcasts in and comes back batched — each
            # Monte-Carlo lane conditions its own copy.
            return jax.vmap(
                lambda x0, w: self._closed_loop(
                    x0, ref_windows, u0_guess, con_pars, w, consts, opost,
                    n_steps=n_steps, noise=noise))(x0s, noise_ws)

        self._solve_mc_jit = jax.jit(
            scope(_mc_loop), static_argnames=("n_steps", "noise"))
        self._last_run = None
        self._last_mc = None

    def _precision_scope(self, fn):
        """Trace ``fn`` under ``jax.default_matmul_precision(solve_precision)``
        when set; ``None`` inherits the package-wide full-fidelity default.
        The local HIGHEST pins on cancellation-critical forms (ops/kernels,
        models/propagate, models/gp_core, parallel/online_gp) are explicit
        ``precision=`` arguments, so they survive this scope."""
        if self.solve_precision is None:
            return fn
        prec = self.solve_precision

        @functools.wraps(fn)
        def scoped(*args, **kwargs):
            with jax.default_matmul_precision(prec):
                return fn(*args, **kwargs)
        return scoped

    # ------------------------------------------------------------ dynamics

    def _mean_dynamics(self, x, u, consts: MPCConsts):
        """Discrete mean dynamics per ``discrete_method`` [SURVEY C6]."""
        dm = self.discrete_method
        if dm == "rk4":
            return self.model.rk4(x, u)
        if dm == "exact":
            return self.model.integrate(x, u)
        z = jnp.concatenate([x, u])
        gp_mean = mean_fn_functional(consts.post, consts.norm,
                                     self._gp_cfg, z)
        if dm == "gp":
            return gp_mean
        # hybrid: known model + GP residual correction
        return self.model.rk4(x, u) + consts.bd @ gp_mean

    def _cov_step(self, x, u, sigma, consts: MPCConsts):
        """One-step covariance propagation (zero-order pass).

        Builds the joint input covariance including feedback cross-terms
        Sigma_u = K Sigma K' [SURVEY C6 'feedback'], then applies the
        selected scheme.  ME carries no covariance [SURVEY §3.3 'ME: Sigma=0'].
        """
        k = consts.k_fb
        sk = sigma @ k.T                                  # delta-u = -K delta-x
        sigma_z = jnp.block([[sigma, -sk],
                             [-sk.T, k @ sigma @ k.T]])
        z = jnp.concatenate([x, u])
        dm = self.discrete_method

        if dm in ("rk4", "exact"):
            f = self.model.rk4 if dm == "rk4" else self.model.integrate
            jx = jax.jacfwd(lambda xx: f(xx, u))(x)
            ju = jax.jacfwd(lambda uu: f(x, uu))(u)
            j = jnp.concatenate([jx, ju], axis=1)          # (Nx, Nx+Nu)
            sig_n = j @ sigma_z @ j.T + consts.model_r
            return 0.5 * (sig_n + sig_n.T)

        if dm == "gp":
            if self.gp_method == "ME":
                return jnp.zeros_like(sigma)
            _, sig_y, _ = self._propagator(consts.post, consts.norm,
                                           self._gp_cfg, z, sigma_z)
            sig_n = sig_y + consts.noise_cov
            return 0.5 * (sig_n + sig_n.T)

        # hybrid: linearized known part + GP residual part + cross terms
        jx = jax.jacfwd(lambda xx: self.model.rk4(xx, u))(x)
        ju = jax.jacfwd(lambda uu: self.model.rk4(x, uu))(u)
        j = jnp.concatenate([jx, ju], axis=1)
        _, sig_y, c_zy = self._propagator(consts.post, consts.norm,
                                          self._gp_cfg, z, sigma_z)
        bd = consts.bd
        cross = j @ c_zy @ bd.T
        sig_n = (j @ sigma_z @ j.T + bd @ sig_y @ bd.T
                 + cross + cross.T + consts.noise_cov)
        return 0.5 * (sig_n + sig_n.T)

    def propagate_covariances(self, xs, us, sigma0, consts: MPCConsts):
        """Scan Sigma_t along a nominal trajectory -> (Nt+1, Nx, Nx)
        [SURVEY §3.3 'covariance propagation alongside the mean']."""
        def step(sig, xu):
            x, u = xu
            return self._cov_step(x, u, sig, consts), sig

        # unroll: each iteration is a handful of tiny (Nx+Nu)^2 ops, so the
        # scan is launch-latency-bound on TPU; unrolling 5 stages per loop
        # step halves the refresh cost (92 -> 46 us at Nt=20, measured)
        sig_last, sigmas = jax.lax.scan(
            step, sigma0, (xs[:-1, :self.Nx], us), unroll=5)
        return jnp.concatenate([sigmas, sig_last[None]], axis=0)

    # ------------------------------------------------------------ NLP spec

    def _split(self, xa):
        """Augmented state -> (physical state, previous input)."""
        if self.aug:
            return xa[:self.Nx], xa[self.Nx:]
        return xa, None

    def _build_problem(self):
        nx, nu, nt = self.Nx, self.Nu, self.Nt
        hard_state = self.lam_state is None  # soft -> penalty in the cost
        hard_user = self.lam is None         # lam softens general constraints

        def dynamics(xa, u, t, params: MPCParams):
            x, _ = self._split(xa)
            xn = self._mean_dynamics(x, u, params.consts)
            return jnp.concatenate([xn, u]) if self.aug else xn

        def stage_cost(xa, u, t, params: MPCParams):
            c0 = params.consts
            x, u_prev = self._split(xa)
            sig = params.sigmas[t]
            x_ref = params.x_sp[t]
            if self.cost_func == "quad":
                c = cost_lib.expected_quadratic(x, sig, x_ref, c0.q)
            elif self.cost_func == "sat":
                c = cost_lib.expected_saturating(x, sig, x_ref, c0.q)
            else:
                c = self.cost_func(x, sig, x_ref, c0.q)
            du_sp = u - c0.u_sp
            c = c + du_sp @ c0.r @ du_sp
            if self.aug:
                dd = u - u_prev
                c = c + dd @ c0.s @ dd
            if self.lam_state is not None:
                mx = params.margins_x[t]
                viol = (jnp.maximum(x - (c0.xub - mx), 0.0)
                        + jnp.maximum((c0.xlb + mx) - x, 0.0)) / c0.x_scale
                c = c + self.lam_state * jnp.sum(viol * viol)
            if not hard_user and self.user_ineq is not None:
                g = self.user_ineq(x, params.sigmas[t], u, params.con_par)
                viol = jnp.maximum(g, 0.0)
                c = c + self.lam * jnp.sum(viol * viol)
            return c

        def terminal_cost(xa, params: MPCParams):
            c0 = params.consts
            x, _ = self._split(xa)
            sig = params.sigmas[nt]
            x_ref = params.x_sp[nt]
            if self.cost_func == "quad":
                c = cost_lib.expected_quadratic(x, sig, x_ref, c0.p)
            elif self.cost_func == "sat":
                c = cost_lib.expected_saturating(x, sig, x_ref, c0.p)
            else:
                c = self.cost_func(x, sig, x_ref, c0.p)
            if self.lam_state is not None:
                mx = params.margins_x[nt]
                viol = (jnp.maximum(x - (c0.xub - mx), 0.0)
                        + jnp.maximum((c0.xlb + mx) - x, 0.0)) / c0.x_scale
                c = c + self.lam_state * jnp.sum(viol * viol)
            if not hard_user and self.terminal_constraint is not None:
                e = x - params.x_sp[nt]
                viol = jnp.maximum(e @ e - self.terminal_constraint, 0.0)
                c = c + self.lam * viol * viol
            return c

        def stage_ineq(xa, u, t, params: MPCParams):
            c0 = params.consts
            x, u_prev = self._split(xa)
            mx = params.margins_x[t]
            mu_m = params.margins_u[t]
            g = []
            if hard_state:
                g += [(x - (c0.xub - mx)) / c0.x_scale,
                      ((c0.xlb + mx) - x) / c0.x_scale]
            g += [(u - (c0.uub - mu_m)) / c0.u_scale,
                  ((c0.ulb + mu_m) - u) / c0.u_scale]
            if self.has_du_bounds:
                # hard rate bounds on du = u_t - u_{t-1} (u_prev rides the
                # augmented state, so the constraint stays stage-separable;
                # untightened — the rate is a commanded quantity, not a
                # stochastic one)
                du = u - u_prev
                g += [(du - c0.duub) / c0.u_scale,
                      (c0.dulb - du) / c0.u_scale]
            if hard_user and self.user_ineq is not None:
                g.append(self.user_ineq(x, params.sigmas[t], u,
                                        params.con_par))
            return jnp.concatenate(g)

        def terminal_ineq(xa, params: MPCParams):
            c0 = params.consts
            x, _ = self._split(xa)
            mx = params.margins_x[nt]
            g = []
            if hard_state:
                g += [(x - (c0.xub - mx)) / c0.x_scale,
                      ((c0.xlb + mx) - x) / c0.x_scale]
            if hard_user and self.terminal_constraint is not None:
                # ||x_N - x_sp||^2 <= terminal_constraint [SURVEY C6, conf. M]
                e = x - params.x_sp[nt]
                g.append(jnp.array([e @ e - self.terminal_constraint]))
            if not g:
                return jnp.zeros((0,), xa.dtype)
            return jnp.concatenate(g)

        n_state_con = 2 * nx if hard_state else 0
        n_user_con = self.num_user_con if hard_user else 0
        n_du_con = 2 * nu if self.has_du_bounds else 0
        n_ineq = n_state_con + 2 * nu + n_du_con + n_user_con
        n_term = n_state_con + (1 if (self.terminal_constraint is not None
                                      and hard_user) else 0)
        self.problem = al_sqp.TrajectoryProblem(
            nx=self.Nxa, nu=nu, horizon=nt,
            dynamics=dynamics, stage_cost=stage_cost,
            terminal_cost=terminal_cost,
            stage_ineq=stage_ineq, terminal_ineq=terminal_ineq,
            n_ineq=n_ineq, n_term_ineq=n_term,
            u_guard=lambda p: (p.consts.u_guard_lo, p.consts.u_guard_hi))

    def _margins(self, sigmas, consts: MPCConsts):
        """Chance tightening: Phi^{-1}(p) * sqrt(diag Sigma_t), clamped so
        tightened boxes cannot cross [SURVEY C6]."""
        if self.percentile is None:
            mx = jnp.zeros((self.Nt + 1, self.Nx), self.dtype)
            mu_m = jnp.zeros((self.Nt, self.Nu), self.dtype)
            return mx, mu_m
        dx = jnp.sqrt(jnp.clip(jax.vmap(jnp.diagonal)(sigmas), 0.0, None))
        mx = self.quantile * dx
        box = consts.xub - consts.xlb
        mx = jnp.minimum(mx, 0.49 * jnp.where(box < _BIG, box, _BIG))
        # input tightening from Sigma_u = K Sigma K' (feedback only)
        k = consts.k_fb
        sig_u = jax.vmap(lambda s_: k @ s_ @ k.T)(sigmas[:-1])
        du = jnp.sqrt(jnp.clip(jax.vmap(jnp.diagonal)(sig_u), 0.0, None))
        mu_m = self.quantile * du
        ubox = consts.uub - consts.ulb
        mu_m = jnp.minimum(mu_m, 0.49 * jnp.where(ubox < _BIG, ubox, _BIG))
        return mx, mu_m

    # ------------------------------------------------------------ solving

    def _augment_x0(self, x0, u_prev):
        return jnp.concatenate([x0, u_prev]) if self.aug else x0

    def _ref_window(self, x_sp):
        """Normalize a reference to the (Nt+1, Nx) per-stage window the NLP
        consumes: a fixed setpoint (Nx,) is broadcast; a (Nt+1, Nx) window
        passes through (true preview over the horizon)."""
        x_sp = jnp.asarray(x_sp, self.dtype)
        if x_sp.ndim == 1:
            return jnp.broadcast_to(x_sp[None, :], (self.Nt + 1, self.Nx))
        if x_sp.shape != (self.Nt + 1, self.Nx):
            raise ValueError(
                f"x_sp must be (Nx,) or (Nt+1, Nx)=({self.Nt + 1}, "
                f"{self.Nx}); got {x_sp.shape}")
        return x_sp

    def _solve_step(self, warm: al_sqp.SolverState, x0, x_sp, u_prev,
                    sigma0, con_par, consts: MPCConsts, cfg=None):
        """One MPC solve: zero-order covariance refresh passes around the
        AL-SQP [SURVEY §3.4 per-step body, minus the host round-trips]."""
        cfg = cfg if cfg is not None else self.sqp_cfg
        x0a = self._augment_x0(x0, u_prev)
        state = al_sqp.shift_state(warm, x0a)

        def cov_pass(state, _):
            # zero-order pass: propagate Sigma along the current iterate,
            # tighten, solve.  Each pass refreshes Sigma from the previous
            # pass's solution (arXiv:2211.15522 scheme).
            sigmas = self.propagate_covariances(state.x, state.u, sigma0,
                                                consts)
            mx, mu_m = self._margins(sigmas, consts)
            params = MPCParams(x0=x0, x_sp=x_sp, u_prev=u_prev,
                               margins_x=mx, margins_u=mu_m,
                               sigmas=sigmas, con_par=con_par, consts=consts)
            result = al_sqp.solve(self.problem, params, state, cfg)
            out = (result.obj, result.defect, result.con_viol, result.stat,
                   result.iters, result.converged, sigmas)
            return result.state, out

        # the covariance refreshes are identical passes -> scan (one traced
        # copy of the AL-SQP graph, not cov_updates copies)
        state, outs = jax.lax.scan(
            cov_pass, state, None, length=max(self.cov_updates, 1))
        info = StepInfo(obj=outs[0][-1], defect=outs[1][-1],
                        con_viol=outs[2][-1], stat=outs[3][-1],
                        iters=outs[4][-1], converged=outs[5][-1])
        return state, state.u[0], outs[6][-1], info

    def _init_warm(self, x0a, x_sp, u_init=None):
        return al_sqp.init_state(self.problem, x0a,
                                 params=self._dummy_params(x0a, x_sp),
                                 u_init=u_init)

    def solve_step(self, x0, x_sp, warm=None, u_prev=None, sigma0=None,
                   con_par=None, u_init=None):
        """Single receding-horizon step (jitted); returns
        ``(u0, warm_state, sigmas, info)`` — for driving a real plant
        externally while keeping the solve on device.

        ``u_init`` ((Nu,) or (Nt, Nu)) seeds the COLD-start rollout — the
        standalone analog of ``solve(u0=...)`` [SURVEY C6].  The default
        zero-input rollout is a poor initializer at long horizons on
        plants that drift somewhere nasty under u=0 (the four-tank drains
        onto the sqrt-outflow clamp, where the covariance propagation's
        linearization is 1/(2 sqrt(h))-stiff and overflows over hundreds
        of stages): pass a plausible hold input there.  Ignored when
        ``warm`` is given.
        """
        x0 = jnp.asarray(x0, self.dtype)
        x_sp = self._ref_window(x_sp)
        if u_prev is None:
            u_prev = jnp.zeros(self.Nu, self.dtype)
        cold = warm is None
        if cold:
            if u_init is not None:
                u_init = jnp.asarray(u_init, self.dtype)
                if u_init.ndim == 1:
                    u_init = jnp.broadcast_to(u_init[None],
                                              (self.Nt, self.Nu))
            warm = self._init_warm(self._augment_x0(x0, u_prev), x_sp,
                                   u_init=u_init)
        if sigma0 is None:
            sigma0 = jnp.zeros((self.Nx, self.Nx), self.dtype)
        if con_par is None:
            con_par = jnp.zeros(self.num_con_par, self.dtype)
        # cold starts get the full-budget config; warm steps the RTI budget
        step_fn = self._solve_step_init_jit if cold else self._solve_step_jit
        state, u0, sigmas, info = step_fn(
            warm, x0, x_sp, u_prev, sigma0, con_par, self.consts)
        # external callers drive a real plant with this input: saturate to
        # the hard box (and rate window) like the internal closed loop does,
        # so residual AL violation can never command a bound-breaking
        # actuator value
        u0 = jnp.clip(u0, self.consts.ulb, self.consts.uub)
        if self.has_du_bounds:
            u0 = jnp.clip(u0, u_prev + self.consts.dulb,
                          u_prev + self.consts.duub)
        return u0, state, sigmas, info

    def _dummy_params(self, x0a, x_sp):
        return MPCParams(
            x0=x0a[:self.Nx], x_sp=x_sp,
            u_prev=jnp.zeros(self.Nu, self.dtype),
            margins_x=jnp.zeros((self.Nt + 1, self.Nx), self.dtype),
            margins_u=jnp.zeros((self.Nt, self.Nu), self.dtype),
            sigmas=jnp.zeros((self.Nt + 1, self.Nx, self.Nx), self.dtype),
            con_par=jnp.zeros(self.num_con_par, self.dtype),
            consts=self.consts)

    # ------------------------------------------------------------ closed loop

    def _closed_loop(self, x0, ref_windows, u0_guess, con_pars, noise_w,
                     consts, opost, n_steps, noise):
        """The fused receding-horizon loop: one ``lax.scan`` over control
        steps — solve, apply u0* to the plant, shift, repeat
        [SURVEY §3.4; BASELINE 'zero host round-trips'].

        ``ref_windows`` is (n_steps, Nt+1, Nx): the per-step reference
        window each solve previews (constant setpoint = identical windows;
        trajectory tracking = a sliding window over the reference)."""
        u_start = jnp.zeros(self.Nu, self.dtype)
        warm = self._init_warm(self._augment_x0(x0, u_start),
                               ref_windows[0], u0_guess)
        sigma0 = jnp.zeros((self.Nx, self.Nx), self.dtype)

        # cold-start preparation: one full-budget solve preconditions the
        # warm state so the in-loop (possibly RTI-grade) budget only tracks
        if self.init_sqp_cfg != self.sqp_cfg:
            warm, _, _, _ = self._solve_step(
                warm, x0, ref_windows[0], u_start, sigma0,
                con_pars[0] if con_pars.shape[0] else
                jnp.zeros(self.num_con_par, self.dtype),
                consts, cfg=self.init_sqp_cfg)

        def step(carry, inp):
            x, warm, u_prev, opost = carry
            x_sp, con_par, w = inp
            if self.online_capacity is not None:
                consts_k = consts._replace(
                    post=self._og.as_gp_posterior(opost))
            else:
                consts_k = consts
            warm, u_cmd, sigmas, info = self._solve_step(
                warm, x, x_sp, u_prev, sigma0, con_par, consts_k)
            # physical actuator saturation: the plant can only receive inputs
            # inside the hard box (and rate window, if bounded), whatever the
            # solver's residual violation
            u_cmd = jnp.clip(u_cmd, consts.ulb, consts.uub)
            if self.has_du_bounds:
                u_cmd = jnp.clip(u_cmd, u_prev + consts.dulb,
                                 u_prev + consts.duub)
            x_next = self.model.integrate(x, u_cmd)
            if noise:
                x_next = x_next + w
            if self.model.clip_negative:
                x_next = jnp.maximum(x_next, 0.0)
            if self.online_capacity is not None:
                # condition on the transition actually observed (incl. noise),
                # mapped into the space the GP was trained on: raw next state
                # in pure-GP mode, model residual through Bd in hybrid mode
                z_obs = jnp.concatenate([x, u_cmd])
                if self.discrete_method == "hybrid":
                    y_obs = self._bd_pinv @ (x_next - self.model.rk4(x, u_cmd))
                else:
                    y_obs = x_next
                opost = self._og.condition(opost, consts.norm, z_obs, y_obs,
                                           kernel=self._online_kernel,
                                           policy=self.online_policy,
                                           mean_func=self._online_mean_func)
            out = (x, u_cmd, sigmas[1, :self.Nx, :self.Nx], info)
            return (x_next, warm, u_cmd, opost), out

        (x_last, _, _, opost), (xs, us, sig1s, infos) = jax.lax.scan(
            step, (x0, warm, u_start, opost),
            (ref_windows, con_pars, noise_w), length=n_steps)
        xs = jnp.concatenate([xs, x_last[None]], axis=0)
        return xs, us, sig1s, infos, opost

    def _prep_ref_windows(self, x_sp, n_steps):
        """(Nx,) setpoint or (M, Nx) reference trajectory -> per-step preview
        windows (n_steps, Nt+1, Nx) [SURVEY C6 + beyond-ref preview MPC]."""
        x_sp = jnp.asarray(x_sp, self.dtype)
        if x_sp.ndim == 1:
            return jnp.broadcast_to(
                x_sp[None, None, :], (n_steps, self.Nt + 1, self.Nx))
        if x_sp.ndim != 2 or x_sp.shape[1] != self.Nx:
            raise ValueError(
                f"reference trajectory must be (M, Nx={self.Nx}); "
                f"got {x_sp.shape}")
        if x_sp.shape[0] < n_steps:
            raise ValueError(
                f"reference trajectory needs >= n_steps={n_steps} rows; "
                f"got {x_sp.shape}")
        idx = jnp.clip(jnp.arange(n_steps)[:, None]
                       + jnp.arange(self.Nt + 1)[None, :],
                       0, x_sp.shape[0] - 1)
        return x_sp[idx]                           # (n_steps, Nt+1, Nx)

    def _prep_con_pars(self, con_par_func, n_steps):
        """Host-side precompute of per-step user-constraint parameters
        (the reference calls con_par_func(k) per step [SURVEY C6])."""
        if con_par_func is not None:
            con_pars = jnp.asarray(
                np.stack([np.asarray(con_par_func(k), dtype=np.float64)
                          for k in range(n_steps)]), self.dtype)
            return con_pars.reshape(n_steps, self.num_con_par)
        return jnp.zeros((n_steps, self.num_con_par), self.dtype)

    def _noise_chol(self):
        return jnp.linalg.cholesky(
            self.model.R + 1e-32 * jnp.eye(self.Nx, dtype=self.dtype))

    def solve_mc(self, x0, sim_time, x_sp, n_mc: int, u0=None,
                 con_par_func: Optional[Callable] = None,
                 key: Optional[jax.Array] = None, mesh=None):
        """Monte-Carlo ensemble of closed loops: ``n_mc`` independent
        process-noise realizations of the SAME receding-horizon simulation,
        vmapped into one compiled program (beyond-reference — the reference
        runs one rollout per script invocation [SURVEY §2.3 'DP absent']).

        ``x0`` is a single (Nx,) initial state shared by every rollout or a
        per-rollout batch (n_mc, Nx).  Returns ``(x_sim (n_mc, M+1, Nx),
        u_sim (n_mc, M, Nu))``; per-lane diagnostics land in ``last_mc``.

        The main consumer is the empirical chance-constraint calibration
        check (:mod:`gpmpc_tpu.utils.calibration`): the controller promises
        per-state violation probability <= 1 - percentile, and this ensemble
        is how that claim is audited on the actual closed loop.

        ``mesh`` (any ``jax.sharding.Mesh`` — 1D ``("dp",)`` or the
        multi-host 2D ``("dcn", "dp")`` from
        :func:`gpmpc_tpu.parallel.distributed.make_study_mesh`) shards the
        Monte-Carlo lanes over all mesh axes — same scaling recipe as
        :class:`~gpmpc_tpu.parallel.batched.BatchedStudy` [SURVEY §2.3]:
        annotate the batch axis, let XLA place the lanes.
        """
        n_steps = int(round(sim_time / self.dt))
        x0 = jnp.asarray(x0, self.dtype)
        if (x0.ndim == 1 and x0.shape != (self.Nx,)) or x0.ndim > 2 or (
                x0.ndim == 2 and x0.shape != (n_mc, self.Nx)):
            raise ValueError(f"x0 must be ({self.Nx},) or ({n_mc}, "
                             f"{self.Nx}); got {x0.shape}")
        x0s = (jnp.broadcast_to(x0[None], (n_mc, self.Nx))
               if x0.ndim == 1 else x0)
        ref_windows = self._prep_ref_windows(x_sp, n_steps)
        u0_guess = (jnp.tile(jnp.asarray(u0, self.dtype)[None], (self.Nt, 1))
                    if u0 is not None else None)
        con_pars = self._prep_con_pars(con_par_func, n_steps)

        if key is None:
            key = jax.random.PRNGKey(0)
        noise_ws = (jax.random.normal(key, (n_mc, n_steps, self.Nx),
                                      self.dtype)
                    @ self._noise_chol().T)

        opost = (self.online_post0 if self.online_capacity is not None
                 else None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp = NamedSharding(mesh, P(tuple(mesh.axis_names)))
            x0s = jax.device_put(x0s, dp)
            noise_ws = jax.device_put(noise_ws, dp)
        xs, us, sig1s, infos, _ = self._solve_mc_jit(
            x0s, ref_windows, u0_guess, con_pars, noise_ws, self.consts,
            opost, n_steps=n_steps, noise=True)
        xs.block_until_ready()
        self._last_mc = {
            "x_sim": np.asarray(xs), "u_sim": np.asarray(us),
            "sigmas": np.asarray(sig1s),
            "converged": np.asarray(infos.converged),
            "x_sp": np.asarray(ref_windows[:, 0, :]),
        }
        return xs, us

    @property
    def last_mc(self):
        return self._last_mc

    def solve(self, x0, sim_time, x_sp, u0=None, noise: bool = True,
              con_par_func: Optional[Callable] = None,
              key: Optional[jax.Array] = None):
        """Closed-loop receding-horizon simulation [SURVEY C6 ``MPC.solve``].

        ``x_sp`` is a fixed setpoint (Nx,) — the reference's semantics — or
        a reference TRAJECTORY (M, Nx) with M >= n_steps: step k's solve
        previews the sliding window ``ref[k : k+Nt+1]`` (held at the final
        row past the end), giving the controller true preview of upcoming
        reference motion (beyond-reference capability).

        Returns ``(x_sim (M+1, Nx), u_sim (M, Nu))`` like the reference;
        per-step diagnostics and predicted covariances are stored for
        ``plot()`` and available via ``last_run``.
        """
        n_steps = int(round(sim_time / self.dt))
        x0 = jnp.asarray(x0, self.dtype)
        ref_windows = self._prep_ref_windows(x_sp, n_steps)
        u0_guess = (jnp.tile(jnp.asarray(u0, self.dtype)[None], (self.Nt, 1))
                    if u0 is not None else None)
        con_pars = self._prep_con_pars(con_par_func, n_steps)

        if key is None:
            key = jax.random.PRNGKey(0)
        noise_w = (jax.random.normal(key, (n_steps, self.Nx), self.dtype)
                   @ self._noise_chol().T)

        opost = (self.online_post0 if self.online_capacity is not None
                 else None)
        t_start = time.perf_counter()
        xs, us, sig1s, infos, opost = self._closed_loop_jit(
            x0, ref_windows, u0_guess, con_pars, noise_w, self.consts, opost,
            n_steps=n_steps, noise=noise)
        xs.block_until_ready()
        wall = time.perf_counter() - t_start
        self.online_post = opost

        self._last_run = {
            "x_sim": np.asarray(xs), "u_sim": np.asarray(us),
            "sigmas": np.asarray(sig1s),
            "obj": np.asarray(infos.obj),
            "defect": np.asarray(infos.defect),
            "con_viol": np.asarray(infos.con_viol),
            "stat": np.asarray(infos.stat),
            "iters": np.asarray(infos.iters),
            "converged": np.asarray(infos.converged),
            # per-step applied reference (n_steps, Nx) — constant rows for a
            # fixed setpoint, the tracked curve for a trajectory reference
            "x_sp": np.asarray(ref_windows[:, 0, :]),
            "wall_time_total": wall,
            "wall_time_per_step": wall / max(n_steps, 1),
            "gp_points": (int(opost.count)
                          if self.online_capacity is not None else None),
        }
        return xs, us

    @property
    def last_run(self):
        return self._last_run

    def __repr__(self):
        return (f"MPC(Nt={self.Nt}, Nx={self.Nx}, Nu={self.Nu}, "
                f"dt={self.dt}, {self.options})")

    # ------------------------------------------------------------ plotting

    def plot(self, filename: Optional[str] = None, show: bool = False):
        """Closed-loop states/inputs with constraint lines and +/-2sigma
        prediction bands [SURVEY C6 'plotting']; host-side matplotlib."""
        if self._last_run is None:
            raise RuntimeError("nothing to plot — call solve() first")
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        r = self._last_run
        xs, us, sig = r["x_sim"], r["u_sim"], r["sigmas"]
        t_x = np.arange(xs.shape[0]) * self.dt
        t_u = np.arange(us.shape[0]) * self.dt
        fig, axes = plt.subplots(self.Nx + self.Nu, 1, sharex=True,
                                 figsize=(8, 2.2 * (self.Nx + self.Nu)))
        axes = np.atleast_1d(axes)
        for i in range(self.Nx):
            ax = axes[i]
            ax.plot(t_x, xs[:, i], label=f"x{i}")
            std = np.sqrt(np.maximum(sig[:, i, i], 0.0))
            ax.fill_between(t_u + self.dt, xs[1:, i] - 2 * std,
                            xs[1:, i] + 2 * std, alpha=0.2,
                            label="±2σ (predicted)")
            if float(self.xub[i]) < _BIG:
                ax.axhline(float(self.xub[i]), ls="--", c="r", lw=0.8)
            if float(self.xlb[i]) > -_BIG:
                ax.axhline(float(self.xlb[i]), ls="--", c="r", lw=0.8)
            ax.plot(t_u, r["x_sp"][:, i], ls=":", c="g", lw=0.9,
                    label="reference")
            ax.legend(loc="best", fontsize=7)
        for j in range(self.Nu):
            ax = axes[self.Nx + j]
            ax.step(t_u, us[:, j], where="post", label=f"u{j}")
            if float(self.uub[j]) < _BIG:
                ax.axhline(float(self.uub[j]), ls="--", c="r", lw=0.8)
            if float(self.ulb[j]) > -_BIG:
                ax.axhline(float(self.ulb[j]), ls="--", c="r", lw=0.8)
            ax.legend(loc="best", fontsize=7)
        axes[-1].set_xlabel("time [s]")
        fig.tight_layout()
        if filename:
            fig.savefig(filename, dpi=120)
        if show:  # pragma: no cover
            plt.show()
        plt.close(fig)
        return fig
