"""Plant / physical model layer.

TPU-native rebuild of the reference's ``gp_mpc/model_class.py::Model``
[SURVEY C2]: wraps a continuous-time ODE into integrators, linearization,
closed-loop simulation, and training-data generation.

Where the reference calls CasADi's CVODES integrator (adaptive-step, C) per
sample in a Python loop [SURVEY §3.1], here integration runs on device:
fixed-step RK4 with configurable substeps under ``lax.scan`` (deterministic,
differentiable end-to-end, default) or adaptive-step Dormand-Prince RK5(4)
with PI step-size control under ``lax.while_loop``
(``integrator='adaptive'`` — the full CVODES-role error-controlled
integrator, forward-mode differentiable).  Either way the whole N-sample
data-generation sweep is one vmapped compiled program instead of N
Python->C round-trips.  A first-party C++ DOPRI5 host integrator
(:mod:`gpmpc_tpu.native`) provides the independent truth source.

The ODE is any pure-JAX callable ``ode(x, u) -> dx/dt``; semi-explicit
index-1 DAE systems — the reference's ``alg`` option [SURVEY C2,
confidence M] — are supported via pointwise Newton elimination of the
algebraic variables (see ``__init__``).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


class Model:
    """Continuous-time plant wrapped into discrete-time maps.

    Parity surface (``gp_mpc/model_class.py`` [SURVEY C2]):
    ``integrate``, ``sim``, ``linearize``, ``discrete_linearize``, ``rk4``,
    ``generate_training_data``, ``get_size``.
    """

    def __init__(self,
                 Nx: int,
                 Nu: int,
                 ode: Callable,
                 dt: float,
                 R: Optional[jnp.ndarray] = None,
                 alg: Optional[Callable] = None,
                 Nz: Optional[int] = None,
                 z_guess: Optional[Callable] = None,
                 alg_newton_iters: int = 12,
                 clip_negative: bool = False,
                 integrator_substeps: int = 20,
                 integrator: str = "rk4",
                 fused_integrator: bool = False,
                 rtol: float = 1e-6,
                 atol: float = 1e-9,
                 max_adaptive_steps: int = 10_000,
                 dtype=jnp.float32):
        """With ``alg`` given, the plant is a semi-explicit index-1 DAE

            x' = ode(x, z, u),   0 = alg(x, z, u),   z in R^Nz

        (the reference's casadi/CVODES DAE path [SURVEY C2 ``alg``]).  The
        algebraic variables are eliminated pointwise by a fixed-count Newton
        solve (trace-unrolled Gauss-Jordan on the Nz x Nz system — vmappable,
        no LAPACK HLOs), so every discrete map (rk4/integrate/linearize/
        NLP embedding) works on the reduced ODE unchanged; derivatives flow
        through the converged Newton iterations (implicit function theorem
        in the fixed-point limit).  ``z_guess(x, u) -> (Nz,)`` supplies the
        Newton starting point (default zeros); index-1 means dalg/dz is
        nonsingular along trajectories.
        """
        self.Nx = int(Nx)
        self.Nu = int(Nu)
        self.dt = float(dt)
        self.dtype = dtype
        self.R = (jnp.zeros((Nx, Nx), dtype) if R is None
                  else jnp.asarray(R, dtype))
        self.clip_negative = bool(clip_negative)
        self.integrator_substeps = int(integrator_substeps)
        if integrator not in ("rk4", "adaptive"):
            raise ValueError(f"unknown integrator {integrator!r} "
                             "(expected 'rk4' or 'adaptive')")
        self.integrator = integrator
        # opt-in: run the RK4 substep chain as one Pallas kernel launch
        # (the chain is launch-latency-bound on TPU — ~100 us for 10
        # substeps at Nx=4, vs ~10 us fused).  Opt-in because the ODE must
        # lower through Mosaic (pure jnp elementwise math does; exotic ops
        # may not) and the kernel is f32 + not reverse-differentiable —
        # plant truth only, never the NLP-embedded map.  SINGLE-ROLLOUT
        # only: vmapped over a large batch the kernel is ~2x SLOWER than
        # the batched XLA scan chain (measured at B=1024, RESULTS.md
        # "vmapped-Pallas trap") — batched studies should keep the default.
        self.fused_integrator = bool(fused_integrator)
        if self.fused_integrator:
            if dtype == jnp.float64:
                raise ValueError(
                    "fused_integrator=True runs in f32 (TPU production "
                    "dtype) — it would silently break the x64 parity path; "
                    "use the default integrator for float64 models")
            if alg is not None:
                raise ValueError(
                    "fused_integrator=True does not support DAE (alg) "
                    "systems: the Newton elimination's fori_loop/jacfwd "
                    "does not lower through Mosaic")
            if integrator == "adaptive":
                raise ValueError(
                    "fused_integrator=True applies to the fixed-step RK4 "
                    "chain; integrator='adaptive' would silently bypass it "
                    "— pick one")
        self.rtol = float(rtol)
        self.atol = float(atol)
        self.max_adaptive_steps = int(max_adaptive_steps)

        self.alg = alg
        if alg is not None:
            if Nz is None or int(Nz) <= 0:
                raise ValueError("DAE systems require Nz (the number of "
                                 "algebraic variables)")
            self.Nz = int(Nz)
            self._ode_dae = ode                 # ode(x, z, u)
            self._z_guess = z_guess
            self._alg_iters = int(alg_newton_iters)
            self.ode = self._dae_reduced        # ode(x, u) for all callers
        else:
            self.Nz = 0
            self.ode = ode

        self._integrate_jit = jax.jit(self.integrate)
        self._rk4_jit = jax.jit(self.rk4)

    # ------------------------------------------------------------ DAE layer

    def solve_alg(self, x: jnp.ndarray, u: jnp.ndarray,
                  z0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Newton solve of 0 = alg(x, z, u) for the algebraic variables z.

        Fixed iteration count (jit/scan/vmap friendly); the linear step uses
        the trace-unrolled Gauss-Jordan solve from :mod:`gpmpc_tpu.ops.chol`
        (batched LAPACK HLOs are pathological on this backend)."""
        from gpmpc_tpu.ops.chol import ge_solve_small

        if z0 is None:
            z0 = (self._z_guess(x, u) if self._z_guess is not None
                  else jnp.zeros(self.Nz, x.dtype))

        def body(_, z):
            g = self.alg(x, z, u)
            jz = jax.jacfwd(lambda zz: self.alg(x, zz, u))(z)
            return z + ge_solve_small(jz, -g)

        return jax.lax.fori_loop(0, self._alg_iters, body, z0)

    def _dae_reduced(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """Reduced ODE x' = f(x, z*(x, u), u) with z* from the Newton solve."""
        z = self.solve_alg(x, u)
        return self._ode_dae(x, z, u)

    # ------------------------------------------------------------ core maps

    def _rk4_step(self, x: jnp.ndarray, u: jnp.ndarray,
                  h: float) -> jnp.ndarray:
        k1 = self.ode(x, u)
        k2 = self.ode(x + 0.5 * h * k1, u)
        k3 = self.ode(x + 0.5 * h * k2, u)
        k4 = self.ode(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    def rk4(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """One RK4 step over dt — the cheap discrete map embedded in the NLP
        (``discrete_method='rk4'``).  Parity: ``Model.rk4`` [SURVEY C2]."""
        return self._rk4_step(x, u, self.dt)

    def integrate(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """High-accuracy one-step integration over dt (plant truth /
        ``discrete_method='exact'``).  Replaces the reference's CVODES call
        (``Model.integrate`` [SURVEY C2]): ``integrator_substeps`` RK4
        substeps under ``lax.scan`` by default, or error-controlled
        Dormand-Prince RK5(4) when the model was built with
        ``integrator='adaptive'``."""
        if self.integrator == "adaptive":
            return self.integrate_adaptive(x, u)
        h = self.dt / self.integrator_substeps
        if self.fused_integrator:
            from gpmpc_tpu.ops.pallas_kernels import rk4_substeps_pallas
            return rk4_substeps_pallas(
                self.ode, x, u, h, self.integrator_substeps,
                interpret=jax.default_backend() != "tpu")

        def body(xc, _):
            return self._rk4_step(xc, u, h), None

        xf, _ = jax.lax.scan(body, x, None, length=self.integrator_substeps)
        return xf

    # Dormand-Prince RK5(4)7M tableau (same pair as the C++ host integrator
    # csrc/integrator.cpp and, in role, CVODES' adaptive stepping the
    # reference relies on through casadi.integrator [SURVEY §2.2 CVODES row]).
    _DP_A = (
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    )
    # 5th-order solution weights == last A row (FSAL); 4th-order embedded
    _DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
              -92097 / 339200, 187 / 2100, 1 / 40)

    def _dopri5_step(self, x, u, h, k1):
        """One DOPRI5 trial step from a supplied first stage ``k1 = f(x)``
        (FSAL: on an accepted step the returned last stage ``k7 = f(x5)``
        IS the next step's k1, so the pair costs 6 fresh ODE evals, not 7).
        Returns (x5, err, k7) with err the 5th-minus-embedded-4th-order
        difference."""
        f = lambda xx: self.ode(xx, u)
        k = [k1]
        for row in self._DP_A:
            xs = x + h * sum(a * ki for a, ki in zip(row, k) if a != 0.0)
            k.append(f(xs))
        x5 = xs                       # last stage uses the b-row (FSAL form)
        x4 = x + h * sum(b * ki for b, ki in zip(self._DP_B4, k)
                         if b != 0.0)
        return x5, x5 - x4, k[-1]

    def integrate_adaptive(self, x: jnp.ndarray, u: jnp.ndarray,
                           rtol: Optional[float] = None,
                           atol: Optional[float] = None) -> jnp.ndarray:
        """Error-controlled one-step integration over dt: Dormand-Prince
        RK5(4) with a PI step-size controller under ``lax.while_loop`` —
        the on-device equivalent of the reference's adaptive CVODES call
        (``casadi.integrator`` [SURVEY C2/§2.2]).  jit/vmap-compatible and
        forward-mode differentiable (``lax.while_loop`` has no reverse
        rule — for NLP embedding keep the default fixed-step ``rk4`` map,
        which differentiates both ways).

        Failure is NOT silent: if the step budget is exhausted before
        reaching ``dt``, or any step had to be force-accepted at the minimum
        step size with its error estimate still above tolerance (stiff
        problem beyond this integrator — CVODES' BDF territory), the result
        is poisoned with NaN so downstream consumers (golden generation,
        ``discrete_method='exact'``, the solver's finiteness guards) see the
        failure instead of trusting a truncated or inaccurate state."""
        dtype = x.dtype
        rtol = jnp.asarray(self.rtol if rtol is None else rtol, dtype)
        atol = jnp.asarray(self.atol if atol is None else atol, dtype)
        t_end = jnp.asarray(self.dt, dtype)
        # initial step: a conservative fraction of the interval
        h0 = t_end / jnp.asarray(10.0, dtype)
        h_min = t_end * jnp.asarray(1e-6, dtype)
        # Gustafsson PI controller exponents for an order-5 pair:
        # h *= safety * err^(-0.7/5) * err_prev^(0.4/5) — the proportional
        # term damps the accept/reject oscillation an I-only controller
        # shows on mildly stiff problems (Hairer & Wanner II.4)
        safety = 0.9
        pi_alpha, pi_beta = 0.7 / 5.0, 0.4 / 5.0

        def cond(carry):
            t, _x, _h, _k1, _ep, n, _bad = carry
            return (t < t_end) & (n < self.max_adaptive_steps)

        def body(carry):
            t, xc, h, k1, en_prev, n, bad = carry
            h = jnp.minimum(h, t_end - t)
            x5, err, k7 = self._dopri5_step(xc, u, h, k1)
            scale = atol + rtol * jnp.maximum(jnp.abs(xc), jnp.abs(x5))
            enorm = jnp.sqrt(jnp.mean((err / scale) ** 2))
            accept = (enorm <= 1.0) | (h <= h_min)
            # a force-accept at h_min with error still above tolerance means
            # the error control has failed (stiffness beyond RK5(4))
            bad = bad | ((enorm > 1.0) & (h <= h_min))
            t_n = jnp.where(accept, t + h, t)
            x_n = jnp.where(accept, x5, xc)
            # FSAL: the accepted step's k7 = f(x5) is the next step's k1;
            # a rejected step retries from the same xc, so k1 is reusable
            # either way
            k1_n = jnp.where(accept, k7, k1)
            en = jnp.maximum(enorm, 1e-10)
            fac = (safety * jnp.power(en, -pi_alpha)
                   * jnp.power(jnp.maximum(en_prev, 1e-10), pi_beta))
            h_n = jnp.maximum(h * jnp.clip(fac, 0.2, 5.0), h_min)
            en_n = jnp.where(accept, en, en_prev)
            return t_n, x_n, h_n, k1_n, en_n, n + 1, bad

        t_f, xf, _, _, _, _, bad = jax.lax.while_loop(
            cond, body, (jnp.zeros((), dtype), x, h0, self.ode(x, u),
                         jnp.ones((), dtype), jnp.zeros((), jnp.int32),
                         jnp.asarray(False)))
        failed = bad | (t_f < t_end)      # budget exhausted mid-interval
        return jnp.where(failed, jnp.full_like(xf, jnp.nan), xf)

    # ------------------------------------------------------------ simulate

    def sim(self, x0: jnp.ndarray, u_seq: jnp.ndarray,
            noise: bool = False,
            key: Optional[jax.Array] = None) -> jnp.ndarray:
        """Multi-step rollout under a control sequence; optional additive
        process noise ~ N(0, R) per step.  Parity: ``Model.sim`` [SURVEY C2].
        Returns the state trajectory (T+1, Nx) including x0."""
        T = u_seq.shape[0]
        chol_r = jnp.linalg.cholesky(
            self.R + 1e-32 * jnp.eye(self.Nx, dtype=self.dtype))
        if noise:
            if key is None:
                raise ValueError("sim(noise=True) requires a PRNG key")
            eps = jax.random.normal(key, (T, self.Nx), dtype=self.dtype)
            w = eps @ chol_r.T
        else:
            w = jnp.zeros((T, self.Nx), dtype=self.dtype)

        def step(x, inp):
            u, wk = inp
            xn = self.integrate(x, u) + wk
            if self.clip_negative:
                xn = jnp.maximum(xn, 0.0)
            return xn, xn

        _, xs = jax.lax.scan(step, jnp.asarray(x0, self.dtype), (u_seq, w))
        return jnp.concatenate([jnp.asarray(x0, self.dtype)[None], xs], axis=0)

    # ------------------------------------------------------------ linearize

    def linearize(self, x: jnp.ndarray, u: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Continuous-time Jacobians A = df/dx, B = df/du at (x, u).
        Parity: ``Model.linearize`` [SURVEY C2] — ``jax.jacfwd`` replaces
        CasADi symbolic jacobians."""
        a = jax.jacfwd(lambda xx: self.ode(xx, u))(x)
        b = jax.jacfwd(lambda uu: self.ode(x, uu))(u)
        return a, b

    def discrete_linearize(self, x: jnp.ndarray, u: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Discrete-time Jacobians of the one-step RK4 map.
        Parity: ``Model.discrete_linearize`` [SURVEY C2]."""
        a = jax.jacfwd(lambda xx: self.rk4(xx, u))(x)
        b = jax.jacfwd(lambda uu: self.rk4(x, uu))(u)
        return a, b

    # ------------------------------------------------------ training data

    def generate_training_data(self, N: int,
                               uub, ulb, xub, xlb,
                               noise: bool = True,
                               key: Optional[jax.Array] = None
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample (x, u) uniformly in box bounds, integrate one step, add
        measurement noise ~ N(0, R).  Returns X (N, Nx+Nu), Y (N, Nx).
        Parity: ``Model.generate_training_data`` [SURVEY C2, §3.1] — the
        N-sample loop is a single vmapped program."""
        if key is None:
            key = jax.random.PRNGKey(0)
        kx, ku, kn = jax.random.split(key, 3)
        xlb = jnp.asarray(xlb, self.dtype)
        xub = jnp.asarray(xub, self.dtype)
        ulb = jnp.asarray(ulb, self.dtype)
        uub = jnp.asarray(uub, self.dtype)
        x0 = jax.random.uniform(kx, (N, self.Nx), dtype=self.dtype,
                                minval=xlb, maxval=xub)
        u0 = jax.random.uniform(ku, (N, self.Nu), dtype=self.dtype,
                                minval=ulb, maxval=uub)
        xn = jax.vmap(self.integrate)(x0, u0)
        if noise:
            chol_r = jnp.linalg.cholesky(
                self.R + 1e-32 * jnp.eye(self.Nx, dtype=self.dtype))
            xn = xn + jax.random.normal(kn, (N, self.Nx),
                                        dtype=self.dtype) @ chol_r.T
        if self.clip_negative:
            # keep sampled states physical (tank levels) [SURVEY C2 M]
            xn = jnp.maximum(xn, 0.0)
        return jnp.concatenate([x0, u0], axis=1), xn

    # ------------------------------------------------------------ misc

    def get_size(self) -> Tuple[int, int]:
        """(Nx, Nu).  Parity: ``Model.get_size`` [SURVEY C2]."""
        return self.Nx, self.Nu

    def predict_compare(self, x0, u_seq, predictor,
                        key: Optional[jax.Array] = None):
        """Rollout of the true plant vs. a one-step predictor (e.g. a trained
        GP's mean), for validation plots.  Parity: ``Model.predict_compare``
        [SURVEY C2, confidence M].  Returns (x_true (T+1,Nx), x_pred (T+1,Nx))."""
        x_true = self.sim(x0, u_seq, noise=key is not None, key=key)

        def step(x, u):
            xn = predictor(x, u)
            return xn, xn

        _, xp = jax.lax.scan(step, jnp.asarray(x0, self.dtype), u_seq)
        x_pred = jnp.concatenate([jnp.asarray(x0, self.dtype)[None], xp], 0)
        return x_true, x_pred

    def plot_compare(self, x_true, x_pred, filename=None):
        """Prediction-vs-simulation comparison plot [SURVEY C2 plotting,
        §4 'visual validation']; host-side matplotlib."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        x_true = np.asarray(x_true)
        x_pred = np.asarray(x_pred)
        t = np.arange(x_true.shape[0]) * self.dt
        fig, axes = plt.subplots(self.Nx, 1, sharex=True,
                                 figsize=(8, 2.0 * self.Nx))
        axes = np.atleast_1d(axes)
        for i in range(self.Nx):
            axes[i].plot(t, x_true[:, i], label=f"x{i} plant")
            axes[i].plot(t, x_pred[:, i], "--", label=f"x{i} predicted")
            axes[i].legend(loc="best", fontsize=7)
        axes[-1].set_xlabel("time [s]")
        fig.tight_layout()
        if filename:
            fig.savefig(filename, dpi=120)
        plt.close(fig)
        return fig
