"""Moving-horizon estimation: output-feedback state estimation for GP-MPC.

Beyond-reference component (the reference assumes the full state is
measured exactly — ``MPC.solve`` feeds the plant state straight back
[SURVEY C6 runtime]): an MHE estimator reconstructs the state from noisy,
possibly partial measurements by solving a small trajectory NLP over a
sliding window — the estimation-side twin of the controller, and it reuses
the SAME AL-SQP/Riccati machinery (:mod:`gpmpc_tpu.solvers.al_sqp`) with
zero solver changes:

    min_{x, w}  ||x_{k-M} - x_bar||^2_{P^-1}                (arrival cost)
              + sum_i ||y_i - h(x_i)||^2_{R^-1}             (measurements)
              + sum_i ||w_i||^2_{Q^-1}                      (process noise)
    s.t.        x_{i+1} = f(x_i, u_i) + w_i,   xlb <= x_i <= xub

The trick that makes it a standard :class:`TrajectoryProblem` is a virtual
pre-stage: NLP stage 0 holds the fixed prior ``x_bar`` (the solver pins the
initial state), and its "input" slot carries the arrival correction
``v_0 = x_{k-M} - x_bar`` with the arrival cost as its stage cost; stages
t >= 1 carry the process noise ``w`` in the input slot.  The initial state
is therefore free exactly as MHE requires, while the solver still sees a
fixed-initial-state multiple-shooting NLP whose block-banded KKT the
Riccati sweep factors as usual.

Unlike an EKF/UKF, the estimates respect state bounds (``xlb``/``xub``
enter as AL inequality constraints — the classic reason to prefer MHE for
constrained plants), and ``f`` can be any of the controller's discrete
models including the learned GP ('rk4' | 'exact' | 'gp' | 'hybrid').

Two arrival-cost policies:

* ``arrival_update=False`` (default): ``P_arrival`` is held fixed across
  windows (the common fixed-prior simplification; for linear-Gaussian
  problems with the matching prior the FULL-window estimate is exact
  regardless, see ``tests/test_mhe.py``), and the next window's prior mean
  is the smoothed estimate of its start state.
* ``arrival_update=True``: the prior is propagated by an EKF recursion as
  each measurement leaves the window (condition on the departing
  measurement, predict through the dynamics — the filtered arrival cost of
  Rao & Rawlings).  On linear-Gaussian problems this makes the SHORT-window
  filter exactly the Kalman filter (tested); on nonlinear problems the
  jacobians are anchored at the window's smoothed start estimate.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from gpmpc_tpu.models.gp import GP, mean_fn_functional
from gpmpc_tpu.solvers import al_sqp
from gpmpc_tpu.utils.config import SQPConfig, resolve_solver_opts

_BIG = 1e9


def _as_cov(a, n: int, dtype) -> jnp.ndarray:
    """Scalar / diag vector / full matrix -> (n, n) covariance."""
    a = jnp.asarray(a, dtype)
    if a.ndim == 0:
        return a * jnp.eye(n, dtype=dtype)
    if a.ndim == 1:
        return jnp.diag(a)
    return a


class MHEConsts(NamedTuple):
    """Constant device arrays the estimation NLP reads."""

    q_inv: jnp.ndarray            # (Nx, Nx) process-noise information
    r_inv: jnp.ndarray            # (Nm, Nm) measurement information
    p_inv: jnp.ndarray            # (Nx, Nx) arrival information
    xlb: jnp.ndarray              # (Nx,) estimate bounds (+-_BIG = off)
    xub: jnp.ndarray
    x_scale: jnp.ndarray
    bd: Optional[jnp.ndarray]     # hybrid residual selector
    post: Optional[object]        # GPPosterior or None
    norm: Optional[object]        # Normalization or None


class MHEParams(NamedTuple):
    """Per-solve runtime data (one sliding window)."""

    x_bar: jnp.ndarray            # (Nx,) arrival prior mean
    us: jnp.ndarray               # (M, Nu) applied inputs in the window
    ys: jnp.ndarray               # (M+1, Nm) measurements at window states
    p_inv: jnp.ndarray            # (Nx, Nx) arrival information this window
    consts: MHEConsts


class MHEState(NamedTuple):
    """Online filtering state (carried across measurement steps)."""

    y_buf: jnp.ndarray            # (M+1, Nm)
    u_buf: jnp.ndarray            # (M, Nu)
    x_bar: jnp.ndarray            # (Nx,) prior for the window-start state
    p: jnp.ndarray                # (Nx, Nx) prior covariance (used by the
                                  # EKF recursion when arrival_update=True;
                                  # carried but constant otherwise)
    fill: jnp.ndarray             # scalar int: remaining fill-in steps whose
                                  # departing buffer entries are synthetic
                                  # (init_filter's repeated y0) — the EKF
                                  # recursion must not condition on them
    solver: al_sqp.SolverState    # warm start


class MHE:
    """Moving-horizon estimator over a window of ``window`` transitions.

    Parameters
    ----------
    model : Model
        Plant model (supplies the discrete dynamics and ``dt``).
    gp : GP, optional
        Learned model for ``discrete_method`` in {'gp', 'hybrid'}.
    window : int
        Number of transitions M in the sliding window (M+1 states).
    Q_noise : array-like, optional
        Process-noise covariance (scalar/diag/full).  Default: ``model.R``.
    R_meas : array-like
        Measurement-noise covariance (scalar/diag/full).  Required.
    P_arrival : array-like, optional
        Arrival-prior covariance.  Default ``10 * Q_noise``.
    h : callable, optional
        Measurement map ``x -> y``.  Default: identity (full noisy state).
    xlb, xub : array-like, optional
        Bounds on the state estimates (MHE's advantage over EKF/UKF).
    discrete_method : str
        'rk4' | 'exact' | 'gp' | 'hybrid' — same semantics as the MPC.
    arrival_update : bool
        Propagate the arrival prior (mean + covariance) by an EKF
        recursion as measurements leave the window (filtered arrival
        cost); default keeps the fixed-``P_arrival`` policy.
    """

    def __init__(self, model, gp: Optional[GP] = None, *, window: int = 10,
                 Q_noise=None, R_meas=None, P_arrival=None,
                 h: Optional[Callable] = None,
                 xlb=None, xub=None,
                 discrete_method: str = "rk4",
                 hybrid_Bd=None,
                 arrival_update: bool = False,
                 solver_opts: Optional[Union[str, dict]] = None):
        if window < 1:
            raise ValueError("window must be >= 1")
        if R_meas is None:
            raise ValueError("R_meas (measurement-noise covariance) is "
                             "required — it sets the data weight")
        dm = discrete_method
        if dm not in ("rk4", "exact", "gp", "hybrid"):
            raise ValueError(f"unknown discrete_method {dm!r}")
        if dm in ("gp", "hybrid") and gp is None:
            raise ValueError(f"discrete_method={dm!r} requires a GP")

        self.model = model
        self.gp = gp
        self.M = int(window)
        self.Nx = model.Nx
        self.Nu = model.Nu
        self.discrete_method = dm
        dtype = model.dtype
        self.dtype = dtype

        self.h = h if h is not None else (lambda x: x)
        self.Nm = int(jax.eval_shape(self.h,
                                     jax.ShapeDtypeStruct((self.Nx,), dtype)
                                     ).shape[0])

        q = _as_cov(Q_noise if Q_noise is not None else model.R,
                    self.Nx, dtype)
        r = _as_cov(R_meas, self.Nm, dtype)
        p = (_as_cov(P_arrival, self.Nx, dtype) if P_arrival is not None
             else 10.0 * q)
        self.arrival_update = bool(arrival_update)
        self._q_mat, self._r_mat, self._p0 = q, r, p

        xlb = (jnp.full((self.Nx,), -_BIG, dtype) if xlb is None
               else jnp.asarray(xlb, dtype))
        xub = (jnp.full((self.Nx,), _BIG, dtype) if xub is None
               else jnp.asarray(xub, dtype))
        self._has_bounds = bool(np.any(np.asarray(xlb) > -_BIG)
                                or np.any(np.asarray(xub) < _BIG))
        x_scale = jnp.where(xub - xlb < _BIG,
                            jnp.maximum(xub - xlb, 1e-6), 1.0)

        if dm == "hybrid":
            bd = (jnp.asarray(hybrid_Bd, dtype) if hybrid_Bd is not None
                  else jnp.eye(self.Nx, dtype=dtype))
        else:
            bd = None
        self.consts = MHEConsts(
            q_inv=jnp.linalg.inv(q), r_inv=jnp.linalg.inv(r),
            p_inv=jnp.linalg.inv(p), xlb=xlb, xub=xub, x_scale=x_scale,
            bd=bd,
            post=gp.post if gp is not None else None,
            norm=gp.norm if gp is not None else None)
        self._gp_cfg = gp.cfg if gp is not None else None

        opts = dict(al_iters=3 if self._has_bounds else 1, max_iters=25)
        opts.update(resolve_solver_opts(solver_opts, dtype))
        self.sqp_cfg = SQPConfig(**opts)
        if dtype == jnp.float64 and self.sqp_cfg.fused_kkt:
            raise ValueError("fused_kkt runs the KKT sweep in f32; "
                             "use the default Riccati path for f64 MHE")

        self._build_problem()
        self._solve_jit = jax.jit(self._solve)
        self._step_jit = jax.jit(self._step)
        self._run_jit = jax.jit(self._run)

    # ------------------------------------------------------------ dynamics

    def _mean_dynamics(self, x, u):
        dm = self.discrete_method
        if dm == "rk4":
            return self.model.rk4(x, u)
        if dm == "exact":
            return self.model.integrate(x, u)
        z = jnp.concatenate([x, u])
        gp_mean = mean_fn_functional(self.consts.post, self.consts.norm,
                                     self._gp_cfg, z)
        if dm == "gp":
            return gp_mean
        return self.model.rk4(x, u) + self.consts.bd @ gp_mean

    # ------------------------------------------------------------ NLP spec

    def _build_problem(self):
        nx, m = self.Nx, self.M

        def dynamics(z, v, t, params: MHEParams):
            # t=0: virtual arrival stage — x_{k-M} = x_bar + v_0 (free
            # initial state through the input slot); t>=1: model step + w
            u = params.us[jnp.clip(t - 1, 0, m - 1)]
            xn = self._mean_dynamics(z, u)
            return jnp.where(t == 0, z + v, xn + v)

        def stage_cost(z, v, t, params: MHEParams):
            c = params.consts
            w_inf = jnp.where(t == 0, params.p_inv, c.q_inv)
            cost = 0.5 * v @ w_inf @ v
            # measurement at window state x_{t-1} = z_t (none at the
            # virtual stage 0, where z is the prior mean)
            y = params.ys[jnp.clip(t - 1, 0, m)]
            resid = y - self.h(z)
            meas = 0.5 * resid @ c.r_inv @ resid
            return cost + jnp.where(t == 0, 0.0, meas)

        def terminal_cost(z, params: MHEParams):
            c = params.consts
            resid = params.ys[m] - self.h(z)
            return 0.5 * resid @ c.r_inv @ resid

        stage_ineq = None
        n_ineq = 0
        if self._has_bounds:
            n_ineq = 2 * nx

            def stage_ineq(z, v, t, params: MHEParams):
                c = params.consts
                g = jnp.concatenate([(c.xlb - z) / c.x_scale,
                                     (z - c.xub) / c.x_scale])
                # the virtual stage's state is the (fixed) prior — exempt
                return jnp.where(t == 0, -1.0, g)

        self._prob = al_sqp.TrajectoryProblem(
            nx=nx, nu=nx, horizon=m + 1,
            dynamics=dynamics, stage_cost=stage_cost,
            terminal_cost=terminal_cost,
            stage_ineq=stage_ineq, n_ineq=n_ineq)

    def _params(self, x_bar, us, ys, p_inv=None) -> MHEParams:
        return MHEParams(x_bar=jnp.asarray(x_bar, self.dtype),
                         us=jnp.asarray(us, self.dtype),
                         ys=jnp.asarray(ys, self.dtype),
                         p_inv=(self.consts.p_inv if p_inv is None
                                else p_inv),
                         consts=self.consts)

    def _solve(self, params: MHEParams, init: al_sqp.SolverState):
        return al_sqp.solve(self._prob, params, init, self.sqp_cfg)

    # ------------------------------------------------------------ one-shot

    def estimate(self, ys, us, x_bar, return_result: bool = False):
        """Smooth one window: measurements ``ys (M+1, Nm)`` at the window
        states, inputs ``us (M, Nu)`` between them, prior ``x_bar`` on the
        first state.  Returns the estimated states ``(M+1, Nx)``."""
        ys = jnp.atleast_2d(jnp.asarray(ys, self.dtype))
        us = jnp.asarray(us, self.dtype).reshape(self.M, self.Nu)
        if ys.shape != (self.M + 1, self.Nm):
            raise ValueError(f"ys must be ({self.M + 1}, {self.Nm}), "
                             f"got {ys.shape}")
        params = self._params(x_bar, us, ys)
        init = al_sqp.init_state(self._prob, params.x_bar, params=params)
        res = self._solve_jit(params, init)
        xs = res.state.x[1:]
        return (xs, res) if return_result else xs

    # ------------------------------------------------------------ online

    def init_filter(self, x_bar, y0) -> MHEState:
        """Start the online filter at the prior ``x_bar`` with the first
        measurement ``y0``.  The window buffers are pre-filled by repeating
        ``y0`` (zero inputs), so the first ~M estimates lean on the prior —
        the standard fill-in transient.  With ``arrival_update=True`` the
        EKF prior recursion starts only once the synthetic entries have
        flushed out of the window (conditioning on them would double-count
        ``y0``); use :meth:`start_filter` to skip the transient entirely."""
        x_bar = jnp.asarray(x_bar, self.dtype)
        y0 = jnp.asarray(y0, self.dtype)
        y_buf = jnp.tile(y0[None], (self.M + 1, 1))
        u_buf = jnp.zeros((self.M, self.Nu), self.dtype)
        params = self._params(x_bar, u_buf, y_buf)
        solver = al_sqp.init_state(self._prob, x_bar, params=params)
        return MHEState(y_buf=y_buf, u_buf=u_buf, x_bar=x_bar,
                        p=self._p0,
                        fill=jnp.asarray(self.M, jnp.int32),
                        solver=solver)

    def start_filter(self, x_bar, ys, us, p=None) -> MHEState:
        """Start the online filter from a FULL recorded window instead of
        the repeated-``y0`` fill-in: ``ys (M+1, Nm)`` measurements at the
        window states, ``us (M, Nu)`` inputs between them, ``x_bar`` prior
        on the window-start state, optional prior covariance ``p``
        (defaults to ``P_arrival``).  Solves the window once so the stored
        prior and warm start already refer to the NEXT window (the slide
        :meth:`step` performs); the first :meth:`step` then has no
        transient."""
        x_bar = jnp.asarray(x_bar, self.dtype)
        y_buf = jnp.asarray(ys, self.dtype).reshape(self.M + 1, self.Nm)
        u_buf = jnp.asarray(us, self.dtype).reshape(self.M, self.Nu)
        p = self._p0 if p is None else _as_cov(p, self.Nx, self.dtype)
        params = self._params(x_bar, u_buf, y_buf, p_inv=jnp.linalg.inv(p))
        init = al_sqp.init_state(self._prob, x_bar, params=params)
        res = self._solve_jit(params, init)
        fill = jnp.asarray(0, jnp.int32)
        x_bar_next, p_next = self._advance_prior(x_bar, p, res,
                                                 y_buf, u_buf, fill)
        return MHEState(y_buf=y_buf, u_buf=u_buf, x_bar=x_bar_next,
                        p=p_next, fill=fill, solver=res.state)

    def _step(self, state: MHEState, y_new, u_applied):
        """Advance one measurement step: ``u_applied`` was applied since the
        previous measurement, ``y_new`` observed now.  Returns the updated
        state and the current-state estimate ``x_hat``."""
        y_buf = jnp.concatenate([state.y_buf[1:], y_new[None]], axis=0)
        u_buf = jnp.concatenate([state.u_buf[1:], u_applied[None]], axis=0)
        p_inv = (jnp.linalg.inv(state.p) if self.arrival_update else None)
        params = self._params(state.x_bar, u_buf, y_buf, p_inv=p_inv)
        warm = al_sqp.shift_state(state.solver, state.x_bar)
        res = self._solve(params, warm)
        x_bar_next, p_next = self._advance_prior(state.x_bar, state.p, res,
                                                 y_buf, u_buf, state.fill)
        new = MHEState(y_buf=y_buf, u_buf=u_buf, x_bar=x_bar_next,
                       p=p_next, fill=jnp.maximum(state.fill - 1, 0),
                       solver=res.state)
        return new, (res.state.x[-1], res)

    def _advance_prior(self, x_bar, p, res, y_buf, u_buf, fill):
        """Prior (mean, covariance) for the NEXT window's start state, given
        this window's solve ``res`` over buffers ``(y_buf, u_buf)`` whose
        start state carried prior ``(x_bar, p)``.  ``fill`` > 0 means the
        departing buffer entry is synthetic (init_filter's repeated-y0
        transient): conditioning on it would count the first measurement
        multiple times, so the fixed-prior advance is used until the
        window holds only real data."""
        # fixed-prior policy: the smoothed estimate of the next window's
        # start state (NLP state index 2), covariance untouched
        if not self.arrival_update:
            return res.state.x[2], p
        # EKF recursion on the departing information [module docstring]:
        # condition the prior on this window's FIRST measurement (the one
        # that leaves the window next step), then predict through the
        # dynamics.  Prior mean rides the same recursion so it summarizes
        # exactly y_{<= window start} — on linear-Gaussian problems the
        # short-window filter equals the Kalman filter.
        x_anchor = res.state.x[1]         # smoothed start (jacobian anchor)
        c_jac = jax.jacfwd(self.h)(x_anchor)
        s = c_jac @ p @ c_jac.T + self._r_mat
        k_gain = jnp.linalg.solve(s, c_jac @ p).T            # P C' S^-1
        x_filt = x_bar + k_gain @ (y_buf[0] - self.h(x_bar))
        p_filt = p - k_gain @ s @ k_gain.T
        u_dep = u_buf[0]                  # input window-start -> next state
        a_jac = jax.jacfwd(
            lambda xx: self._mean_dynamics(xx, u_dep))(x_anchor)
        x_bar_next = self._mean_dynamics(x_filt, u_dep)
        p_next = a_jac @ p_filt @ a_jac.T + self._q_mat
        p_next = 0.5 * (p_next + p_next.T)
        in_fill = fill > 0
        return (jnp.where(in_fill, res.state.x[2], x_bar_next),
                jnp.where(in_fill, p, p_next))

    def step(self, state: MHEState, y_new, u_applied):
        y_new = jnp.asarray(y_new, self.dtype)
        u_applied = jnp.asarray(u_applied, self.dtype)
        new, (x_hat, res) = self._step_jit(state, y_new, u_applied)
        return new, x_hat

    def _run(self, state: MHEState, ys, us_prev):
        def body(s, yu):
            y, u = yu
            s, (x_hat, res) = self._step(s, y, u)
            return s, (x_hat, res.converged)

        final, (x_hats, conv) = jax.lax.scan(body, state, (ys, us_prev))
        return final, x_hats, conv

    def run(self, x_bar, ys, us):
        """Filter a whole record as ONE fused program (lax.scan over
        measurement steps — same zero-host-round-trip structure as the
        controller's closed loop).

        ``ys (T, Nm)`` measurements, ``us (T-1, Nu)`` inputs applied between
        them, ``x_bar`` prior on the initial state.  Returns estimates
        ``(T, Nx)`` where entry k uses measurements up to and including
        ``y_k`` (filtering, not smoothing).
        """
        ys = jnp.asarray(ys, self.dtype)
        us = jnp.asarray(us, self.dtype)
        t_total = ys.shape[0]
        if us.shape[0] != t_total - 1:
            raise ValueError(f"us must be ({t_total - 1}, {self.Nu}), "
                             f"got {us.shape}")
        state = self.init_filter(x_bar, ys[0])
        us_prev = jnp.concatenate(
            [jnp.zeros((1, self.Nu), self.dtype), us], axis=0)
        _, x_hats, conv = self._run_jit(state, ys, us_prev)
        self.last_converged = np.asarray(conv)
        return x_hats
