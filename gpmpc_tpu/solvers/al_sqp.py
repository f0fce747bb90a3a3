"""Augmented-Lagrangian SQP for multiple-shooting trajectory NLPs.

The from-scratch replacement for the reference's ``casadi.nlpsol('ipopt')``
[SURVEY C6, §2.2, §3.4].  Where IPOPT is a general sparse interior-point
code called through thousands of Python->C++ callbacks per solve, this
solver exploits the fixed stage structure of the MPC NLP end-to-end on
device:

* transcription: multiple shooting — decision variables are the state
  trajectory X (Nt+1, Nx) and inputs U (Nt, Nu); dynamics enter as defect
  equality constraints closed by Gauss-Newton steps.
* inequality constraints (box bounds, tightened chance constraints, user
  obstacle constraints) enter through a PHR augmented Lagrangian, so every
  inner iteration has fixed structure and cost — jit/scan friendly, bounded
  iteration semantics [SURVEY §7 hard part #1].
* each inner step linearizes the dynamics (``jax.jacfwd``, vmapped over
  stages), takes exact Hessians of the stage-separable AL objective
  (``jax.hessian``, vmapped — stage dims are tiny), and solves the resulting
  block-banded KKT system with the Riccati sweep in
  :mod:`gpmpc_tpu.solvers.riccati`.
* globalization: backtracking line search on an L1 merit function with
  Levenberg regularization adaptation; failure falls back to shrinking the
  step, never to host control flow.

The solver is a pure function: ``solve(problem, params, init) -> result``,
usable under ``jit``/``vmap``/``scan`` (the whole receding-horizon closed
loop jits as one program [SURVEY §3.4 'the rebuild fuses this']).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gpmpc_tpu.solvers import riccati
from gpmpc_tpu.utils.config import SQPConfig


@dataclasses.dataclass(frozen=True)
class TrajectoryProblem:
    """Static description of a trajectory NLP (closed over by jit).

    Functions (all pure JAX, ``t`` is a traced scalar index, ``params`` an
    arbitrary pytree of runtime data — reference analog: the NLP parameter
    vector packed per solve [SURVEY §3.4]):

    * ``dynamics(x, u, t, params) -> x_next``
    * ``stage_cost(x, u, t, params) -> scalar``
    * ``terminal_cost(x, params) -> scalar``
    * ``stage_ineq(x, u, t, params) -> (n_ineq,)``  with convention g <= 0
    * ``terminal_ineq(x, params) -> (n_term_ineq,)``
    """

    nx: int
    nu: int
    horizon: int
    dynamics: Callable
    stage_cost: Callable
    terminal_cost: Callable
    stage_ineq: Optional[Callable] = None
    terminal_ineq: Optional[Callable] = None
    n_ineq: int = 0
    n_term_ineq: int = 0
    # Optional safeguard box for input iterates: candidate U is projected
    # into [lo, hi] = u_guard(params) before evaluation.  Set this slightly
    # wider than the physical input bounds; it keeps Gauss-Newton steps from
    # evaluating the dynamics at absurd inputs (e.g. tan(steering) wrapping
    # past pi/2) when warm-start defects are large.  A minimizer satisfying
    # the actual bound constraints is unaffected.  A callable over ``params``
    # (not stored arrays) so the bounds ride the runtime-argument path —
    # closed-over array constants cost ~25 ms/call on this TPU backend.
    u_guard: Optional[Callable] = None


class SolverState(NamedTuple):
    """Warm-startable solver state (carried across receding-horizon steps)."""

    x: jnp.ndarray        # (Nt+1, Nx)
    u: jnp.ndarray        # (Nt, Nu)
    lam: jnp.ndarray      # (Nt, n_ineq) AL multipliers, >= 0
    lam_term: jnp.ndarray  # (n_term_ineq,)


class SolveResult(NamedTuple):
    state: SolverState
    obj: jnp.ndarray          # objective at solution (without AL terms)
    con_viol: jnp.ndarray     # max inequality violation
    defect: jnp.ndarray       # max dynamics defect
    stat: jnp.ndarray         # relative KKT dual infeasibility (see _kkt_stat)
    iters: jnp.ndarray        # inner iterations used
    converged: jnp.ndarray    # defect/viol <= tol_con (rel) AND stat <= tol_kkt


def init_state(prob: TrajectoryProblem, x0: jnp.ndarray,
               u_init: Optional[jnp.ndarray] = None,
               params: Any = None) -> SolverState:
    """Initial guess: roll the dynamics out from x0 under u_init."""
    nt = prob.horizon
    dtype = x0.dtype
    if u_init is None:
        u_init = jnp.zeros((nt, prob.nu), dtype)

    def step(x, tu):
        t, u = tu
        xn = prob.dynamics(x, u, t, params)
        return xn, xn

    _, xs = jax.lax.scan(step, x0, (jnp.arange(nt), u_init))
    x = jnp.concatenate([x0[None], xs], axis=0)
    return SolverState(
        x=x, u=u_init,
        lam=jnp.zeros((nt, prob.n_ineq), dtype),
        lam_term=jnp.zeros((prob.n_term_ineq,), dtype))


def shift_state(state: SolverState, x0_new: jnp.ndarray) -> SolverState:
    """Receding-horizon warm start: shift the previous solution one stage
    [SURVEY §3.4 'warm start: shift previous (X*, U*)']."""
    x = jnp.concatenate([x0_new[None], state.x[2:], state.x[-1:]], axis=0)
    u = jnp.concatenate([state.u[1:], state.u[-1:]], axis=0)
    lam = jnp.concatenate([state.lam[1:], state.lam[-1:]], axis=0)
    return SolverState(x=x, u=u, lam=lam, lam_term=state.lam_term)


def _al_stage_cost(prob: TrajectoryProblem, x, u, t, params, lam_t, mu):
    """Stage cost + PHR augmented-Lagrangian penalty for g(x,u,t) <= 0."""
    c = prob.stage_cost(x, u, t, params)
    if prob.n_ineq:
        g = prob.stage_ineq(x, u, t, params)
        act = jnp.maximum(0.0, lam_t + mu * g)
        c = c + (0.5 / mu) * jnp.sum(act * act - lam_t * lam_t)
    return c


def _al_term_cost(prob: TrajectoryProblem, x, params, lam_term, mu):
    c = prob.terminal_cost(x, params)
    if prob.n_term_ineq:
        g = prob.terminal_ineq(x, params)
        act = jnp.maximum(0.0, lam_term + mu * g)
        c = c + (0.5 / mu) * jnp.sum(act * act - lam_term * lam_term)
    return c


def _merit(prob, state, params, mu, nu_pen, w_viol=0.0):
    """L1 merit: AL objective + nu * ||defects||_1 (+ optional exact-penalty
    term ``w_viol * ||max(0, g)||_1`` on the inequality violations).

    The AL terms already price violations, but their weight scales with the
    CURRENT penalty mu — in the early outer rounds of a small-``al_iters``
    budget a step that cuts through a constraint can still look cheap.  A
    static ``w_viol > 0`` (``SQPConfig.merit_viol``) makes the line search
    violation-aware independent of the mu schedule.
    """
    nt = prob.horizon
    ts = jnp.arange(nt)
    stage = jax.vmap(
        lambda x, u, t, lam_t: _al_stage_cost(prob, x, u, t, params, lam_t, mu)
    )(state.x[:-1], state.u, ts, state.lam)
    term = _al_term_cost(prob, state.x[-1], params, state.lam_term, mu)
    f_next = jax.vmap(lambda x, u, t: prob.dynamics(x, u, t, params))(
        state.x[:-1], state.u, ts)
    defects = f_next - state.x[1:]
    m = jnp.sum(stage) + term + nu_pen * jnp.sum(jnp.abs(defects))
    if w_viol and prob.n_ineq:
        g = jax.vmap(lambda x, u, t: prob.stage_ineq(x, u, t, params))(
            state.x[:-1], state.u, ts)
        m = m + w_viol * jnp.sum(jnp.maximum(g, 0.0))
    if w_viol and prob.n_term_ineq:
        gt = prob.terminal_ineq(state.x[-1], params)
        m = m + w_viol * jnp.sum(jnp.maximum(gt, 0.0))
    return m, defects


def _build_qp(prob, state, params, mu, reg_state):
    """Linearize dynamics + second-order expand the AL objective per stage."""
    nt = prob.horizon
    ts = jnp.arange(nt)

    def stage_data(x, u, t, lam_t):
        a = jax.jacfwd(lambda xx: prob.dynamics(xx, u, t, params))(x)
        b = jax.jacfwd(lambda uu: prob.dynamics(x, uu, t, params))(u)

        def cost_xu(xu):
            return _al_stage_cost(prob, xu[:prob.nx], xu[prob.nx:], t,
                                  params, lam_t, mu)

        xu = jnp.concatenate([x, u])
        grad = jax.grad(cost_xu)(xu)
        hess = jax.hessian(cost_xu)(xu)
        return a, b, grad, hess

    a, b, grad, hess = jax.vmap(stage_data)(state.x[:-1], state.u, ts,
                                            state.lam)
    f_next = jax.vmap(lambda x, u, t: prob.dynamics(x, u, t, params))(
        state.x[:-1], state.u, ts)
    defects = f_next - state.x[1:]

    nx = prob.nx
    eye_x = jnp.eye(nx, dtype=state.x.dtype)
    q_xx = hess[:, :nx, :nx] + reg_state * eye_x[None]
    q_uu = hess[:, nx:, nx:]
    q_xu = hess[:, :nx, nx:]
    q_x = grad[:, :nx]
    q_u = grad[:, nx:]

    def term_fn(x):
        return _al_term_cost(prob, x, params, state.lam_term, mu)

    qf_x = jax.grad(term_fn)(state.x[-1])
    qf_xx = jax.hessian(term_fn)(state.x[-1]) + reg_state * eye_x

    return riccati.StageQP(a=a, b=b, c=defects, q_xx=q_xx, q_uu=q_uu,
                           q_xu=q_xu, q_x=q_x, q_u=q_u,
                           qf_xx=qf_xx, qf_x=qf_x), defects


def _constraint_violation(prob, state, params):
    nt = prob.horizon
    viol = jnp.zeros((), state.x.dtype)
    if prob.n_ineq:
        g = jax.vmap(lambda x, u, t: prob.stage_ineq(x, u, t, params))(
            state.x[:-1], state.u, jnp.arange(nt))
        viol = jnp.maximum(viol, jnp.max(jnp.maximum(g, 0.0)))
    if prob.n_term_ineq:
        gt = prob.terminal_ineq(state.x[-1], params)
        viol = jnp.maximum(viol, jnp.max(jnp.maximum(gt, 0.0)))
    return viol


def _kkt_stat(prob, state, params, mu):
    """Relative KKT dual infeasibility of the AL problem at ``state``.

    A costate backward pass gives the multipliers of the dynamics equality
    constraints; stationarity w.r.t. x then holds by construction and the
    residual lives in the input gradient g_u = dc/du + B' p_{t+1}.  Returned
    scaled by the costate magnitude (the natural size of the cost gradients),
    so the measure is dimensionless: ~1 far from a solution, ~0 at one.
    Replaces the round-1 placeholder ``stat=0.0`` (the reference's IPOPT
    reports the analogous scaled dual infeasibility [SURVEY §2.2]).
    """
    nt = prob.horizon
    ts = jnp.arange(nt)

    def stage_grads(x, u, t, lam_t):
        a = jax.jacfwd(lambda xx: prob.dynamics(xx, u, t, params))(x)
        b = jax.jacfwd(lambda uu: prob.dynamics(x, uu, t, params))(u)
        gx = jax.grad(
            lambda xx: _al_stage_cost(prob, xx, u, t, params, lam_t, mu))(x)
        gu = jax.grad(
            lambda uu: _al_stage_cost(prob, x, uu, t, params, lam_t, mu))(u)
        return a, b, gx, gu

    a, b, gx, gu = jax.vmap(stage_grads)(state.x[:-1], state.u, ts, state.lam)
    p_term = jax.grad(
        lambda x: _al_term_cost(prob, x, params, state.lam_term, mu))(
            state.x[-1])

    def back(p_next, stage):
        a_t, gx_t = stage
        return gx_t + a_t.T @ p_next, p_next

    _, p_next_all = jax.lax.scan(back, p_term, (a, gx), reverse=True)
    g_u = gu + jnp.einsum("tij,ti->tj", b, p_next_all)
    scale = 1.0 + jnp.max(jnp.abs(p_next_all))
    return jnp.max(jnp.abs(g_u)) / scale


def solve(prob: TrajectoryProblem, params: Any, init: SolverState,
          cfg: SQPConfig = SQPConfig()) -> SolveResult:
    """Solve the trajectory NLP from a warm start.  Pure function, jittable.

    Outer loop: AL multiplier/penalty updates (fixed ``cfg.al_iters``).
    Inner loop: Gauss-Newton SQP steps via the Riccati KKT sweep with L1
    merit line search, under ``lax.while_loop`` with a shared iteration
    budget ``cfg.max_iters``.
    """
    dtype = init.x.dtype
    nu_pen = jnp.asarray(1e3, dtype)   # defect merit weight (adapted below)

    def inner_cond(carry):
        state, it, reg, done, _ = carry
        return (~done) & (it < cfg.max_iters)

    def inner_body_factory(mu):
        def inner_body(carry):
            state, it, reg, done, nu_p = carry
            qp, defects = _build_qp(prob, state, params, mu, reg)
            # per-horizon backend dispatch (measured policy — a fused_kkt
            # request at a long horizon degrades to the associative-scan
            # backend instead of compiling an Nt-unrolled Pallas kernel;
            # see riccati.KKTPolicy)
            kkt_solve = riccati.select_backend(
                prob.horizon, dtype, fused=cfg.fused_kkt,
                parallel=cfg.parallel_kkt)
            sol = kkt_solve(qp, jnp.zeros((prob.nx,), dtype), reg)

            # adapt the merit defect weight to dominate the costates
            nu_new = jnp.maximum(nu_p, 10.0 * jnp.max(jnp.abs(qp.q_x)))

            merit0, _ = _merit(prob, state, params, mu, nu_new,
                               cfg.merit_viol)

            def try_alpha(alpha):
                u_new = state.u + alpha * sol.du
                if prob.u_guard is not None:
                    g_lo, g_hi = prob.u_guard(params)
                    u_new = jnp.clip(u_new, g_lo, g_hi)
                cand = SolverState(x=state.x + alpha * sol.dx,
                                   u=u_new,
                                   lam=state.lam, lam_term=state.lam_term)
                m, _ = _merit(prob, cand, params, mu, nu_new,
                              cfg.merit_viol)
                return cand, m

            alphas = cfg.ls_beta ** jnp.arange(cfg.ls_steps, dtype=dtype)
            cands, merits = jax.vmap(try_alpha)(alphas)
            merits = jnp.where(jnp.isnan(merits), jnp.inf, merits)
            # sufficient decrease relative to predicted model decrease
            pred = jnp.maximum(sol.exp_dec + nu_new * jnp.sum(jnp.abs(defects)),
                               1e-16)
            ok_dec = merits <= merit0 - cfg.ls_c1 * alphas * pred
            any_ok = jnp.any(ok_dec) & sol.ok
            best = jnp.argmax(ok_dec)   # first True (argmax of bool)

            new_state = jax.tree.map(
                lambda c, s: jnp.where(any_ok, c[best], s), cands, state)
            reg_new = jnp.where(any_ok,
                                jnp.maximum(reg / cfg.reg_mult, cfg.reg_init),
                                jnp.minimum(reg * cfg.reg_mult, cfg.reg_max))

            step_norm = jnp.maximum(jnp.max(jnp.abs(sol.dx)),
                                    jnp.max(jnp.abs(sol.du)))
            scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(state.x)),
                                      jnp.max(jnp.abs(state.u)))
            small_step = step_norm <= cfg.tol_stat * scale
            stalled = (~any_ok) & (reg >= cfg.reg_max)
            done_new = small_step | stalled
            return (new_state, it + 1, reg_new, done_new, nu_new)

        return inner_body

    def outer_body(carry, _):
        state, mu, it_total, nu_p = carry
        inner_carry = (state, jnp.zeros((), jnp.int32),
                       jnp.asarray(cfg.reg_init, dtype),
                       jnp.asarray(False), nu_p)
        state, it, _, _, nu_p = jax.lax.while_loop(
            inner_cond, inner_body_factory(mu), inner_carry)

        # multiplier update: lam <- max(0, lam + mu g)
        lam_cap = 1e10  # keep multipliers finite under pathological iterates
        if prob.n_ineq:
            g = jax.vmap(lambda x, u, t: prob.stage_ineq(x, u, t, params))(
                state.x[:-1], state.u, jnp.arange(prob.horizon))
            lam = jnp.clip(state.lam + mu * g, 0.0, lam_cap)
        else:
            lam = state.lam
        if prob.n_term_ineq:
            gt = prob.terminal_ineq(state.x[-1], params)
            lam_term = jnp.clip(state.lam_term + mu * gt, 0.0, lam_cap)
        else:
            lam_term = state.lam_term
        state = SolverState(x=state.x, u=state.u, lam=lam, lam_term=lam_term)
        mu_new = jnp.minimum(mu * cfg.penalty_mult, cfg.penalty_max)
        return (state, mu_new, it_total + it, nu_p), None

    carry0 = (init, jnp.asarray(cfg.penalty_init, dtype),
              jnp.zeros((), jnp.int32), nu_pen)
    (state, mu, iters, _), _ = jax.lax.scan(outer_body, carry0, None,
                                            length=cfg.al_iters)

    # final diagnostics
    ts = jnp.arange(prob.horizon)
    obj = (jnp.sum(jax.vmap(
        lambda x, u, t: prob.stage_cost(x, u, t, params))(
            state.x[:-1], state.u, ts))
        + prob.terminal_cost(state.x[-1], params))
    f_next = jax.vmap(lambda x, u, t: prob.dynamics(x, u, t, params))(
        state.x[:-1], state.u, ts)
    defect = jnp.max(jnp.abs(f_next - state.x[1:]))
    viol = _constraint_violation(prob, state, params)
    stat = _kkt_stat(prob, state, params, mu)
    # feasibility is judged relative to the trajectory magnitude; the dual
    # infeasibility from _kkt_stat is already dimensionless
    scale_x = 1.0 + jnp.maximum(jnp.max(jnp.abs(state.x)),
                                jnp.max(jnp.abs(state.u)))
    converged = ((defect <= cfg.tol_con * scale_x)
                 & (viol <= cfg.tol_con * scale_x)
                 & (stat <= cfg.tol_kkt))
    return SolveResult(state=state, obj=obj, con_viol=viol, defect=defect,
                       stat=stat, iters=iters, converged=converged)
