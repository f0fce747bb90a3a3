"""Fuzz the AL-SQP on random box-constrained tracking problems vs SLSQP.

Robustness evidence for SURVEY §7 hard part #1 ("SQP robustness replacing
IPOPT"): across random dynamics/costs/bounds the solver must match scipy's
objective to tight tolerance and never violate bounds."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import minimize

from gpmpc_tpu.solvers.al_sqp import TrajectoryProblem, init_state, solve
from gpmpc_tpu.utils.config import SQPConfig
import pytest

# fuzz sweeps solve hundreds of random NLPs (~1 min each).
pytestmark = pytest.mark.slow


def _run_case(seed, parallel_kkt):
    rng = np.random.default_rng(seed)
    nx = rng.integers(2, 5)
    nu = rng.integers(1, 3)
    nt = int(rng.integers(5, 12))
    a = rng.standard_normal((nx, nx))
    a = 0.95 * a / max(1.0, np.max(np.abs(np.linalg.eigvals(a))))
    b = rng.standard_normal((nx, nu)) * 0.5
    qd = rng.uniform(0.1, 2.0, nx)
    rd = rng.uniform(0.05, 0.5, nu)
    x_ref = rng.standard_normal(nx)
    umax = rng.uniform(0.3, 1.5)
    x0 = rng.standard_normal(nx) * 0.5

    aj, bj = jnp.asarray(a), jnp.asarray(b)
    qj, rj = jnp.asarray(np.diag(qd)), jnp.asarray(np.diag(rd))
    xrj = jnp.asarray(x_ref)

    def dynamics(x, u, t, params):
        return aj @ x + bj @ u

    def stage_cost(x, u, t, params):
        e = x - xrj
        return 0.5 * e @ qj @ e + 0.5 * u @ rj @ u

    def terminal_cost(x, params):
        e = x - xrj
        return 2.0 * (e @ qj @ e)

    def stage_ineq(x, u, t, params):
        return jnp.concatenate([u - umax, -u - umax])

    prob = TrajectoryProblem(nx=int(nx), nu=int(nu), horizon=nt,
                             dynamics=dynamics, stage_cost=stage_cost,
                             terminal_cost=terminal_cost,
                             stage_ineq=stage_ineq, n_ineq=2 * int(nu))
    cfg = SQPConfig(parallel_kkt=parallel_kkt)
    res = solve(prob, None, init_state(prob, jnp.asarray(x0), params=None),
                cfg)
    u_sol = np.asarray(res.state.u)
    assert float(res.defect) < 1e-6, f"seed {seed}: defect {res.defect}"
    assert np.max(np.abs(u_sol)) <= umax + 1e-5, f"seed {seed}: bound"

    # scipy reference on the condensed problem
    def obj(z):
        u = z.reshape(nt, nu)
        x = x0.copy()
        cst = 0.0
        for t in range(nt):
            e = x - x_ref
            cst += 0.5 * e @ np.diag(qd) @ e + 0.5 * u[t] @ np.diag(rd) @ u[t]
            x = a @ x + b @ u[t]
        e = x - x_ref
        return cst + 2.0 * e @ np.diag(qd) @ e

    ref = minimize(obj, np.zeros(nt * nu), method="SLSQP",
                   bounds=[(-umax, umax)] * (nt * nu),
                   options={"maxiter": 500, "ftol": 1e-14})
    assert float(res.obj) <= ref.fun + 1e-5, (
        f"seed {seed}: obj {float(res.obj)} vs scipy {ref.fun}")


def test_fuzz_sequential_kkt():
    for seed in range(8):
        _run_case(seed, parallel_kkt=False)


def test_fuzz_parallel_kkt():
    for seed in range(8, 14):
        _run_case(seed, parallel_kkt=True)


def _run_general_case(seed, fused_kkt=False):
    """Randomized GENERAL constraint surface (VERDICT r3 #8): input box +
    random stage halfspaces on the state + a terminal-ball inequality, vs
    SLSQP on the condensed problem.  The instance is convex (stable linear
    dynamics, convex cost, affine/ball constraints), so both solvers must
    find the same optimum.  With ``fused_kkt=True`` the case exercises the
    single-launch Pallas KKT backend through the interpreter (f32)."""
    rng = np.random.default_rng(seed)
    dtype = jnp.float32 if fused_kkt else jnp.float64
    nx = int(rng.integers(2, 5))
    nu = int(rng.integers(1, 3))
    nt = int(rng.integers(5, 10))
    n_half = int(rng.integers(1, 4))
    a = rng.standard_normal((nx, nx))
    a = 0.9 * a / max(1.0, np.max(np.abs(np.linalg.eigvals(a))))
    b = rng.standard_normal((nx, nu)) * 0.5
    qd = rng.uniform(0.1, 2.0, nx)
    rd = rng.uniform(0.05, 0.5, nu)
    x_ref = rng.standard_normal(nx) * 0.7
    umax = rng.uniform(0.5, 1.5)
    x0 = rng.standard_normal(nx) * 0.5

    def rollout(u_flat):
        u = u_flat.reshape(nt, nu)
        xs = [x0]
        for t in range(nt):
            xs.append(a @ xs[-1] + b @ u[t])
        return np.stack(xs), u

    # halfspaces g'x <= h, DYNAMICALLY feasible by construction: h clears
    # the zero-input rollout (so u=0 satisfies every stage) and x_ref,
    # with a small margin so the optimum often rides the boundary.
    # (Margins over x0/x_ref alone are not enough: bounded inputs cannot
    # always stop the free dynamics from crossing an arbitrary halfspace —
    # seed 33 produced such an infeasible instance.)
    g = rng.standard_normal((n_half, nx))
    x_free = rollout(np.zeros(nt * nu))[0]
    h = (np.maximum((x_free @ g.T).max(axis=0), g @ x_ref)
         + rng.uniform(0.05, 0.6, n_half))

    def obj_np(u_flat):
        xs, u = rollout(u_flat)
        e = xs - x_ref
        return float(0.5 * np.einsum("ti,i,ti->", e[:-1], qd, e[:-1])
                     + 0.5 * np.einsum("ti,i,ti->", u, rd, u)
                     + 2.0 * e[-1] @ np.diag(qd) @ e[-1])

    # terminal ball sized from the halfspace-constrained optimum so it is
    # (a) almost surely feasible and (b) usually ACTIVE
    cons = [dict(type="ineq",
                 fun=lambda z: (h[None, :]
                                - rollout(z)[0][1:] @ g.T).reshape(-1))]
    pre = minimize(obj_np, np.zeros(nt * nu), method="SLSQP",
                   bounds=[(-umax, umax)] * (nt * nu), constraints=cons,
                   options={"maxiter": 500, "ftol": 1e-14})
    if not pre.success:
        return False          # scipy could not provide a reference
    d_pre = np.linalg.norm(rollout(pre.x)[0][-1] - x_ref)
    # plain float: an np.float64 scalar is a STRONG type that would
    # silently promote the f32 fused-KKT problem's constraints to f64
    r2 = float(max((1.05 * d_pre) ** 2, 1e-3))   # feasible, near-active

    cons.append(dict(
        type="ineq",
        fun=lambda z: np.array([r2 - np.sum((rollout(z)[0][-1] - x_ref) ** 2)])))
    ref = minimize(obj_np, pre.x, method="SLSQP",
                   bounds=[(-umax, umax)] * (nt * nu), constraints=cons,
                   options={"maxiter": 500, "ftol": 1e-14})
    if not ref.success:
        return False          # scipy could not provide a reference
    xs_ref = rollout(ref.x)[0]
    if ((xs_ref[1:] @ g.T - h[None, :]).max() > 1e-8
            or np.sum((xs_ref[-1] - x_ref) ** 2) > r2 + 1e-8):
        return False          # scipy "success" on an infeasible iterate

    aj = jnp.asarray(a, dtype)
    bj = jnp.asarray(b, dtype)
    qj = jnp.asarray(np.diag(qd), dtype)
    rj = jnp.asarray(np.diag(rd), dtype)
    xrj = jnp.asarray(x_ref, dtype)
    gj, hj = jnp.asarray(g, dtype), jnp.asarray(h, dtype)

    prob = TrajectoryProblem(
        nx=nx, nu=nu, horizon=nt,
        dynamics=lambda x, u, t, p: aj @ x + bj @ u,
        stage_cost=lambda x, u, t, p: (0.5 * (x - xrj) @ qj @ (x - xrj)
                                       + 0.5 * u @ rj @ u),
        terminal_cost=lambda x, p: 2.0 * ((x - xrj) @ qj @ (x - xrj)),
        stage_ineq=lambda x, u, t, p: jnp.concatenate(
            [u - umax, -u - umax, gj @ x - hj]),
        n_ineq=2 * nu + n_half,
        terminal_ineq=lambda x, p: jnp.array(
            [jnp.sum((x - xrj) ** 2) - r2]),
        n_term_ineq=1)
    cfg = SQPConfig(fused_kkt=fused_kkt)
    res = solve(prob, None,
                init_state(prob, jnp.asarray(x0, dtype), params=None), cfg)

    # f32 through the Pallas interpreter earns looser tolerances
    tol_feas = 5e-4 if fused_kkt else 1e-5
    tol_obj = 1e-3 * (1.0 + abs(ref.fun)) if fused_kkt else 1e-5
    xs = np.asarray(res.state.x, np.float64)
    us = np.asarray(res.state.u, np.float64)
    assert float(res.defect) < (1e-4 if fused_kkt else 1e-6), \
        f"seed {seed}: defect {float(res.defect)}"
    assert np.max(np.abs(us)) <= umax + tol_feas, f"seed {seed}: u bound"
    viol_half = np.max(xs[1:] @ g.T - h[None, :])
    assert viol_half <= tol_feas, f"seed {seed}: halfspace viol {viol_half}"
    viol_term = np.sum((xs[-1] - x_ref) ** 2) - r2
    assert viol_term <= 10 * tol_feas, f"seed {seed}: terminal {viol_term}"
    assert float(res.obj) <= ref.fun + tol_obj, (
        f"seed {seed}: obj {float(res.obj)} vs scipy {ref.fun}")
    return True


def test_fuzz_general_constraints():
    # SLSQP occasionally fails its own solve on a random instance; those
    # seeds carry no reference and are dropped, but a MINIMUM number of
    # compared cases keeps the test honest
    done = sum(_run_general_case(seed) for seed in range(20, 30))
    assert done >= 6, f"only {done} general-constraint cases had references"


def test_fuzz_general_constraints_fused_kkt_interpret():
    done = sum(_run_general_case(seed, fused_kkt=True)
               for seed in range(30, 36))
    assert done >= 3, f"only {done} fused-KKT cases had references"
