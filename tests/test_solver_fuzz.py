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
