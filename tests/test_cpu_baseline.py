"""Regression guard for the reference-architecture CPU baseline harness.

`benchmarks/cpu_baseline.py` is the measured stand-in for the CasADi/IPOPT
baseline (SURVEY §6 — not installable here): a Python receding loop calling
native SLSQP with jitted XLA-CPU AD callbacks on the SAME NLP our solver
solves.  The headline numbers live in `benchmarks/cpu_baseline.json`; this
test keeps the harness itself honest on a tiny instance — the NLP must be
solved to feasibility and its one-step cost must agree with our AL-SQP
controller on the identical problem.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "benchmarks"))

import cpu_baseline as cb  # noqa: E402
import pytest

# SLSQP receding loops + closed-loop MPC compiles (~1-4 min).
pytestmark = pytest.mark.slow


def test_slsqp_baseline_solves_same_nlp():
    nt, n_steps = 8, 2
    model, gp, dt, nt, n_steps = cb.build_problem(nt, n_steps, n_train=40)

    # --- the baseline's NLP machinery: feasible + in-bounds solution ---
    f, g, gj, lb, ub, split, n_w = cb.make_nlp(gp, nt)
    xs_b, us_b, times, nit = cb.run_slsqp_loop(model, gp, nt, n_steps)
    assert xs_b.shape == (n_steps + 1, 4) and us_b.shape == (n_steps, 2)
    assert np.all(np.isfinite(xs_b)) and np.all(np.isfinite(times))
    assert np.all(us_b >= cb.ULB - 1e-8) and np.all(us_b <= cb.UUB + 1e-8)
    cost_b = cb.closed_loop_cost(xs_b, us_b, cb.XSP)

    # --- our controller on the identical instance ---
    from gpmpc_tpu import MPC
    mpc = MPC(horizon=nt * dt, model=model, gp=gp, gp_method="ME",
              discrete_method="gp", Q=cb.Q_W, R=cb.R_W,
              ulb=cb.ULB, uub=cb.UUB, xlb=cb.XLB, xub=cb.XUB,
              feedback=False, cov_updates=1, dtype=jnp.float64,
              solver_opts=dict(al_iters=4, max_iters=20))
    xs_o, us_o = mpc.solve(jnp.asarray(cb.X0), n_steps * dt,
                           jnp.asarray(cb.XSP), noise=False)
    cost_o = cb.closed_loop_cost(np.asarray(xs_o), np.asarray(us_o), cb.XSP)

    # both solve the same NLP to convergence -> realized costs must agree
    assert abs(cost_o / cost_b - 1.0) < 0.01, (cost_o, cost_b)


# ------------------------------------------------------- trajectory parity
#
# The BASELINE "<= 1e-6 trajectory error vs reference" bar cannot be tested
# literally on this machine (the reference mount is empty — SURVEY
# provenance warning); the strongest available statement is CLOSED-LOOP
# STATE TRAJECTORY agreement with an INDEPENDENT solver (native SLSQP) on
# the same x64 NLP, with matched warm-start logic (VERDICT r2 item 3).

def _trajectory_case(gp_method, percentile, tol):
    import jax

    nt, n_steps = 8, 4
    model, gp, dt, nt, n_steps = cb.build_problem(nt, n_steps, n_train=40)
    xs_b, us_b, _, _ = cb.run_slsqp_loop(model, gp, nt, n_steps,
                                         percentile=percentile)

    from gpmpc_tpu import MPC
    mpc = MPC(horizon=nt * dt, model=model, gp=gp, gp_method=gp_method,
              discrete_method="gp", Q=cb.Q_W, R=cb.R_W,
              ulb=cb.ULB, uub=cb.UUB, xlb=cb.XLB, xub=cb.XUB,
              percentile=percentile, feedback=False, cov_updates=1,
              dtype=jnp.float64,
              solver_opts=dict(al_iters=6, max_iters=25))
    xs_o, us_o = mpc.solve(jnp.asarray(cb.X0), n_steps * dt,
                           jnp.asarray(cb.XSP), noise=False)
    # both sides must have SOLVED their NLPs for the comparison to mean
    # anything: gate on feasibility (defect/violation; the binary
    # `converged` flag also demands a 1e-5 KKT stat that the step-norm
    # stopping rule legitimately leaves behind on easy steps)
    assert float(np.max(mpc.last_run["defect"])) < 1e-8
    assert float(np.max(mpc.last_run["con_viol"])) < 1e-6
    err_x = float(np.max(np.abs(np.asarray(xs_o) - xs_b)))
    err_u = float(np.max(np.abs(np.asarray(us_o) - us_b)))
    assert err_x < tol, f"state trajectory deviates: {err_x}"
    assert err_u < 10 * tol, f"input trajectory deviates: {err_u}"


def test_trajectory_parity_me():
    """Config 2 (ME, box constraints): closed-loop states from the two
    independent solvers on the identical x64 NLP must agree."""
    _trajectory_case("ME", None, tol=1e-4)


def test_trajectory_parity_ta_tightened():
    """Config 3 (TA + chance tightening): the SLSQP loop gets the same
    zero-order tightened bounds; trajectories must still agree."""
    _trajectory_case("TA", 0.95, tol=1e-3)
