"""Solver layer tests (SURVEY §4 'solver tests'): problems with known
solutions — LQR reduces to a single Riccati solve; box-constrained problems
are cross-checked against scipy SLSQP; KKT residuals at convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.linalg import solve_discrete_are
from scipy.optimize import minimize

from gpmpc_tpu.solvers import riccati
from gpmpc_tpu.solvers.al_sqp import (
    TrajectoryProblem, SolverState, init_state, shift_state, solve)
from gpmpc_tpu.utils.config import SQPConfig

RNG = np.random.default_rng(11)


def _random_stage_qp(nt=5, nx=3, nu=2):
    def spd(n, scale=1.0):
        a = RNG.standard_normal((n, n))
        return scale * (a @ a.T + n * np.eye(n))

    a = RNG.standard_normal((nt, nx, nx)) * 0.5
    b = RNG.standard_normal((nt, nx, nu)) * 0.5
    c = RNG.standard_normal((nt, nx)) * 0.1
    q_xx = np.stack([spd(nx) for _ in range(nt)])
    q_uu = np.stack([spd(nu) for _ in range(nt)])
    q_xu = RNG.standard_normal((nt, nx, nu)) * 0.1
    q_x = RNG.standard_normal((nt, nx))
    q_u = RNG.standard_normal((nt, nu))
    qf_xx = spd(nx)
    qf_x = RNG.standard_normal(nx)
    return riccati.StageQP(
        a=jnp.array(a), b=jnp.array(b), c=jnp.array(c),
        q_xx=jnp.array(q_xx), q_uu=jnp.array(q_uu), q_xu=jnp.array(q_xu),
        q_x=jnp.array(q_x), q_u=jnp.array(q_u),
        qf_xx=jnp.array(qf_xx), qf_x=jnp.array(qf_x))


def _qp_objective(qp, dx, du):
    nt = qp.a.shape[0]
    obj = 0.0
    for t in range(nt):
        obj += (0.5 * dx[t] @ np.asarray(qp.q_xx[t]) @ dx[t]
                + dx[t] @ np.asarray(qp.q_xu[t]) @ du[t]
                + 0.5 * du[t] @ np.asarray(qp.q_uu[t]) @ du[t]
                + np.asarray(qp.q_x[t]) @ dx[t] + np.asarray(qp.q_u[t]) @ du[t])
    obj += 0.5 * dx[nt] @ np.asarray(qp.qf_xx) @ dx[nt] + np.asarray(qp.qf_x) @ dx[nt]
    return obj


def test_riccati_solves_the_banded_kkt():
    """The Riccati sweep must reproduce the exact equality-constrained QP
    optimum: compare against scipy solving the condensed dense problem."""
    nt, nx, nu = 5, 3, 2
    qp = _random_stage_qp(nt, nx, nu)
    dx0 = np.zeros(nx)
    sol = riccati.solve(qp, jnp.array(dx0), 0.0)
    assert bool(sol.ok)

    # dense reference: optimize over du only; dx follows linear dynamics
    def unpack(z):
        du = z.reshape(nt, nu)
        dx = np.zeros((nt + 1, nx))
        dx[0] = dx0
        for t in range(nt):
            dx[t + 1] = (np.asarray(qp.a[t]) @ dx[t]
                         + np.asarray(qp.b[t]) @ du[t] + np.asarray(qp.c[t]))
        return dx, du

    res = minimize(lambda z: _qp_objective(qp, *unpack(z)),
                   np.zeros(nt * nu), method="BFGS",
                   options={"gtol": 1e-12, "maxiter": 500})
    du_ref = res.x.reshape(nt, nu)
    np.testing.assert_allclose(np.asarray(sol.du), du_ref, atol=1e-6)
    dx_ref, _ = unpack(res.x)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, atol=1e-6)


def test_lqr_gain_matches_dare():
    nx, nu = 4, 2
    a = RNG.standard_normal((nx, nx))
    a = 0.9 * a / np.max(np.abs(np.linalg.eigvals(a)))
    b = RNG.standard_normal((nx, nu))
    q = np.eye(nx)
    r = 2.0 * np.eye(nu)
    p = solve_discrete_are(a, b, q, r)
    k_ref = np.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
    k, ok = riccati.lqr_gain(jnp.array(a), jnp.array(b), jnp.array(q),
                             jnp.array(r), return_converged=True)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(k), k_ref, atol=1e-8)


def test_lqr_gain_reports_nonconvergence():
    """A tight iteration cap on a slowly-converging pair must be reported,
    not silently returned as a trusted gain (round-1 weakness: fixed 200
    iterations, no check)."""
    # marginally stabilizable: control barely couples into the second state
    a = np.array([[1.0, 1.0], [0.0, 1.0 - 1e-9]])
    b = np.array([[0.0], [1e-6]])
    q = np.eye(2)
    r = np.eye(1)
    _, ok = riccati.lqr_gain(jnp.array(a), jnp.array(b), jnp.array(q),
                             jnp.array(r), return_converged=True)
    assert not bool(ok)
    # a well-behaved pair converges well inside the default cap
    a2 = np.array([[0.9, 0.1], [0.0, 0.8]])
    b2 = np.array([[0.0], [1.0]])
    _, ok2 = riccati.lqr_gain(jnp.array(a2), jnp.array(b2), jnp.array(q),
                              jnp.array(r), return_converged=True)
    assert bool(ok2)


def _double_integrator_problem(nt=10, dt=0.1, umax=1.0, with_box=True):
    nx, nu = 2, 1
    a = np.array([[1.0, dt], [0.0, 1.0]])
    b = np.array([[0.5 * dt * dt], [dt]])
    q = np.diag([1.0, 0.1])
    r_cost = 0.01 * np.eye(nu)
    x_ref = np.array([1.0, 0.0])

    # constants follow the iterate's dtype so the same problem runs in
    # f64 (parity tests) or f32 (the fused Pallas KKT path, which rejects
    # f64 outright)
    def dynamics(x, u, t, params):
        return jnp.asarray(a, x.dtype) @ x + jnp.asarray(b, x.dtype) @ u

    def stage_cost(x, u, t, params):
        e = x - jnp.asarray(x_ref, x.dtype)
        return (0.5 * e @ jnp.asarray(q, x.dtype) @ e
                + 0.5 * u @ jnp.asarray(r_cost, x.dtype) @ u)

    def terminal_cost(x, params):
        e = x - jnp.asarray(x_ref, x.dtype)
        return 5.0 * e @ jnp.asarray(q, x.dtype) @ e

    if with_box:
        def stage_ineq(x, u, t, params):
            return jnp.concatenate([u - umax, -u - umax])
        n_ineq = 2
    else:
        stage_ineq, n_ineq = None, 0

    prob = TrajectoryProblem(nx=nx, nu=nu, horizon=nt, dynamics=dynamics,
                             stage_cost=stage_cost,
                             terminal_cost=terminal_cost,
                             stage_ineq=stage_ineq, n_ineq=n_ineq)
    return prob, a, b, q, r_cost, x_ref


def _scipy_reference(prob, a, b, q, r_cost, x_ref, x0, umax=None):
    nt, nu, nx = prob.horizon, prob.nu, prob.nx

    def rollout(z):
        u = z.reshape(nt, nu)
        x = np.zeros((nt + 1, nx))
        x[0] = x0
        for t in range(nt):
            x[t + 1] = a @ x[t] + b @ u[t]
        return x, u

    def obj(z):
        x, u = rollout(z)
        c = 0.0
        for t in range(nt):
            e = x[t] - x_ref
            c += 0.5 * e @ q @ e + 0.5 * u[t] @ r_cost @ u[t]
        e = x[nt] - x_ref
        c += 5.0 * e @ q @ e
        return c

    bounds = None if umax is None else [(-umax, umax)] * (nt * nu)
    res = minimize(obj, np.zeros(nt * nu), method="SLSQP", bounds=bounds,
                   options={"maxiter": 500, "ftol": 1e-14})
    return res.x.reshape(nt, nu), res.fun


def test_alsqp_unconstrained_matches_lqr_solution():
    prob, a, b, q, r_cost, x_ref = _double_integrator_problem(with_box=False)
    x0 = jnp.array([0.0, 0.0])
    init = init_state(prob, x0, params=None)
    res = solve(prob, None, init, SQPConfig())
    u_ref, obj_ref = _scipy_reference(prob, a, b, q, r_cost, x_ref,
                                      np.zeros(2))
    assert float(res.defect) < 1e-8
    np.testing.assert_allclose(np.asarray(res.state.u), u_ref, atol=1e-5)
    assert abs(float(res.obj) - obj_ref) < 1e-7


def test_alsqp_box_constrained_matches_slsqp():
    prob, a, b, q, r_cost, x_ref = _double_integrator_problem(umax=0.4)
    x0 = jnp.array([0.0, 0.0])
    init = init_state(prob, x0, params=None)
    res = solve(prob, None, init, SQPConfig())
    u = np.asarray(res.state.u)
    assert float(res.defect) < 1e-7
    assert np.max(np.abs(u)) <= 0.4 + 1e-6, "input bound violated"
    u_ref, obj_ref = _scipy_reference(prob, a, b, q, r_cost, x_ref,
                                      np.zeros(2), umax=0.4)
    # active-set problems: compare objective (controls may chatter at bound)
    assert float(res.obj) <= obj_ref + 1e-5
    np.testing.assert_allclose(u, u_ref, atol=1e-3)


@pytest.mark.slow
def test_alsqp_nonlinear_pendulum():
    """Nonlinear dynamics: damped pendulum swing toward upright with bounded
    torque; checks defect closure + bound feasibility + local optimality
    (no-improvement under random feasible perturbations)."""
    nt, dt = 20, 0.1
    umax = 8.0  # feasible direct swing-up (2.5 is under-actuated for this horizon)

    def f(x, u, t, params):
        th, w = x[0], x[1]
        dth = w
        dw = -9.81 * jnp.sin(th) - 0.3 * w + u[0]
        # RK2 midpoint for a stiffer test of GN linearization
        thm = th + 0.5 * dt * dth
        wm = w + 0.5 * dt * dw
        return jnp.stack([th + dt * wm,
                          w + dt * (-9.81 * jnp.sin(thm) - 0.3 * wm + u[0])])

    x_goal = jnp.array([np.pi, 0.0])

    def stage_cost(x, u, t, params):
        e = x - x_goal
        return 0.5 * (e @ jnp.diag(jnp.array([1.0, 0.1])) @ e) + 0.01 * u @ u

    def terminal_cost(x, params):
        e = x - x_goal
        return 10.0 * e @ e

    def stage_ineq(x, u, t, params):
        return jnp.concatenate([u - umax, -u - umax])

    prob = TrajectoryProblem(nx=2, nu=1, horizon=nt, dynamics=f,
                             stage_cost=stage_cost,
                             terminal_cost=terminal_cost,
                             stage_ineq=stage_ineq, n_ineq=2)
    x0 = jnp.array([0.0, 0.0])
    init = init_state(prob, x0, params=None)
    cfg = SQPConfig(max_iters=60, al_iters=5)
    res = solve(prob, None, init, cfg)
    assert float(res.defect) < 1e-6
    assert np.max(np.abs(np.asarray(res.state.u))) <= umax + 1e-5
    # the solve must actually swing up toward the goal
    final_err = float(jnp.linalg.norm(res.state.x[-1] - x_goal))
    assert final_err < 0.35, f"final error {final_err}"

    # local optimality: random feasible control perturbations don't improve
    def total_cost(u_seq):
        x = [x0]
        for t in range(nt):
            x.append(f(x[-1], u_seq[t], t, None))
        c = sum(float(stage_cost(x[t], u_seq[t], t, None)) for t in range(nt))
        return c + float(terminal_cost(x[-1], None))

    u_star = np.asarray(res.state.u)
    base = total_cost(jnp.array(u_star))
    for _ in range(5):
        pert = RNG.standard_normal(u_star.shape) * 0.01
        u_try = np.clip(u_star + pert, -umax, umax)
        assert total_cost(jnp.array(u_try)) >= base - 1e-4


def test_shift_state_warm_start():
    prob, *_ = _double_integrator_problem(with_box=False)
    x0 = jnp.array([0.0, 0.0])
    st = init_state(prob, x0, params=None)
    x0n = jnp.array([0.3, 0.1])
    sh = shift_state(st, x0n)
    assert sh.x.shape == st.x.shape and sh.u.shape == st.u.shape
    np.testing.assert_array_equal(np.asarray(sh.x[0]), np.asarray(x0n))


@pytest.mark.slow
def test_parallel_riccati_matches_sequential():
    """associative_scan Riccati == sequential sweep (SURVEY §2.3 SP-analog)."""
    for nt, nx, nu in [(5, 3, 2), (20, 4, 2), (7, 2, 1)]:
        qp = _random_stage_qp(nt, nx, nu)
        dx0 = RNG.standard_normal(nx) * 0.1
        seq = riccati.solve(qp, jnp.array(dx0), 1e-6)
        par = riccati.solve_parallel(qp, jnp.array(dx0), 1e-6)
        assert bool(par.ok)
        np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(par.dx), np.asarray(seq.dx),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(par.gain_k),
                                   np.asarray(seq.gain_k), atol=1e-7)
        np.testing.assert_allclose(float(par.exp_dec), float(seq.exp_dec),
                                   rtol=1e-8)


@pytest.mark.slow
def test_parallel_riccati_long_horizons():
    """associative-scan Riccati stays exact at long horizons (the regime it
    exists for: log-depth backward pass)."""
    for nt in (40, 80):
        qp = _random_stage_qp(nt, 4, 2)
        dx0 = jnp.zeros(4)
        seq = riccati.solve(qp, dx0, 1e-6)
        par = riccati.solve_parallel(qp, dx0, 1e-6)
        np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(par.dx), np.asarray(seq.dx),
                                   atol=1e-7)


@pytest.mark.slow
def test_converged_flag_uses_tolerances_and_kkt_stat():
    """`SolveResult.converged` must reflect the config tolerances and a real
    stationarity measure (round-1 weakness: hard-coded 1e-5 feasibility
    checks and stat=0.0 always)."""
    prob, a, b, q, r_cost, x_ref = _double_integrator_problem(umax=0.4)
    x0 = jnp.array([0.0, 0.0])
    init = init_state(prob, x0, params=None)

    res = solve(prob, None, init, SQPConfig())
    assert bool(res.converged), (float(res.defect), float(res.con_viol),
                                 float(res.stat))
    assert float(res.stat) < 1e-5

    # budget-starved from a cold start: must honestly report non-convergence
    starved = solve(prob, None, init, SQPConfig(max_iters=1, al_iters=1))
    assert not bool(starved.converged), (float(starved.defect),
                                         float(starved.con_viol),
                                         float(starved.stat))

    # tightening tol_kkt beyond reach flips the flag on the full solve
    res2 = solve(prob, None, init, SQPConfig(tol_kkt=1e-300))
    assert not bool(res2.converged)


def test_alsqp_fused_kkt_matches_default():
    """The single-launch Pallas KKT path (``fused_kkt=True``) reaches the
    same solution as the default sweep on the box-constrained problem.
    The kernel is f32 (and now REJECTS f64 outright), so the whole
    comparison runs in f32 and the bar is f32-grade."""
    prob, a, b, q, r_cost, x_ref = _double_integrator_problem(umax=0.4)
    x0 = jnp.array([0.0, 0.0], jnp.float32)
    init = init_state(prob, x0, params=None)
    ref = solve(prob, None, init, SQPConfig())
    fus = solve(prob, None, init, SQPConfig(fused_kkt=True))
    assert float(fus.defect) < 1e-5
    assert float(np.max(np.abs(np.asarray(fus.state.u)))) <= 0.4 + 1e-5
    np.testing.assert_allclose(np.asarray(fus.state.u),
                               np.asarray(ref.state.u), atol=2e-4)
    np.testing.assert_allclose(float(fus.obj), float(ref.obj),
                               rtol=1e-5, atol=1e-6)

    # a float64 problem must be rejected at trace time, not silently
    # downcast (ADVICE r2)
    init64 = init_state(prob, jnp.array([0.0, 0.0], jnp.float64),
                        params=None)
    with pytest.raises(ValueError, match="f32"):
        solve(prob, None, init64, SQPConfig(fused_kkt=True))


def test_kkt_backend_policy_dispatch():
    """Per-horizon backend selection (VERDICT r3 #3): fused requests are
    honored only up to the measured compile-time cap, long f32 horizons
    auto-upgrade to the associative scan, f64 stays sequential, and
    f64+fused is rejected rather than silently downcast."""
    p = riccati.get_kkt_policy()
    f32, f64 = jnp.float32, jnp.float64
    assert riccati.select_backend(20, f32, fused=True) is riccati.solve_fused
    assert (riccati.select_backend(p.fused_max_nt + 1, f32, fused=True)
            is riccati.solve_parallel)
    assert (riccati.select_backend(p.parallel_min_nt - 1, f32)
            is riccati.solve)
    assert (riccati.select_backend(p.parallel_min_nt, f32)
            is riccati.solve_parallel)
    # parity path: f64 never auto-switches reduction order
    assert riccati.select_backend(500, f64) is riccati.solve
    assert (riccati.select_backend(500, f64, parallel=True)
            is riccati.solve_parallel)
    with pytest.raises(ValueError, match="f32"):
        riccati.select_backend(20, f64, fused=True)


@pytest.mark.slow
def test_fused_kkt_request_at_long_horizon_does_not_unroll():
    """An AL-SQP solve with fused_kkt=True at a horizon past the policy cap
    must construct and solve via the associative-scan backend (no Nt-unrolled
    Pallas kernel build) and agree with the sequential sweep."""
    nt = riccati.get_kkt_policy().fused_max_nt + 50
    qp = _random_stage_qp(nt=nt, nx=3, nu=2)
    qp = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), qp)
    dx0 = jnp.zeros(3, jnp.float32)
    ref = riccati.solve(qp, dx0, 1e-6)
    got = riccati.select_backend(nt, jnp.float32, fused=True)(qp, dx0, 1e-6)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got.du), np.asarray(ref.du),
                               atol=5e-3, rtol=1e-2)


def test_merit_viol_consistent_and_default_off():
    """SQPConfig.merit_viol (round 5, violation-aware line search): the
    default 0 must reproduce the historical solver bitwise, and a positive
    weight must not change the CONVERGED solution of a well-posed
    box-constrained problem (the exact-penalty term vanishes at a feasible
    optimum) — it only re-weights which line-search candidates are
    accepted on the way there."""
    prob, a, b, q, r_cost, x_ref = _double_integrator_problem(umax=0.4)
    x0 = jnp.array([0.0, 0.0])
    init = init_state(prob, x0, params=None)
    res0 = solve(prob, None, init, SQPConfig())
    res_off = solve(prob, None, init, SQPConfig(merit_viol=0.0))
    np.testing.assert_array_equal(np.asarray(res0.state.u),
                                  np.asarray(res_off.state.u))
    res_on = solve(prob, None, init, SQPConfig(merit_viol=10.0))
    assert float(res_on.defect) < 1e-7
    assert float(res_on.con_viol) < 1e-5
    assert np.max(np.abs(np.asarray(res_on.state.u))) <= 0.4 + 1e-5
    # active-set problem: controls may chatter at the bound (same caveat
    # as the SLSQP cross-check above) — compare objectives.  The penalty
    # re-weights the candidate path, so the fixed-budget solve lands at a
    # marginally different near-optimum (measured 2.6e-4 relative here)
    np.testing.assert_allclose(float(res_on.obj), float(res0.obj),
                               rtol=1e-3)


def test_solver_presets_resolve_everywhere():
    """Named solver budgets (utils.config.SOLVER_PRESETS) are the measured
    round-5 operating points (RESULTS 'car feasibility by mechanism' /
    'across FRESH model fits') and must be accepted anywhere a
    solver_opts dict is."""
    from gpmpc_tpu.utils.config import (SOLVER_PRESETS, SQPConfig,
                                        resolve_solver_opts)

    assert resolve_solver_opts(None) == {}
    assert resolve_solver_opts({"al_iters": 9}) == {"al_iters": 9}
    for name, want in SOLVER_PRESETS.items():
        cfg = SQPConfig(**resolve_solver_opts(name))
        for k, v in want.items():
            assert getattr(cfg, k) == v, (name, k)
    assert resolve_solver_opts("rti")["merit_viol"] == 10.0
    assert resolve_solver_opts("robust") == {"al_iters": 3, "max_iters": 15,
                                             "fused_kkt": True}
    with pytest.raises(ValueError, match="unknown solver preset"):
        resolve_solver_opts("fast")

    # the string rides through each consumer's constructor
    import numpy as _np
    from gpmpc_tpu import GP, Model, MPC
    from gpmpc_tpu.parallel.batched import BatchedStudy
    from gpmpc_tpu.systems import four_tank_ode

    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=3.0,
                  R=_np.diag([1e-3] * 4), dtype=jnp.float64)
    X, Y = model.generate_training_data(
        12, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(0))
    gp = GP(X, Y, multistart=1, max_iters=25, seed=0)
    mpc = MPC(horizon=9.0, model=model, gp=gp, solver_opts="robust",
              ulb=[0.0, 0.0], uub=[8.0, 8.0])
    assert mpc.sqp_cfg.al_iters == 3 and mpc.sqp_cfg.max_iters == 15
    # f64 model: the preset adapts (drops the f32-only fused sweep) ...
    assert not mpc.sqp_cfg.fused_kkt
    study = BatchedStudy(model, gp, horizon=9.0, solver_opts="rti")
    assert study.sqp_cfg.merit_viol == 10.0
    assert study.sqp_cfg.penalty_mult == 30.0
    assert not study.sqp_cfg.fused_kkt
    # falsy dict keeps the study's own default budget (historical
    # `solver_opts or {...}` semantics); 'converged' selects SQPConfig()
    s_empty = BatchedStudy(model, gp, horizon=9.0, solver_opts={})
    assert (s_empty.sqp_cfg.al_iters, s_empty.sqp_cfg.max_iters) == (3, 15)
    s_conv = BatchedStudy(model, gp, horizon=9.0, solver_opts="converged")
    assert (s_conv.sqp_cfg.al_iters, s_conv.sqp_cfg.max_iters) == (6, 30)
    # chunk validation rejects bools and non-integral values loudly
    for bad in (True, 1024.5, 0):
        with pytest.raises(ValueError, match="chunk"):
            BatchedStudy(model, gp, horizon=9.0, chunk=bad)
    # ... while an EXPLICIT fused_kkt=True dict keeps the loud f64 error
    with pytest.raises(ValueError, match="fused_kkt"):
        MPC(horizon=9.0, model=model, gp=gp,
            solver_opts=dict(fused_kkt=True),
            ulb=[0.0, 0.0], uub=[8.0, 8.0])
