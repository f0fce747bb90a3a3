"""End-to-end MPC tests on the four-tank process (SURVEY configs 2-3).

Small sizes (short horizons, few GP points) keep CPU compile times sane;
the full-size configs run in examples/ and bench.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.systems import four_tank_ode

DT = 3.0
X_SS = np.array([12.4, 12.7, 1.8, 1.4])
U_SS = np.array([3.0, 3.0])


@pytest.fixture(scope="module")
def tank_model():
    R = np.diag([1e-3] * 4)
    return Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                 R=R, clip_negative=True, dtype=jnp.float64,
                 integrator_substeps=10)


@pytest.fixture(scope="module")
def tank_gp(tank_model):
    X, Y = tank_model.generate_training_data(
        60, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    return GP(X, Y, mean_func="zero", gp_method="TA", multistart=2,
              max_iters=150, seed=1)


@pytest.mark.slow
def test_gp_learns_tank_dynamics(tank_model, tank_gp):
    """Trained GP predicts held-out one-step transitions (SMSE bar)."""
    Xt, Yt = tank_model.generate_training_data(
        100, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        noise=False, key=jax.random.PRNGKey(9))
    smse, mnlp, rmse = tank_gp.validate(Xt, Yt, verbose=False)
    assert np.all(smse < 0.1), f"SMSE too high: {smse}"
    assert np.all(rmse >= 0) and np.all(np.isfinite(rmse))


@pytest.mark.slow
def test_mpc_rk4_reaches_setpoint(tank_model):
    """Known-model MPC (discrete_method='rk4', no GP) regulates the tanks to
    the setpoint under box constraints [SURVEY C6 'rk4' mode]."""
    mpc = MPC(horizon=5 * DT, model=tank_model, gp=None, gp_method="ME",
              discrete_method="rk4",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.5, 0.5, 0.1, 0.1], xub=[25.0, 25.0, 8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    xs, us = mpc.solve(x0=np.array([8.0, 9.0, 1.0, 1.0]), sim_time=12 * DT,
                       x_sp=X_SS, noise=False)
    xs = np.asarray(xs)
    err = np.abs(xs[-1, :2] - X_SS[:2])
    assert np.all(err < 0.5), f"final level error {err}"
    us = np.asarray(us)
    assert us.min() >= -1e-6 and us.max() <= 8.0 + 1e-6
    assert np.all(mpc.last_run["defect"] < 1e-6)


def test_mpc_gp_me_tracks(tank_model, tank_gp):
    """Config 2: GP dynamics, mean-equivalent propagation, box constraints."""
    mpc = MPC(horizon=5 * DT, model=tank_model, gp=tank_gp, gp_method="ME",
              discrete_method="gp",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    xs, us = mpc.solve(x0=np.array([8.0, 9.0, 1.0, 1.0]), sim_time=12 * DT,
                       x_sp=X_SS, noise=False)
    xs = np.asarray(xs)
    err = np.abs(xs[-1, :2] - X_SS[:2])
    # GP model error limits accuracy; must still converge near the setpoint
    assert np.all(err < 1.5), f"final level error {err}"


@pytest.mark.slow
def test_mpc_gp_ta_chance_constraints(tank_model, tank_gp):
    """Config 3: Taylor covariance propagation + chance tightening — the
    tightened runs must keep a larger safety margin from the bound than the
    untightened one (monotonicity property, SURVEY §4)."""
    kwargs = dict(
        horizon=5 * DT, model=tank_model, gp=tank_gp,
        discrete_method="gp",
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0],
        xlb=[0.5, 0.5, 0.1, 0.1], xub=[13.0, 25.0, 8.0, 8.0],
        feedback=True, cov_updates=2)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    # setpoint near the h1 upper bound so tightening visibly bites
    x_sp = np.array([12.8, 12.7, 1.8, 1.4])

    mpc_plain = MPC(gp_method="TA", percentile=None, **kwargs)
    xs_plain, _ = mpc_plain.solve(x0=x0, sim_time=10 * DT, x_sp=x_sp,
                                  noise=False)
    mpc_tight = MPC(gp_method="TA", percentile=0.99, **kwargs)
    xs_tight, _ = mpc_tight.solve(x0=x0, sim_time=10 * DT, x_sp=x_sp,
                                  noise=False)

    h1_plain = float(np.max(np.asarray(xs_plain)[:, 0]))
    h1_tight = float(np.max(np.asarray(xs_tight)[:, 0]))
    assert h1_tight <= 13.0 + 1e-6
    assert h1_tight < h1_plain + 1e-9, (
        f"tightening did not increase margin: {h1_tight} vs {h1_plain}")
    # propagated covariances are PSD along the rollout (SURVEY §4 property)
    sig = mpc_tight.last_run["sigmas"]
    eigs = np.linalg.eigvalsh(sig)
    assert eigs.min() > -1e-9


@pytest.mark.slow
def test_mpc_hybrid_and_exact_modes(tank_model, tank_gp):
    """'hybrid' (model + GP residual) and 'exact' discretizations build and
    run [SURVEY C6 discrete_method set]."""
    for dm in ("hybrid", "exact"):
        mpc = MPC(horizon=4 * DT, model=tank_model, gp=tank_gp,
                  gp_method="TA", discrete_method=dm,
                  Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
                  ulb=[0.0, 0.0], uub=[8.0, 8.0],
                  feedback=False, percentile=None, cov_updates=1)
        xs, us = mpc.solve(x0=np.array([8.0, 9.0, 1.0, 1.0]),
                           sim_time=4 * DT, x_sp=X_SS, noise=False)
        assert np.all(np.isfinite(np.asarray(xs)))


@pytest.mark.slow
def test_mpc_trajectory_reference_tracking(tank_model):
    """Time-varying reference support (beyond-reference: the upstream x_sp
    is a single point [SURVEY C6]).  Three properties:
    (1) a constant trajectory reference reproduces the fixed-setpoint run
        exactly; (2) with a step-change reference the previewing controller
        starts moving toward the new level BEFORE the change takes effect
        (the horizon window sees it coming); (3) it settles at the final
        reference."""
    kwargs = dict(horizon=5 * DT, model=tank_model, gp=None, gp_method="ME",
                  discrete_method="rk4",
                  Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
                  ulb=[0.0, 0.0], uub=[8.0, 8.0],
                  feedback=False, percentile=None, cov_updates=1)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    n_steps = 16

    # (1) constant trajectory == fixed setpoint, bit-for-bit
    mpc = MPC(**kwargs)
    xs_fix, us_fix = mpc.solve(x0=x0, sim_time=n_steps * DT, x_sp=X_SS,
                               noise=False)
    mpc2 = MPC(**kwargs)
    ref_const = np.tile(X_SS, (n_steps + mpc2.Nt + 1, 1))
    xs_traj, us_traj = mpc2.solve(x0=x0, sim_time=n_steps * DT,
                                  x_sp=ref_const, noise=False)
    np.testing.assert_allclose(np.asarray(xs_traj), np.asarray(xs_fix),
                               rtol=1e-12, atol=1e-12)

    # (2)+(3) step-change reference: level A for k_switch steps, then B
    a_lvl = X_SS
    b_lvl = np.array([10.0, 10.5, 1.5, 1.2])
    k_switch = 10
    ref = np.vstack([np.tile(a_lvl, (k_switch, 1)),
                     np.tile(b_lvl, (n_steps + mpc2.Nt + 1 - k_switch, 1))])
    mpc3 = MPC(**kwargs)
    xs, us = mpc3.solve(x0=x0, sim_time=n_steps * DT, x_sp=ref, noise=False)
    xs = np.asarray(xs)
    # preview: at the switch step the state has already left level A toward
    # B (the window saw B coming Nt steps early); h1 gap A->B is ~2.4 cm
    toward = a_lvl[0] - xs[k_switch, 0]
    assert toward > 0.3, f"no anticipation: h1 moved {toward:.3f} toward B"
    # settles at the final reference
    assert np.abs(xs[-1, :2] - b_lvl[:2]).max() < 0.5
    # last_run stores the per-step applied reference for plotting
    assert mpc3.last_run["x_sp"].shape == (n_steps, 4)
    np.testing.assert_allclose(mpc3.last_run["x_sp"][0], a_lvl)
    np.testing.assert_allclose(mpc3.last_run["x_sp"][-1], b_lvl)


@pytest.mark.slow
def test_mpc_saturating_cost_and_delta_u(tank_model):
    """costFunc='sat' + delta-u penalty S (state augmentation path)."""
    mpc = MPC(horizon=4 * DT, model=tank_model, gp=None,
              discrete_method="rk4", costFunc="sat",
              Q=np.diag([0.05, 0.05, 0.01, 0.01]), R=0.001 * np.eye(2),
              S=0.1 * np.eye(2), u_sp=U_SS,
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    xs, us = mpc.solve(x0=np.array([8.0, 9.0, 1.0, 1.0]), sim_time=8 * DT,
                       x_sp=X_SS, noise=False)
    xs, us = np.asarray(xs), np.asarray(us)
    assert np.all(np.isfinite(xs))
    # delta-u penalty produces smoother input sequences
    assert np.max(np.abs(np.diff(us, axis=0))) < 6.0
    # still makes progress toward the setpoint
    assert (np.abs(xs[-1, :2] - X_SS[:2]).max()
            < np.abs(xs[0, :2] - X_SS[:2]).max())


@pytest.mark.slow
def test_solve_step_standalone(tank_model):
    """solve_step drives an external plant loop (warm-started)."""
    mpc = MPC(horizon=4 * DT, model=tank_model, gp=None,
              discrete_method="rk4",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    x = jnp.array([8.0, 9.0, 1.0, 1.0])
    warm, u_prev = None, None
    for _ in range(3):
        u0, warm, sigmas, info = mpc.solve_step(x, X_SS, warm=warm,
                                                u_prev=u_prev)
        x = tank_model.integrate(x, u0)
        u_prev = u0
    assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.slow
def test_terminal_constraint(tank_model):
    """terminal_constraint: ||x_N - x_sp||^2 <= c at the horizon end
    [SURVEY C6, conf. M]."""
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    mpc = MPC(horizon=6 * DT, model=tank_model, gp=None,
              discrete_method="rk4",
              Q=np.diag([1.0, 1.0, 0.01, 0.01]), R=0.001 * np.eye(2),
              ulb=[0.0, 0.0], uub=[10.0, 10.0],
              terminal_constraint=4.0,
              feedback=False, percentile=None, cov_updates=1)
    u0, warm, _, info = mpc.solve_step(np.array([10.0, 10.5, 1.2, 1.2]),
                                       x_sp)
    x_term = np.asarray(warm.x[-1, :4])
    term_err = float(np.sum((x_term - x_sp) ** 2))
    assert term_err <= 4.0 + 1e-3, f"terminal ball violated: {term_err}"
    assert np.isfinite(float(info.obj))


@pytest.mark.slow
def test_gp_feedback_gain_used_in_pure_gp_mode(tank_model, tank_gp):
    """With discrete_method='gp' the LQR feedback gain must come from the
    linearized GP mean dynamics, not the known model's RK4 Jacobian
    [SURVEY C5 linearization row] — and the loop must still regulate."""
    kw = dict(horizon=5 * DT, model=tank_model, gp=tank_gp, gp_method="TA",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=True, percentile=0.9, cov_updates=1,
              op_x=X_SS, op_u=U_SS)
    mpc_gp = MPC(discrete_method="gp", **kw)
    mpc_model = MPC(discrete_method="hybrid", **kw)
    k_gp = np.asarray(mpc_gp.K_fb)
    k_model = np.asarray(mpc_model.K_fb)
    # learned-dynamics gain must differ from the known-model gain...
    assert not np.allclose(k_gp, k_model, atol=1e-6)
    # ...but only modestly (the GP is a good model of the same dynamics)
    assert np.linalg.norm(k_gp - k_model) < 5.0 * np.linalg.norm(k_model)
    xs, _ = mpc_gp.solve(x0=np.array([8.0, 9.0, 1.0, 1.0]), sim_time=12 * DT,
                         x_sp=X_SS, noise=False)
    xs = np.asarray(xs)
    assert np.isfinite(xs).all()
    assert np.abs(xs[-1, :2] - X_SS[:2]).max() < 0.5


@pytest.mark.slow
def test_solve_step_clips_returned_input(tank_model):
    """solve_step must never hand an external plant a bound-violating input,
    even when the AL solve carries residual constraint violation."""
    mpc = MPC(horizon=4 * DT, model=tank_model, gp=None, gp_method="ME",
              discrete_method="rk4",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[2.0, 2.0],
              feedback=False, percentile=None, cov_updates=1,
              # starved budget -> residual violation plausible
              solver_opts=dict(max_iters=1, al_iters=1))
    u0, _, _, _ = mpc.solve_step(np.array([2.0, 2.0, 0.5, 0.5]),
                                 np.array([18.0, 18.0, 3.0, 3.0]))
    u0 = np.asarray(u0)
    assert np.all(u0 >= -1e-12) and np.all(u0 <= 2.0 + 1e-12), u0


def test_solve_precision_option_validates():
    """solve_precision: bad values fail at construction, good ones are
    recorded in the introspectable option set."""
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=np.diag([1e-3] * 4), dtype=jnp.float64)
    kw = dict(horizon=3 * DT, model=model, gp=None, gp_method="ME",
              discrete_method="rk4", Q=np.eye(4), R=np.eye(2),
              feedback=False, percentile=None, cov_updates=1)
    with pytest.raises(ValueError, match="solve_precision"):
        MPC(solve_precision="fast", **kw)
    mpc = MPC(solve_precision="default", **kw)
    assert mpc.options.solve_precision == "default"
    assert MPC(**kw).options.solve_precision is None


@pytest.mark.slow
def test_solve_precision_scope_is_noop_on_cpu(tank_model, tank_gp):
    """The precision scope changes only matmul precision attributes, which
    the CPU backend ignores — closed loops must agree to fp tolerance.
    (The TPU-side quality evidence lives in RESULTS.md round 3c.)"""
    kw = dict(horizon=4 * DT, model=tank_model, gp=tank_gp, gp_method="TA",
              discrete_method="gp",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=True, percentile=0.95, cov_updates=1,
              op_x=X_SS, op_u=U_SS)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    xs_hi, us_hi = MPC(**kw).solve(x0, 6 * DT, X_SS, noise=False)
    xs_df, us_df = MPC(solve_precision="default", **kw).solve(
        x0, 6 * DT, X_SS, noise=False)
    np.testing.assert_allclose(np.asarray(xs_hi), np.asarray(xs_df),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(us_hi), np.asarray(us_df),
                               rtol=0, atol=1e-10)


@pytest.mark.slow
def test_input_rate_bounds(tank_model):
    """Hard du bounds (beyond-reference): the realized input rate obeys
    dulb <= u_k - u_{k-1} <= duub where the unconstrained loop violates it,
    and the controller still regulates."""
    kw = dict(horizon=5 * DT, model=tank_model, gp=None, gp_method="ME",
              discrete_method="rk4",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    _, us_free = MPC(**kw).solve(x0, 12 * DT, X_SS, noise=False)
    xs_r, us_r = MPC(dulb=[-0.6, -0.6], duub=[0.6, 0.6], **kw).solve(
        x0, 20 * DT, X_SS, noise=False)
    # rate measured from the loop's initial u_prev = 0
    du_free = np.diff(np.vstack([[0.0, 0.0], np.asarray(us_free)]), axis=0)
    du_rate = np.diff(np.vstack([[0.0, 0.0], np.asarray(us_r)]), axis=0)
    assert np.abs(du_free).max() > 0.6, "bound never binds — test is vacuous"
    # the applied input is clipped to the rate window (like the box bounds),
    # so the realized rate respects the bound exactly
    assert np.abs(du_rate).max() <= 0.6 + 1e-9, du_rate
    # regulation is slower under the ramp limit but must still converge
    assert np.abs(np.asarray(xs_r)[-1, :2] - X_SS[:2]).max() < 1.5


@pytest.mark.slow
def test_custom_cost_callable(tank_model):
    """costFunc may be a callable (mu, Sigma, x_ref, W) -> scalar expected
    stage cost (beyond-reference): it is traced into the NLP, differentiated
    by the same AD as the built-ins, and changes the closed loop."""
    kw = dict(horizon=5 * DT, model=tank_model, gp=None, gp_method="ME",
              discrete_method="rk4",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])

    def asymmetric(mu, sigma, x_ref, w):
        # overshoot above the setpoint costs 9x more than undershoot
        e = mu - x_ref
        e_scaled = jnp.where(e > 0, 3.0 * e, e)
        return e_scaled @ w @ e_scaled + jnp.sum(w * sigma)

    xs_q, _ = MPC(costFunc="quad", **kw).solve(x0, 12 * DT, X_SS,
                                               noise=False)
    xs_a, _ = MPC(costFunc=asymmetric, **kw).solve(x0, 12 * DT, X_SS,
                                                   noise=False)
    xs_q, xs_a = np.asarray(xs_q), np.asarray(xs_a)
    assert np.abs(xs_a[-1, :2] - X_SS[:2]).max() < 1.0  # still regulates
    assert np.abs(xs_a - xs_q).max() > 1e-3  # and the cost actually matters
    # asymmetry shows up as less overshoot mass above the setpoint
    over_q = np.clip(xs_q[:, :2] - X_SS[:2], 0, None).sum()
    over_a = np.clip(xs_a[:, :2] - X_SS[:2], 0, None).sum()
    assert over_a <= over_q + 1e-9
    with pytest.raises(ValueError, match="costFunc"):
        MPC(costFunc="cubic", **kw)


@pytest.mark.slow
def test_mpc_gp_ut_closed_loop(tank_model, tank_gp):
    """Beyond-reference: unscented-transform propagation inside the NLP —
    the sigma-point step must trace/differentiate through the solver, keep
    covariances PSD along the rollout, and the chance tightening must bite
    like TA's (same monotone-margin property)."""
    kwargs = dict(
        horizon=5 * DT, model=tank_model, gp=tank_gp,
        discrete_method="gp",
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0],
        xlb=[0.5, 0.5, 0.1, 0.1], xub=[13.0, 25.0, 8.0, 8.0],
        feedback=True, cov_updates=2)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.8, 12.7, 1.8, 1.4])

    mpc_plain = MPC(gp_method="UT", percentile=None, **kwargs)
    xs_plain, _ = mpc_plain.solve(x0=x0, sim_time=10 * DT, x_sp=x_sp,
                                  noise=False)
    mpc_tight = MPC(gp_method="UT", percentile=0.99, **kwargs)
    xs_tight, _ = mpc_tight.solve(x0=x0, sim_time=10 * DT, x_sp=x_sp,
                                  noise=False)

    xs_tight_np = np.asarray(xs_tight)
    assert np.all(np.isfinite(xs_tight_np))
    # regulation: both runs end near the setpoint
    err = np.abs(xs_tight_np[-1, :2] - x_sp[:2])
    assert np.all(err < 1.0), f"final level error {err}"
    h1_plain = float(np.max(np.asarray(xs_plain)[:, 0]))
    h1_tight = float(np.max(xs_tight_np[:, 0]))
    assert h1_tight <= 13.0 + 1e-6
    assert h1_tight < h1_plain + 1e-9
    sig = mpc_tight.last_run["sigmas"]
    eigs = np.linalg.eigvalsh(sig)
    assert eigs.min() > -1e-9


def test_violation_rates_unit():
    """Pure-numpy audit arithmetic: pooled and worst-step frequencies over a
    synthetic ensemble — the deterministic initial state excluded, inactive
    (unbounded) dims masked out."""
    from gpmpc_tpu.utils.calibration import violation_rates

    xlb = np.array([0.0, -1e10])
    xub = np.array([1.0, 1e10])
    xs = np.zeros((4, 3, 2))
    xs[:, :, 1] = 5.0          # dim 1 unbounded: never a violation
    xs[:, 0, 0] = 2.0          # initial state out of bounds: NOT counted
    xs[0, 1, 0] = 2.0          # one lane violates dim 0 at step 1
    xs[1, 1, 0] = -1.0         # second lane violates dim 0 at step 1
    rate, worst, active = violation_rates(xs, xlb, xub)
    assert active.tolist() == [True, False]
    assert rate[0] == pytest.approx(2.0 / 8.0)   # 2 of (4 lanes x 2 steps)
    assert worst[0] == pytest.approx(0.5)        # step 1: 2 of 4 lanes
    assert rate[1] == 0.0


@pytest.mark.slow
def test_chance_constraint_empirical_calibration(tank_model):
    """Statistical audit of the tightening claim [SURVEY C6]: with the upper
    level bound within one noise sigma of the setpoint, an UNtightened
    controller rides the bound and violates it a large fraction of steps,
    while the percentile=0.95 controller backs off so the realized pooled
    violation frequency stays within alpha = 0.05 + sampling slack.  The
    exact model (discrete_method='rk4') isolates the tightening mechanism
    from GP-mean bias (a GP whose mean error is of the order of the
    tightening margin fails this audit — by design, that is what the audit
    is FOR); the ensemble is ONE vmapped program (MPC.solve_mc)."""
    from gpmpc_tpu.utils.calibration import chance_calibration, \
        violation_rates

    x_sp = X_SS
    # plant noise std on tank 1 is sqrt(1e-3) ~ 0.032; put the bound 0.02
    # above the setpoint so bound-riding crosses it ~27% of steps while the
    # tightened controller's 1.645-sigma backoff brings that to ~5%
    kwargs = dict(
        horizon=5 * DT, model=tank_model, gp=None,
        discrete_method="rk4", gp_method="ME",
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0],
        xlb=[0.5, 0.5, 0.1, 0.1],
        xub=[float(X_SS[0]) + 0.02, 25.0, 8.0, 8.0],
        feedback=False, cov_updates=1)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    n_mc, n_steps = 48, 14

    mpc_tight = MPC(percentile=0.95, **kwargs)
    report = chance_calibration(mpc_tight, x0, n_steps * DT, x_sp,
                                n_mc=n_mc, key=jax.random.PRNGKey(5))
    assert report["alpha"] == pytest.approx(0.05)
    # per-lane diagnostics landed with the right shape (note: converged is
    # legitimately all-False here — the setpoint is INFEASIBLE against the
    # tightened bound, so the AL convergence gate refuses; the tracking
    # quality is what the rest of the test measures)
    conv = mpc_tight.last_mc["converged"]
    assert conv.shape == (n_mc, n_steps) and conv.dtype == bool
    # every lane is a genuine closed loop: distinct noise -> distinct paths
    xs_t = mpc_tight.last_mc["x_sim"]
    assert np.std(xs_t[:, -1, 0]) > 1e-4

    mpc_plain = MPC(percentile=None, **kwargs)
    xs_p, _ = mpc_plain.solve_mc(x0, n_steps * DT, x_sp, n_mc,
                                 key=jax.random.PRNGKey(5))
    rate_p, worst_p, _ = violation_rates(xs_p, mpc_plain.xlb, mpc_plain.xub)

    # ordering: tightening strictly reduces the violation rate
    assert report["rate"][0] < rate_p[0] - 1e-9, (report["rate"], rate_p)
    # the untightened controller really does ride the bound into violation
    assert worst_p[0] > 0.15, worst_p[0]
    # and the tightened one is calibrated within sampling slack
    assert report["calibrated"], report


@pytest.mark.slow
def test_solve_mc_mesh_sharded_matches_local(tank_model):
    """MC lanes shard over a dp mesh with no result change [SURVEY §2.3]."""
    from jax.sharding import Mesh

    mpc = MPC(horizon=4 * DT, model=tank_model, gp=None,
              discrete_method="rk4", gp_method="ME",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    key = jax.random.PRNGKey(3)
    xs_local, us_local = mpc.solve_mc(x0, 6 * DT, X_SS, 8, key=key)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("dp",))
    xs_mesh, us_mesh = mpc.solve_mc(x0, 6 * DT, X_SS, 8, key=key, mesh=mesh)
    # not bitwise: the sharded lowering reorders reductions, and the closed
    # loop amplifies last-ulp differences (measured 4e-11 over 6 x64 steps)
    np.testing.assert_allclose(np.asarray(xs_mesh), np.asarray(xs_local),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(us_mesh), np.asarray(us_local),
                               rtol=0, atol=1e-8)


@pytest.mark.slow
def test_mpc_gh_quadrotor_d8_sparse_cubature():
    """GH propagation on the quadrotor hybrid (Nx=6 + Nu=2 -> D=8): the
    order-3 tensor grid would be 6561 points/stage; the 'auto' grid routes
    to the 129-point degree-5 cubature (propagate.propagate_gh) so GH runs
    on EVERY shipped plant family [VERDICT r4 item 4].  Exercises the full
    MPC embedding (chance tightening consumes the floored-PSD Sigma)."""
    from gpmpc_tpu.systems import QUAD_PARAMS, planar_quadrotor_ode

    dtype = jnp.float64
    dt = 0.05
    p_true = dict(QUAD_PARAMS, m=1.3)
    nominal = Model(Nx=6, Nu=2, ode=lambda x, u: planar_quadrotor_ode(x, u),
                    dt=dt, R=np.diag([1e-8] * 6), dtype=dtype,
                    integrator_substeps=4)
    plant = Model(Nx=6, Nu=2,
                  ode=lambda x, u: planar_quadrotor_ode(x, u, p_true),
                  dt=dt, R=np.diag([1e-8] * 6), dtype=dtype,
                  integrator_substeps=4)
    kx, ku = jax.random.split(jax.random.PRNGKey(0))
    x_lo = np.array([-2.0, 0.0, -0.4, -1.5, -1.5, -1.0])
    x_hi = np.array([3.0, 3.0, 0.4, 1.5, 1.5, 1.0])
    xs_s = jax.random.uniform(kx, (40, 6), minval=x_lo, maxval=x_hi,
                              dtype=dtype)
    us_s = jax.random.uniform(ku, (40, 2), minval=2.0, maxval=9.0,
                              dtype=dtype)
    resid = (jax.vmap(plant.integrate)(xs_s, us_s)
             - jax.vmap(nominal.rk4)(xs_s, us_s))
    gp = GP(jnp.concatenate([xs_s, us_s], axis=1), resid, mean_func="zero",
            gp_method="GH", multistart=1, max_iters=60, seed=1)
    assert gp.gh_grid == "auto" and gp.gh_order == 3
    mpc = MPC(horizon=6 * dt, model=nominal, gp=gp, gp_method="GH",
              discrete_method="hybrid",
              Q=np.diag([10.0, 30.0, 2.0, 1.0, 1.0, 0.2]),
              R=0.02 * np.eye(2),
              ulb=[0.0, 0.0], uub=[10.0, 10.0],
              xlb=[-5.0, 0.2, -1.0, -5.0, -5.0, -6.0],
              xub=[5.0, 5.0, 1.0, 5.0, 5.0, 6.0],
              feedback=False, percentile=0.95, cov_updates=1, dtype=dtype)
    x = jnp.asarray([0.0, 1.0, 0.0, 0.0, 0.0, 0.0], dtype)
    x_sp = np.array([1.5, 2.0, 0.0, 0.0, 0.0, 0.0])
    warm, u_prev = None, None
    for _ in range(3):
        u0, warm, sigmas, info = mpc.solve_step(x, x_sp, warm=warm,
                                                u_prev=u_prev)
        u_prev = u0
        x = plant.integrate(x, u0)
        assert np.all(np.isfinite(np.asarray(x)))
        assert np.all(np.isfinite(np.asarray(u0)))
        # propagated covariances along the horizon stay PSD (floored)
        evs = np.linalg.eigvalsh(0.5 * (np.asarray(sigmas)
                                        + np.transpose(np.asarray(sigmas),
                                                       (0, 2, 1))))
        assert evs.min() >= -1e-10
    # the loop made progress toward the setpoint
    assert float(jnp.abs(x[0] - 1.5)) < 1.5


@pytest.mark.slow
def test_mpc_full_controller_beyond_fused_cap():
    """A FULL MPC at Nt > fused_max_nt (=256) must construct and solve:
    the fused-KKT request inside the AL-SQP auto-degrades to the
    associative-scan backend via riccati.select_backend, inside a real
    controller rather than a bare KKT instance [VERDICT r4 item 5].
    f32 so the policy path matches the TPU performance configuration.

    Initialization matters at this scale: the default u=0 cold rollout
    drains the tank onto the sqrt-outflow clamp, where the covariance
    propagation's 1/(2 sqrt(h))-stiff linearization overflows over 300
    stages (NaN sigmas -> NaN merit -> frozen solver; measured in round 5)
    — so the test seeds a plausible hold input through solve_step's
    u_init, the standalone analog of the reference's solve(u0=...)."""
    from gpmpc_tpu.solvers import riccati

    dtype = jnp.float32
    nt = riccati.KKTPolicy().fused_max_nt + 44            # 300 stages
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=5)
    mpc = MPC(horizon=nt * DT, model=model, gp=None,
              discrete_method="rk4", gp_method="ME",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.5, 0.5, 0.1, 0.1], xub=[25.0, 25.0, 10.0, 10.0],
              feedback=False, percentile=None, cov_updates=1,
              solver_opts=dict(al_iters=2, max_iters=10, fused_kkt=True),
              dtype=dtype)
    x0 = jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)
    u0, warm, _, info = mpc.solve_step(x0, X_SS, u_init=[2.0, 2.0])
    assert np.all(np.isfinite(np.asarray(u0)))
    assert np.all(np.isfinite(np.asarray(warm.x)))
    assert warm.x.shape == (nt + 1, 4)
    defect1 = float(info.defect)
    assert defect1 < 0.5, defect1
    # warm-started receding steps: defects close to solver tolerance and
    # the 300-stage plan drives the plant toward the setpoint
    x = x0
    u_prev = u0
    for _ in range(4):
        x = jnp.asarray(model.integrate(x, u_prev), dtype)
        u_prev, warm, _, info = mpc.solve_step(x, X_SS, warm=warm,
                                               u_prev=u_prev)
    assert float(info.defect) < 1e-3, float(info.defect)
    assert np.all(np.isfinite(np.asarray(x)))
    # moving toward the setpoint (levels rising from 8/9 toward 12.4/12.7)
    assert float(x[0]) > 9.0 and float(x[1]) > 10.0
