"""Moving-horizon estimation (beyond-reference component).

The load-bearing check: for a linear system with Gaussian noise and the
matching prior, the full-window MHE MAP estimate IS the Kalman/RTS smoother
— an independent closed-form oracle (implemented here in NumPy) the NLP
solution must reproduce to solver tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu import MHE, Model

RNG = np.random.default_rng(7)


def _linear_model(nx=3, nu=1, dt=0.1):
    # stable continuous-time linear system; rk4 of a linear ODE is an exact
    # linear discrete map (4th-order Taylor of expm), probed via jacfwd
    ac = np.array([[-0.6, 0.3, 0.0],
                   [0.0, -0.4, 0.2],
                   [0.1, 0.0, -0.5]])[:nx, :nx]
    bc = np.array([[0.5], [0.0], [0.3]])[:nx, :nu]

    def ode(x, u):
        return jnp.asarray(ac) @ x + jnp.asarray(bc) @ u

    model = Model(Nx=nx, Nu=nu, ode=ode, dt=dt, R=np.eye(nx) * 1e-4,
                  dtype=jnp.float64)
    ad = np.asarray(jax.jacfwd(lambda x: model.rk4(x, jnp.zeros(nu)))(
        jnp.zeros(nx)))
    bd = np.asarray(jax.jacfwd(lambda u: model.rk4(jnp.zeros(nx), u))(
        jnp.zeros(nu)))
    return model, ad, bd


def _rts_smoother(ad, bd, c, q, r, x_bar, p0, ys, us):
    """Kalman filter + Rauch-Tung-Striebel smoother (NumPy oracle)."""
    t_total = ys.shape[0]
    nx = ad.shape[0]
    x_f = np.zeros((t_total, nx))
    p_f = np.zeros((t_total, nx, nx))
    x_p = np.zeros((t_total, nx))
    p_p = np.zeros((t_total, nx, nx))
    x_pred, p_pred = x_bar.copy(), p0.copy()
    for k in range(t_total):
        x_p[k], p_p[k] = x_pred, p_pred
        s = c @ p_pred @ c.T + r
        kg = p_pred @ c.T @ np.linalg.inv(s)
        x_f[k] = x_pred + kg @ (ys[k] - c @ x_pred)
        p_f[k] = (np.eye(nx) - kg @ c) @ p_pred
        if k < t_total - 1:
            x_pred = ad @ x_f[k] + bd @ us[k]
            p_pred = ad @ p_f[k] @ ad.T + q
    x_s = x_f.copy()
    for k in range(t_total - 2, -1, -1):
        g = p_f[k] @ ad.T @ np.linalg.inv(p_p[k + 1])
        x_s[k] = x_f[k] + g @ (x_s[k + 1] - x_p[k + 1])
    return x_s, x_f


def _simulate(ad, bd, c, q, r, x0, t_total, rng):
    nx, nu = bd.shape
    us = rng.uniform(-1.0, 1.0, size=(t_total - 1, nu))
    xs = np.zeros((t_total, nx))
    xs[0] = x0
    for k in range(t_total - 1):
        w = rng.multivariate_normal(np.zeros(nx), q)
        xs[k + 1] = ad @ xs[k] + bd @ us[k] + w
    vs = rng.multivariate_normal(np.zeros(c.shape[0]), r, size=t_total)
    ys = xs @ c.T + vs
    return xs, us, ys


def test_mhe_equals_rts_smoother_linear_gaussian():
    """Full-window MHE on a linear-Gaussian problem == RTS smoother."""
    model, ad, bd = _linear_model()
    nx = 3
    c = np.array([[1.0, 0.0, 0.0],
                  [0.0, 1.0, 0.0]])          # partial measurement
    q = 1e-3 * np.eye(nx)
    r = np.diag([4e-2, 1e-2])
    p0 = 0.5 * np.eye(nx)
    x_bar = np.array([0.2, -0.1, 0.3])
    m = 8

    x0_true = x_bar + RNG.multivariate_normal(np.zeros(nx), p0) * 0.3
    xs_true, us, ys = _simulate(ad, bd, c, q, r, x0_true, m + 1, RNG)

    mhe = MHE(model, window=m, Q_noise=q, R_meas=r, P_arrival=p0,
              h=lambda x: jnp.asarray(c) @ x, discrete_method="rk4",
              solver_opts=dict(max_iters=50, tol_stat=1e-12))
    xs_est, res = mhe.estimate(ys, us, x_bar, return_result=True)
    assert bool(res.converged)

    x_smooth, _ = _rts_smoother(ad, bd, c, q, r, x_bar, p0, ys, us)
    np.testing.assert_allclose(np.asarray(xs_est), x_smooth,
                               atol=1e-7, rtol=1e-7)


def test_mhe_online_filter_denoises_and_tracks():
    """Online run(): after the fill-in transient the filtered estimates beat
    the raw measurements and track the truth; converged throughout."""
    model, ad, bd = _linear_model()
    nx = 3
    c = np.eye(nx)                            # full noisy state measurement
    q = 1e-4 * np.eye(nx)
    r = 2.5e-3 * np.eye(nx)
    t_total = 40
    x0 = np.array([0.5, -0.3, 0.2])
    xs_true, us, ys = _simulate(ad, bd, c, q, r, x0, t_total, RNG)

    mhe = MHE(model, window=6, Q_noise=q, R_meas=r,
              P_arrival=0.1 * np.eye(nx), discrete_method="rk4")
    x_hats = np.asarray(mhe.run(x0, ys, us))
    assert x_hats.shape == (t_total, nx)
    assert np.all(np.isfinite(x_hats))
    assert mhe.last_converged.all()

    tail = slice(10, None)                    # past the fill-in transient
    err_est = np.sqrt(np.mean((x_hats[tail] - xs_true[tail]) ** 2))
    err_meas = np.sqrt(np.mean((ys[tail] - xs_true[tail]) ** 2))
    assert err_est < 0.6 * err_meas, (err_est, err_meas)


def test_mhe_respects_state_bounds():
    """Estimates stay inside the declared box even when measurements leave
    it — the constrained-estimation property EKF/UKF lack."""
    model, ad, bd = _linear_model()
    nx = 3
    q = 1e-4 * np.eye(nx)
    r = 1e-2 * np.eye(nx)
    m = 6
    # truth rides near the x1 <= 0.3 bound; noisy measurements cross it
    x0 = np.array([0.29, 0.0, 0.0])
    xs_true, us, ys = _simulate(ad, bd, np.eye(nx), q, r, x0, m + 1, RNG)
    ys[:, 0] += 0.15                          # biased sensor pushes past

    mhe = MHE(model, window=m, Q_noise=q, R_meas=r,
              P_arrival=0.1 * np.eye(nx),
              xub=[0.3, 5.0, 5.0], xlb=[-5.0, -5.0, -5.0],
              discrete_method="rk4",
              solver_opts=dict(al_iters=8, max_iters=30,
                               penalty_init=1e2))
    xs_est = np.asarray(mhe.estimate(ys, us, x0))
    assert np.all(np.isfinite(xs_est))
    assert xs_est[:, 0].max() <= 0.3 + 1e-6, xs_est[:, 0]


@pytest.mark.slow
def test_mhe_four_tank_partial_measurement():
    """Nonlinear plant: reconstruct the UNMEASURED upper-tank levels from
    noisy lower-tank measurements only (observability through the ODE)."""
    from gpmpc_tpu.systems import four_tank_ode

    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-4] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=10)
    c = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    r = np.diag([2.5e-3, 2.5e-3])
    q = np.diag([1e-4] * 4)
    t_total = 25
    rng = np.random.default_rng(3)
    x_true = np.array([8.0, 9.0, 2.0, 1.5])
    us = rng.uniform(2.0, 4.0, size=(t_total - 1, 2))
    xs_true = [x_true]
    for k in range(t_total - 1):
        xn = np.asarray(model.integrate(jnp.asarray(xs_true[-1]),
                                        jnp.asarray(us[k])))
        xs_true.append(xn + rng.multivariate_normal(np.zeros(4), q))
    xs_true = np.stack(xs_true)
    ys = xs_true @ c.T + rng.multivariate_normal(np.zeros(2), r,
                                                 size=t_total)

    mhe = MHE(model, window=8, Q_noise=q, R_meas=r,
              P_arrival=np.diag([0.5] * 4),
              h=lambda x: jnp.asarray(c) @ x,
              xlb=[0.1] * 4, xub=[25.0] * 4,
              discrete_method="rk4",
              solver_opts=dict(al_iters=2, max_iters=30))
    x_bar = np.array([8.0, 9.0, 1.0, 1.0])   # wrong prior on upper tanks
    x_hats = np.asarray(mhe.run(x_bar, ys, us))
    # unmeasured upper-tank levels recovered by the window's end
    tail = slice(12, None)
    err = np.abs(x_hats[tail, 2:] - xs_true[tail, 2:])
    assert err.max() < 0.25, err.max()
    assert np.all(x_hats >= 0.1 - 1e-9)


def test_mhe_arrival_update_equals_kalman_filter():
    """With the EKF-propagated arrival cost (arrival_update=True, the
    filtered arrival cost of Rao & Rawlings), a SHORT-window (M=2) MHE on a
    linear-Gaussian problem reproduces the full-information Kalman filter at
    every step — the prior carries everything the window has forgotten.
    The fixed-prior policy cannot do this (checked as an ordering)."""
    model, ad, bd = _linear_model()
    nx, m = 3, 2
    c = np.array([[1.0, 0.0, 0.0],
                  [0.0, 1.0, 0.0]])          # partial measurement
    q = 1e-4 * np.eye(nx)                    # == model.R
    r = np.diag([2e-3, 4e-3])
    p0 = 1e-2 * np.eye(nx)
    x_bar0 = np.zeros(nx)
    t_total = 18

    x0_true = np.array([0.3, -0.2, 0.25])
    xs_true, us, ys = _simulate(ad, bd, c, q, r, x0_true, t_total, RNG)

    # NumPy full-information Kalman filter (the oracle)
    _, x_filt = _rts_smoother(ad, bd, c, q, r, x_bar0, p0, ys, us)

    def run_filter(arrival_update):
        mhe = MHE(model, window=m, Q_noise=q, R_meas=r, P_arrival=p0,
                  h=lambda x: jnp.asarray(c) @ x, discrete_method="rk4",
                  arrival_update=arrival_update,
                  solver_opts=dict(max_iters=50, tol_stat=1e-12))
        # start from the real first window (no fill-in transient): states
        # 0..m with prior (x_bar0, p0) on state 0
        state = mhe.start_filter(x_bar0, ys[:m + 1], us[:m])
        errs = []
        for k in range(m + 1, t_total):
            state, x_hat = mhe.step(state, ys[k], us[k - 1])
            errs.append(np.abs(np.asarray(x_hat) - x_filt[k]).max())
        return np.array(errs)

    err_upd = run_filter(True)
    err_fix = run_filter(False)
    # exact agreement with the Kalman filter (solver tolerance)
    assert err_upd.max() < 1e-6, err_upd.max()
    # the fixed-prior short window is NOT the Kalman filter
    assert err_fix.max() > 10 * max(err_upd.max(), 1e-12), (
        err_fix.max(), err_upd.max())


@pytest.mark.slow
def test_fused_output_feedback_matches_host_composition():
    """The fused one-program output-feedback loop (measurement -> MHE solve
    -> MPC solve -> plant step inside one lax.scan) reproduces the
    host-composed mhe.step + mpc.solve_step loop on identical noise draws
    — the fusion changes the process boundary, not the math."""
    from gpmpc_tpu import MPC, simulate_output_feedback
    from gpmpc_tpu.systems import four_tank_ode

    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-4] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=10)
    c = np.array([[1.0, 0.0, 0.0, 0.0],
                  [0.0, 1.0, 0.0, 0.0]])
    r_meas = np.diag([2.5e-3, 2.5e-3])
    mhe = MHE(model, window=3, Q_noise=model.R, R_meas=r_meas,
              P_arrival=np.diag([0.5] * 4),
              h=lambda x: jnp.asarray(c, x.dtype) @ x,
              xlb=[0.0] * 4, discrete_method="rk4")
    mpc = MPC(horizon=4 * dt, model=model, gp=None, gp_method="ME",
              discrete_method="rk4",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)

    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_bar = np.array([8.5, 8.5, 1.2, 1.2])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    n = 6
    rng = np.random.default_rng(12)
    noise_w = 0.01 * rng.standard_normal((n, 4))
    noise_v = 0.05 * rng.standard_normal((n, 2))

    res = simulate_output_feedback(mpc, mhe, x0, x_bar, n * dt, x_sp,
                                   noise_w=noise_w, noise_v=noise_v)
    assert res.x_true.shape == (n + 1, 4)
    assert np.all(np.isfinite(res.x_true))

    # host-composed loop on the SAME draws (example output_feedback.py's
    # per-step shape, suitable for a real plant)
    est = mhe.init_filter(x_bar, mhe.h(jnp.asarray(x0)) + noise_v[0])
    warm = mpc._init_warm(
        mpc._augment_x0(jnp.asarray(x_bar), jnp.zeros(2)),
        mpc._ref_window(jnp.asarray(x_sp)))
    x = jnp.asarray(x0)
    u_prev = jnp.zeros(2)
    for k in range(n):
        y = mhe.h(x) + noise_v[k]
        est, x_hat = mhe.step(est, y, u_prev)
        u0, warm, _, _ = mpc.solve_step(x_hat, x_sp, warm=warm,
                                        u_prev=u_prev)
        x = jnp.maximum(model.integrate(x, u0) + noise_w[k], 0.0)
        np.testing.assert_allclose(np.asarray(x_hat), res.x_hat[k],
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(u0), res.u[k], atol=1e-8)
        np.testing.assert_allclose(np.asarray(x), res.x_true[k + 1],
                                   atol=1e-8)
        u_prev = u0


@pytest.mark.slow
@pytest.mark.parametrize("seed,nm,m", [(21, 1, 1), (22, 3, 3)])
def test_mhe_arrival_update_kalman_property_randomized(seed, nm, m):
    """Property form of the Kalman-exactness check: random measurement maps
    (from rank-1 up to full state), random noise scales, and the extreme
    window sizes (M=1 single-transition window, M=3) must all reproduce the
    full-information Kalman filter when the arrival prior rides the EKF
    recursion."""
    model, ad, bd = _linear_model()
    nx = 3
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1.0, 1.0, size=(nm, nx))
    q = 1e-4 * np.eye(nx)                    # == model.R
    r = np.diag(rng.uniform(1e-3, 1e-2, size=nm))
    p0 = np.diag(rng.uniform(5e-3, 5e-2, size=nx))
    x_bar0 = rng.uniform(-0.2, 0.2, size=nx)
    t_total = 12

    x0_true = x_bar0 + rng.uniform(-0.1, 0.1, size=nx)
    xs_true, us, ys = _simulate(ad, bd, c, q, r, x0_true, t_total, rng)
    _, x_filt = _rts_smoother(ad, bd, c, q, r, x_bar0, p0, ys, us)

    mhe = MHE(model, window=m, Q_noise=q, R_meas=r, P_arrival=p0,
              h=lambda x: jnp.asarray(c, x.dtype) @ x,
              discrete_method="rk4", arrival_update=True,
              solver_opts=dict(max_iters=50, tol_stat=1e-12))
    state = mhe.start_filter(x_bar0, ys[:m + 1], us[:m])
    for k in range(m + 1, t_total):
        state, x_hat = mhe.step(state, ys[k], us[k - 1])
        err = np.abs(np.asarray(x_hat) - x_filt[k]).max()
        assert err < 1e-6, (k, err)
