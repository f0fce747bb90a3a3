"""Dynamics layer vs. scipy integrators and finite differences."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from gpmpc_tpu.models.dynamics import Model

RNG = np.random.default_rng(7)


def pend_ode(x, u):
    """Damped pendulum with torque input."""
    th, w = x[0], x[1]
    return jnp.stack([w, -9.81 * jnp.sin(th) - 0.2 * w + u[0]])


def make_model(dt=0.05, substeps=40, R=None):
    return Model(Nx=2, Nu=1, ode=pend_ode, dt=dt, R=R,
                 integrator_substeps=substeps, dtype=jnp.float64)


def test_integrate_matches_scipy():
    m = make_model()
    x0 = np.array([0.4, -0.2])
    u = np.array([0.3])
    got = np.asarray(m.integrate(jnp.array(x0), jnp.array(u)))
    sol = solve_ivp(lambda t, x: np.array([x[1],
                                           -9.81 * np.sin(x[0]) - 0.2 * x[1]
                                           + u[0]]),
                    (0, m.dt), x0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got, sol.y[:, -1], atol=1e-9)


def test_sim_shapes_and_determinism():
    m = make_model()
    u_seq = jnp.array(RNG.uniform(-1, 1, size=(10, 1)))
    x0 = jnp.array([0.1, 0.0])
    traj1 = m.sim(x0, u_seq)
    traj2 = m.sim(x0, u_seq)
    assert traj1.shape == (11, 2)
    np.testing.assert_array_equal(np.asarray(traj1), np.asarray(traj2))
    # noisy sim is reproducible under the same key
    mR = make_model(R=0.01 * np.eye(2))
    key = jax.random.PRNGKey(3)
    n1 = mR.sim(x0, u_seq, noise=True, key=key)
    n2 = mR.sim(x0, u_seq, noise=True, key=key)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert not np.allclose(np.asarray(n1), np.asarray(traj1))


def test_linearize_matches_finite_diff():
    m = make_model()
    x = jnp.array([0.3, 0.5])
    u = jnp.array([0.2])
    a, b = m.linearize(x, u)
    eps = 1e-6

    def f(x_, u_):
        return np.asarray(pend_ode(jnp.array(x_), jnp.array(u_)))

    a_fd = np.stack([(f(np.asarray(x) + eps * e, np.asarray(u))
                      - f(np.asarray(x) - eps * e, np.asarray(u))) / (2 * eps)
                     for e in np.eye(2)], axis=1)
    np.testing.assert_allclose(np.asarray(a), a_fd, atol=1e-6)
    b_fd = (f(np.asarray(x), np.asarray(u) + eps)
            - f(np.asarray(x), np.asarray(u) - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(b)[:, 0], b_fd, atol=1e-6)


def test_discrete_linearize_consistent_with_rk4():
    m = make_model()
    x = jnp.array([0.3, 0.5])
    u = jnp.array([0.2])
    ad, bd = m.discrete_linearize(x, u)
    dx = jnp.array([1e-5, -2e-5])
    du = jnp.array([3e-5])
    pred = m.rk4(x, u) + ad @ dx + bd @ du
    got = m.rk4(x + dx, u + du)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(got), atol=1e-12)


def test_generate_training_data():
    m = make_model(R=1e-4 * np.eye(2))
    X, Y = m.generate_training_data(
        50, uub=[1.0], ulb=[-1.0], xub=[1.0, 1.0], xlb=[-1.0, -1.0],
        key=jax.random.PRNGKey(0))
    assert X.shape == (50, 3) and Y.shape == (50, 2)
    # samples respect the boxes
    assert np.all(np.asarray(X[:, :2]) <= 1.0)
    assert np.all(np.asarray(X[:, :2]) >= -1.0)
    # targets are near the true one-step image
    x0, u0 = X[:, :2], X[:, 2:]
    true_next = jax.vmap(m.integrate)(x0, u0)
    err = np.abs(np.asarray(Y) - np.asarray(true_next))
    assert err.max() < 0.1  # noise-scale deviations only


def test_adaptive_integrator_matches_scipy():
    """Device DOPRI5 (integrator='adaptive') against a tight scipy solve."""
    m = Model(Nx=2, Nu=1, ode=pend_ode, dt=0.05, integrator="adaptive",
              rtol=1e-9, atol=1e-12, dtype=jnp.float64)
    x0 = np.array([0.4, -0.2])
    u = np.array([0.3])
    got = np.asarray(m.integrate(jnp.array(x0), jnp.array(u)))
    sol = solve_ivp(lambda t, x: np.array([x[1],
                                           -9.81 * np.sin(x[0]) - 0.2 * x[1]
                                           + u[0]]),
                    (0, m.dt), x0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got, sol.y[:, -1], atol=1e-9)


def test_adaptive_integrator_controls_error_on_stiff_decay():
    """On a fast linear decay over a long interval the error-controlled
    integrator must hit the analytic solution where coarse fixed-step RK4
    blows up (the CVODES-role behavior [SURVEY §2.2])."""
    lam = 60.0
    dt = 1.0

    def decay(x, u):
        return -lam * x + u

    # 10 fixed RK4 substeps -> h*lam = 6: unstable, error is enormous
    m_fixed = Model(Nx=1, Nu=1, ode=decay, dt=dt, integrator_substeps=10,
                    dtype=jnp.float64)
    # adaptive shrinks h automatically
    m_adapt = Model(Nx=1, Nu=1, ode=decay, dt=dt, integrator="adaptive",
                    rtol=1e-8, atol=1e-12, dtype=jnp.float64)
    x0, u = jnp.array([1.0]), jnp.array([0.0])
    exact = np.exp(-lam * dt)
    got_adapt = float(m_adapt.integrate(x0, u)[0])
    got_fixed = float(m_fixed.integrate(x0, u)[0])
    assert abs(got_adapt - exact) < 1e-8
    assert abs(got_fixed - exact) > 1.0  # the fixed map diverged


def test_adaptive_integrator_jit_vmap_grad():
    """jit + vmap + forward-mode differentiation all trace through."""
    m = Model(Nx=2, Nu=1, ode=pend_ode, dt=0.05, integrator="adaptive",
              rtol=1e-8, atol=1e-10, dtype=jnp.float64)
    x0s = jnp.array(RNG.uniform(-0.5, 0.5, size=(8, 2)))
    us = jnp.array(RNG.uniform(-1, 1, size=(8, 1)))
    batched = jax.jit(jax.vmap(m.integrate))(x0s, us)
    assert batched.shape == (8, 2)
    one = m.integrate(x0s[0], us[0])
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(one),
                               rtol=1e-9, atol=1e-12)
    # fwd-mode Jacobian agrees with the fixed-step map's (same flow)
    j_adapt = jax.jacfwd(lambda x: m.integrate(x, us[0]))(x0s[0])
    m_fixed = Model(Nx=2, Nu=1, ode=pend_ode, dt=0.05,
                    integrator_substeps=40, dtype=jnp.float64)
    j_fixed = jax.jacfwd(lambda x: m_fixed.integrate(x, us[0]))(x0s[0])
    np.testing.assert_allclose(np.asarray(j_adapt), np.asarray(j_fixed),
                               atol=1e-6)


def test_adaptive_matches_native_host_integrator():
    """Device DOPRI5 vs the first-party C++ DOPRI5 (same tableau)."""
    import pytest
    from gpmpc_tpu import native
    try:
        native._load()
    except Exception as e:  # pragma: no cover - no compiler in env
        pytest.skip(f"native integrator unavailable: {e}")
    m = Model(Nx=2, Nu=1, ode=pend_ode, dt=0.05, integrator="adaptive",
              rtol=1e-10, atol=1e-13, dtype=jnp.float64)
    x0 = np.array([0.4, -0.2])
    u = np.array([0.3])
    got_dev = np.asarray(m.integrate(jnp.array(x0), jnp.array(u)))
    got_host = native.integrate(
        x0, u, m.dt, ode=lambda x, uu: np.array(
            [x[1], -9.81 * np.sin(x[0]) - 0.2 * x[1] + uu[0]]),
        rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(got_dev, got_host, atol=1e-9)


def test_clip_negative():
    def tank_ode(x, u):
        return -jnp.sqrt(jnp.maximum(x, 1e-9)) + u

    m = Model(Nx=1, Nu=1, ode=tank_ode, dt=0.5, R=0.05 * np.eye(1),
              clip_negative=True, dtype=jnp.float64)
    X, Y = m.generate_training_data(200, uub=[0.1], ulb=[0.0],
                                    xub=[0.2], xlb=[0.0],
                                    key=jax.random.PRNGKey(1))
    assert np.all(np.asarray(Y) >= 0.0)


def test_planar_quadrotor_hover_equilibrium():
    """PVTOL plant (third plant family): level attitude with each rotor at
    m*g/2 is an equilibrium; jacfwd linearization at hover has the textbook
    structure (gravity tilt coupling -g into v_x-dot from theta)."""
    from gpmpc_tpu.systems import QUAD_PARAMS, planar_quadrotor_ode

    p = QUAD_PARAMS
    hover_u = jnp.array([p["m"] * p["g"] / 2.0] * 2)
    x_eq = jnp.zeros(6)
    dx = np.asarray(planar_quadrotor_ode(x_eq, hover_u))
    np.testing.assert_allclose(dx, np.zeros(6), atol=1e-12)

    a = np.asarray(jax.jacfwd(
        lambda x: planar_quadrotor_ode(x, hover_u))(x_eq))
    # kinematic identity rows
    np.testing.assert_allclose(a[0, 3], 1.0)
    np.testing.assert_allclose(a[1, 4], 1.0)
    np.testing.assert_allclose(a[2, 5], 1.0)
    # tilt couples gravity into horizontal acceleration
    np.testing.assert_allclose(a[3, 2], -p["g"], rtol=1e-12)
    # differential thrust drives the attitude
    b = np.asarray(jax.jacfwd(
        lambda u: planar_quadrotor_ode(x_eq, u))(hover_u))
    np.testing.assert_allclose(b[5, 0], p["l"] / p["J"], rtol=1e-12)
    np.testing.assert_allclose(b[5, 1], -p["l"] / p["J"], rtol=1e-12)
