"""Smaller parity items: mean functions in training, DAE gating, model
persistence round-trips, hyper pretty-print."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.models.mean_functions import (mean_features, mean_value,
                                             num_mean_params)


RNG = np.random.default_rng(21)


def test_mean_function_features():
    x = jnp.asarray(RNG.standard_normal((5, 3)))
    assert mean_features(x, "zero").shape == (5, 0)
    assert mean_features(x, "const").shape == (5, 1)
    assert mean_features(x, "linear").shape == (5, 4)
    assert mean_features(x, "poly").shape == (5, 7)
    w = jnp.asarray(RNG.standard_normal(4))
    np.testing.assert_allclose(
        np.asarray(mean_value(x, w, "linear")),
        np.asarray(x) @ np.asarray(w[:3]) + float(w[3]), atol=1e-12)
    with pytest.raises(ValueError):
        mean_features(x, "spline")


@pytest.mark.slow
def test_linear_mean_gp_extrapolates():
    """A GP with a linear prior mean must extrapolate a linear trend far
    outside the data, where a zero-mean GP falls back to zero
    [SURVEY C3e mean functions]."""
    x = RNG.uniform(-1, 1, size=(40, 1))
    y = (3.0 * x[:, 0] + 1.0 + 0.01 * RNG.standard_normal(40))[:, None]
    gp_lin = GP(x, y, mean_func="linear", multistart=2, max_iters=200,
                seed=0, normalize=True)
    far = jnp.asarray([4.0])
    mu_lin, _ = gp_lin.predict(far)
    assert abs(float(mu_lin[0]) - 13.0) < 0.5, float(mu_lin[0])


def test_dae_requires_nz():
    with pytest.raises(ValueError, match="Nz"):
        Model(Nx=1, Nu=1, ode=lambda x, z, u: -z, dt=0.1,
              alg=lambda x, z, u: z)


def test_dae_integrates_to_analytic_solution():
    """Semi-explicit index-1 DAE: x' = -z, 0 = z - x^2  (so x' = -x^2),
    analytic solution x(t) = x0 / (1 + x0 t)  [SURVEY C2 ``alg``]."""
    m = Model(Nx=1, Nu=1,
              ode=lambda x, z, u: -z,
              alg=lambda x, z, u: z - x * x,
              Nz=1, dt=0.5, dtype=jnp.float64, integrator_substeps=50)
    x0 = jnp.array([2.0])
    u = jnp.zeros(1)
    x1 = m.integrate(x0, u)
    analytic = 2.0 / (1.0 + 2.0 * 0.5)
    np.testing.assert_allclose(float(x1[0]), analytic, atol=1e-6)
    # algebraic solve is exact at the solution point
    z = m.solve_alg(x0, u)
    np.testing.assert_allclose(float(z[0]), 4.0, atol=1e-10)
    # linearization flows through the Newton solve (implicit function
    # theorem): d(-x^2)/dx = -2x
    a, b = m.linearize(x0, u)
    np.testing.assert_allclose(float(a[0, 0]), -4.0, atol=1e-8)


def test_dae_with_adaptive_integrator():
    """DAE elimination composes with the adaptive DOPRI5 integrator (the
    reference's CVODES handles exactly this combination [SURVEY C2/§2.2])."""
    m = Model(Nx=1, Nu=1,
              ode=lambda x, z, u: -z,
              alg=lambda x, z, u: z - x * x,
              Nz=1, dt=0.5, dtype=jnp.float64,
              integrator="adaptive", rtol=1e-9, atol=1e-12)
    x1 = m.integrate(jnp.array([2.0]), jnp.zeros(1))
    np.testing.assert_allclose(float(x1[0]), 2.0 / (1.0 + 2.0 * 0.5),
                               atol=1e-8)


@pytest.mark.slow
def test_posterior_survives_f32_conditioning_cliff():
    """Hypers from an unconstrained x64 fit (large sf2, sn2 ~ 2e-8) sit on
    an f32 conditioning cliff: the unguarded Cholesky NaN'd and the
    controller silently applied zero input (found by
    benchmarks/device_parity.py).  The guarded posterior must stay finite
    and usable (predict + linearize) in f32."""
    from gpmpc_tpu import GP
    from gpmpc_tpu.models.gp_core import GPHypers
    from gpmpc_tpu.systems import four_tank_ode

    dtype = jnp.float32
    m = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=3.0,
              R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
              integrator_substeps=5)
    X, Y = m.generate_training_data(
        100, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    ny, d = 4, 6
    hyper = GPHypers(
        log_ell=jnp.asarray(np.full((ny, d), 3.0), dtype),
        log_sf2=jnp.asarray([0.7, 1.3, 4.1, 3.7], dtype),
        log_sn2=jnp.asarray([-17.6, -17.4, -10.9, -13.0], dtype),
        mean_w=jnp.zeros((ny, 0), dtype))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", hyper=hyper,
            optimizer_opts=dict(jitter=1e-6, min_noise=1e-4))
    p = gp.post
    assert bool(jnp.isfinite(p.chol).all())
    assert bool(jnp.isfinite(p.alpha).all())
    assert bool(jnp.isfinite(p.inv_k).all())
    z = jnp.asarray([14.0, 14.0, 1.8, 1.4, 3.0, 3.0], dtype)
    mu, var = gp.predict(z[:4], z[4:])
    assert bool(jnp.isfinite(mu).all()) and bool(jnp.isfinite(var).all())
    jac = gp.linearize(z)
    assert bool(jnp.isfinite(jac).all())


def test_adaptive_integrator_poisons_on_failure():
    """The adaptive integrator must not silently return a truncated or
    uncontrolled-error state: a stiff problem it cannot resolve (error above
    tolerance even at the minimum step) yields NaN, not a plausible-looking
    wrong answer."""
    lam = 1e9
    m = Model(Nx=1, Nu=1, ode=lambda x, u: -lam * x, dt=1.0,
              dtype=jnp.float64, integrator="adaptive",
              rtol=1e-10, atol=1e-12, max_adaptive_steps=50)
    out = m.integrate(jnp.array([1.0]), jnp.zeros(1))
    assert not bool(jnp.isfinite(out).all())

    # and a resolvable problem is still integrated accurately
    m2 = Model(Nx=1, Nu=1, ode=lambda x, u: -x, dt=1.0,
               dtype=jnp.float64, integrator="adaptive",
               rtol=1e-10, atol=1e-12)
    out2 = m2.integrate(jnp.array([1.0]), jnp.zeros(1))
    np.testing.assert_allclose(float(out2[0]), np.exp(-1.0), rtol=1e-8)


def test_fused_integrator_guards():
    """fused_integrator rejects configurations that would silently break:
    x64 (kernel is f32), DAE systems (Newton elimination cannot lower),
    and the adaptive integrator (which would silently bypass the fused
    chain)."""
    import pytest
    with pytest.raises(ValueError, match="f32"):
        Model(Nx=1, Nu=1, ode=lambda x, u: -x, dt=0.1,
              dtype=jnp.float64, fused_integrator=True)
    with pytest.raises(ValueError, match="DAE"):
        Model(Nx=1, Nu=1, ode=lambda x, z, u: -z, alg=lambda x, z, u: z - x,
              Nz=1, dt=0.1, dtype=jnp.float32, fused_integrator=True)
    with pytest.raises(ValueError, match="adaptive"):
        Model(Nx=1, Nu=1, ode=lambda x, u: -x, dt=0.1, dtype=jnp.float32,
              integrator="adaptive", fused_integrator=True)


def test_fused_kkt_rejected_on_x64_mpc():
    """MPC(dtype=float64) with fused_kkt would silently run the KKT sweep
    at f32 accuracy on the parity path — must refuse at construction."""
    import pytest
    from gpmpc_tpu.systems import four_tank_ode

    m = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=3.0,
              dtype=jnp.float64)
    with pytest.raises(ValueError, match="fused_kkt"):
        MPC(horizon=9.0, model=m, gp=None, discrete_method="rk4",
            Q=np.eye(4), R=np.eye(2), feedback=False, percentile=None,
            solver_opts=dict(fused_kkt=True), dtype=jnp.float64)


def test_trajectory_reference_shape_validation():
    """A malformed (M, k != Nx) reference must be rejected, not silently
    broadcast into the stage costs."""
    import pytest
    from gpmpc_tpu.systems import four_tank_ode

    m = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=3.0,
              dtype=jnp.float64)
    mpc = MPC(horizon=9.0, model=m, gp=None, discrete_method="rk4",
              Q=np.eye(4), R=np.eye(2), feedback=False, percentile=None)
    with pytest.raises(ValueError, match="Nx"):
        mpc.solve(x0=np.ones(4), sim_time=9.0, x_sp=np.ones((10, 1)),
                  noise=False)


@pytest.mark.slow
def test_dae_plant_in_closed_loop():
    """A DAE plant drives the full MPC stack (rk4 embedding + integrate
    truth) unchanged — the algebraic elimination is below the Model API."""
    # x' = u - z, 0 = z - x^3/(1+x^2)  (a saturating nonlinear drain)
    m = Model(Nx=1, Nu=1,
              ode=lambda x, z, u: u - z,
              alg=lambda x, z, u: z - x ** 3 / (1.0 + x * x),
              Nz=1, dt=0.5, dtype=jnp.float64, integrator_substeps=20)
    from gpmpc_tpu import MPC
    mpc = MPC(horizon=4 * 0.5, model=m, gp=None, gp_method="ME",
              discrete_method="rk4", Q=np.eye(1), R=0.01 * np.eye(1),
              ulb=[-3.0], uub=[3.0], feedback=False, percentile=None,
              cov_updates=1)
    xs, us = mpc.solve(x0=np.array([0.2]), sim_time=10 * 0.5,
                       x_sp=np.array([1.5]), noise=False)
    xs = np.asarray(xs)
    assert np.isfinite(xs).all()
    assert abs(xs[-1, 0] - 1.5) < 0.05, xs[-1]


@pytest.mark.slow
def test_gp_save_load_roundtrip(tmp_path):
    x = RNG.uniform(-2, 2, size=(25, 2))
    y = np.sin(x[:, :1]) + 0.01 * RNG.standard_normal((25, 1))
    gp = GP(x, y, multistart=1, max_iters=80, seed=3)
    path = os.path.join(tmp_path, "gp_model.npz")
    gp.save_model(path)
    gp2 = GP.load_model(path)
    z = RNG.standard_normal(2)
    mu1, var1 = gp.predict(z)
    mu2, var2 = gp2.predict(z)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2),
                               atol=1e-10)
    assert gp2.get_size() == gp.get_size()


def test_print_helpers(capsys):
    x = RNG.uniform(-2, 2, size=(15, 2))
    y = np.sin(x[:, :1])
    gp = GP(x, y, multistart=1, max_iters=40, seed=0)
    gp.print_hyper_parameters()
    out = capsys.readouterr().out
    assert "GP dim 0" in out and "sf2=" in out


def test_model_predict_compare_and_plot(tmp_path):
    model = Model(Nx=2, Nu=1,
                  ode=lambda x, u: jnp.stack([x[1], -x[0] + u[0]]),
                  dt=0.1, dtype=jnp.float64)
    u_seq = jnp.zeros((20, 1))
    x_true, x_pred = model.predict_compare(
        jnp.array([1.0, 0.0]), u_seq, predictor=model.rk4)
    np.testing.assert_allclose(np.asarray(x_true), np.asarray(x_pred),
                               atol=1e-4)
    f = os.path.join(tmp_path, "cmp.png")
    model.plot_compare(x_true, x_pred, filename=f)
    assert os.path.exists(f)
