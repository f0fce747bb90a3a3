"""Native C++ RK5(4) host integrator vs scipy and the on-device RK4."""

import shutil

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ compiler")

from gpmpc_tpu import Model  # noqa: E402
from gpmpc_tpu import native  # noqa: E402
from gpmpc_tpu.systems import four_tank_ode, car_ode  # noqa: E402


def test_native_four_tank_matches_scipy():
    x0 = np.array([8.0, 9.0, 1.5, 1.2])
    u = np.array([3.0, 3.2])
    got = native.integrate(x0, u, 3.0, system="four_tank",
                           params=native.tank_params())

    def f(t, x):
        return np.asarray(four_tank_ode(jnp.asarray(x), jnp.asarray(u)))

    ref = solve_ivp(f, (0, 3.0), x0, rtol=1e-12, atol=1e-12).y[:, -1]
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)


def test_native_car_matches_scipy():
    x0 = np.array([0.0, 0.0, 0.2, 3.0])
    u = np.array([1.0, 0.3])
    got = native.integrate(x0, u, 0.5, system="car",
                           params=native.car_params())

    def f(t, x):
        return np.asarray(car_ode(jnp.asarray(x), jnp.asarray(u)))

    ref = solve_ivp(f, (0, 0.5), x0, rtol=1e-12, atol=1e-12).y[:, -1]
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_native_callback_ode():
    """Arbitrary Python ODE through the ctypes callback path."""
    def ode(x, u):
        return np.array([x[1], -x[0] + u[0]])

    x0 = np.array([1.0, 0.0])
    u = np.array([0.0])
    got = native.integrate(x0, u, 1.0, ode=ode)
    # harmonic oscillator: x(t) = cos(t)
    np.testing.assert_allclose(got, [np.cos(1.0), -np.sin(1.0)], atol=1e-9)


def test_native_sim_vs_device_rk4():
    """The fixed-step device integrator agrees with the adaptive native
    truth at its configured resolution (device-parity, SURVEY §4)."""
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=3.0,
                  dtype=jnp.float64, integrator_substeps=20)
    u_seq = np.tile([3.0, 3.0], (10, 1))
    x0 = np.array([8.0, 9.0, 1.5, 1.2])
    dev = np.asarray(model.sim(jnp.asarray(x0), jnp.asarray(u_seq)))
    nat = native.sim(x0, u_seq, 3.0, system="four_tank",
                     params=native.tank_params())
    np.testing.assert_allclose(dev, nat, atol=1e-7)
