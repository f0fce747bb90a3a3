"""Soft constraints: lam_state (state boxes) and lam (general/user
constraints + terminal constraint) [SURVEY C6 'slack penalties
lam/lam_state for soft constraints']."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu import MPC, Model
from gpmpc_tpu.systems import four_tank_ode

# every test is a compiled receding-horizon closed loop.
pytestmark = pytest.mark.slow

DT = 3.0


@pytest.fixture(scope="module")
def model():
    return Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                 R=np.diag([1e-3] * 4), clip_negative=True,
                 dtype=jnp.float64, integrator_substeps=10)


def _mpc(model, **kw):
    return MPC(horizon=5 * DT, model=model, gp=None, discrete_method="rk4",
               Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
               ulb=[0.0, 0.0], uub=[8.0, 8.0],
               xlb=[0.5, 0.5, 0.1, 0.1], xub=[25.0, 25.0, 8.0, 8.0],
               feedback=False, percentile=None, cov_updates=1, **kw)


def test_soft_recovers_from_infeasible_start(model):
    """Start OUTSIDE the state box: the soft controller must run cleanly
    (no hard-constraint fight at an unmovable x0) and recover into the box."""
    mpc = _mpc(model, lam_state=100.0)
    x0 = np.array([30.0, 9.0, 1.0, 1.0])  # h1 above xub=25
    xs, us = mpc.solve(x0=x0, sim_time=12 * DT,
                       x_sp=np.array([12.4, 12.7, 1.8, 1.4]), noise=False)
    xs = np.asarray(xs)
    assert np.all(np.isfinite(xs))
    assert xs[-1, 0] < 25.0, "did not recover into the box"
    # steadily drains toward the setpoint (tank physics bound the rate)
    assert xs[-1, 0] < xs[0, 0] - 10.0


def test_soft_and_hard_agree_when_inactive(model):
    """Away from the bounds, soft and hard formulations give the same
    closed loop."""
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    xs_hard, _ = _mpc(model).solve(x0=x0, sim_time=8 * DT, x_sp=x_sp,
                                   noise=False)
    xs_soft, _ = _mpc(model, lam_state=1e3).solve(x0=x0, sim_time=8 * DT,
                                                  x_sp=x_sp, noise=False)
    np.testing.assert_allclose(np.asarray(xs_hard), np.asarray(xs_soft),
                               atol=1e-3)


# ---------------------------------------------------------------- lam (user)

def _h1_cap(x, cov, u, par):
    """User inequality: h1 <= par[0] (g <= 0 convention)."""
    return jnp.array([x[0] - par[0]])


def _mpc_user(model, **kw):
    return MPC(horizon=5 * DT, model=model, gp=None, discrete_method="rk4",
               Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
               ulb=[0.0, 0.0], uub=[8.0, 8.0],
               feedback=False, percentile=None, cov_updates=1,
               inequality_constraints=_h1_cap, num_con_par=1, **kw)


def test_lam_softens_infeasible_user_constraint(model):
    """x0 violates the user constraint (h1 <= 20 with h1(0) = 30): the
    lam-soft controller runs cleanly and drains below the cap; the general
    slack-penalty capability the reference exposes as ``lam`` [SURVEY C6]."""
    mpc = _mpc_user(model, lam=100.0)
    x0 = np.array([30.0, 9.0, 1.0, 1.0])
    xs, us = mpc.solve(x0=x0, sim_time=12 * DT,
                       x_sp=np.array([12.4, 12.7, 1.8, 1.4]), noise=False,
                       con_par_func=lambda k: np.array([20.0]))
    xs = np.asarray(xs)
    assert np.all(np.isfinite(xs))
    assert xs[-1, 0] < 20.0, "did not recover below the user cap"
    assert xs[-1, 0] < xs[0, 0] - 10.0


def test_lam_soft_and_hard_agree_when_inactive(model):
    """With the user constraint slack (cap far above the trajectory), the
    soft (lam) and hard (AL) formulations give the same closed loop."""
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    cp = lambda k: np.array([100.0])
    xs_hard, _ = _mpc_user(model).solve(
        x0=x0, sim_time=8 * DT, x_sp=x_sp, noise=False, con_par_func=cp)
    xs_soft, _ = _mpc_user(model, lam=1e3).solve(
        x0=x0, sim_time=8 * DT, x_sp=x_sp, noise=False, con_par_func=cp)
    np.testing.assert_allclose(np.asarray(xs_hard), np.asarray(xs_soft),
                               atol=1e-3)


def test_lam_binds_active_user_constraint(model):
    """Setpoint ABOVE the cap: the lam-penalized controller must settle
    near the cap (penalty holds the constraint ~active), not at the
    setpoint — i.e. lam actually changes behavior vs no constraint."""
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([18.0, 12.7, 1.8, 1.4])
    cap = 14.0
    mpc = _mpc_user(model, lam=1e4)
    xs, _ = mpc.solve(x0=x0, sim_time=14 * DT, x_sp=x_sp, noise=False,
                      con_par_func=lambda k: np.array([cap]))
    h1_end = float(np.asarray(xs)[-1, 0])
    assert h1_end < cap + 0.3, f"cap not enforced (h1={h1_end})"
    assert h1_end > cap - 2.0, "over-conservative: far below the cap"


def test_solve_mc_with_user_constraints(model):
    """solve_mc threads con_par_func through every Monte-Carlo lane: the
    per-step user-constraint parameters are shared across lanes, and an
    active user cap binds the whole noisy ensemble."""
    mpc = _mpc_user(model)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    cap = 12.0                               # below the h1 setpoint: binds
    xs, us = mpc.solve_mc(x0, 10 * DT, x_sp, n_mc=4,
                          key=jax.random.PRNGKey(11),
                          con_par_func=lambda k: np.array([cap]))
    xs = np.asarray(xs)
    assert xs.shape[0] == 4 and np.all(np.isfinite(xs))
    # the cap binds every lane (allow the process-noise sigma on top)
    assert xs[:, :, 0].max() < cap + 0.15, xs[:, :, 0].max()
    # lanes differ (independent noise)
    assert np.std(xs[:, -1, 0]) > 1e-5
