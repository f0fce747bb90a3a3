"""Shared builders for the golden-trajectory regression suite.

Provenance (SURVEY.md Provenance Warning): /root/reference was empty, so
goldens cannot come from running the reference.  The component math is
verified against the NumPy/SciPy oracle and scipy solvers elsewhere
(tests/oracle.py, test_solver.py); these goldens freeze full x64 closed-loop
trajectories OF THIS IMPLEMENTATION so any future refactor that changes
behavior beyond 1e-6 state error is caught (BASELINE parity bar).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.systems import four_tank_ode

DT = 3.0
X0 = np.array([8.0, 9.0, 1.0, 1.0])
XSP = np.array([12.4, 12.7, 1.8, 1.4])


def tank_model():
    return Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                 R=np.diag([1e-3] * 4), clip_negative=True,
                 dtype=jnp.float64, integrator_substeps=10)


def tank_gp(model):
    X, Y = model.generate_training_data(
        50, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(7))
    return GP(X, Y, mean_func="zero", gp_method="TA", multistart=2,
              max_iters=150, seed=5)


CONFIGS = {
    "tank_rk4_me": dict(gp_method="ME", discrete_method="rk4",
                        percentile=None, feedback=False),
    "tank_gp_ta_tight": dict(gp_method="TA", discrete_method="gp",
                             percentile=0.95, feedback=True),
    "tank_gp_em_tight": dict(gp_method="EM", discrete_method="gp",
                             percentile=0.95, feedback=True),
}


def run_config(name, model, gp):
    kw = CONFIGS[name]
    mpc = MPC(horizon=5 * DT, model=model,
              gp=gp if kw["discrete_method"] != "rk4" else None,
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.5, 0.5, 0.1, 0.1], xub=[14.0, 25.0, 8.0, 8.0],
              cov_updates=2, **kw)
    xs, us = mpc.solve(x0=X0, sim_time=8 * DT, x_sp=XSP, noise=True,
                       key=jax.random.PRNGKey(11))
    return np.asarray(xs), np.asarray(us)
