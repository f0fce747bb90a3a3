"""Torque-limited pendulum swing-up with the saturating cost — the PILCO
benchmark shape [SURVEY C6 ``costFunc='sat'``].

A pendulum with gravity torque m*g*l = 9.81 N·m and an actuator limited to
|u| <= 5 N·m cannot be lifted quasi-statically: the controller must pump
energy and swing through.  The expected *saturating* cost
E[1 - exp(-1/2 ||x - x_sp||^2_W)] (PILCO's cost, C6) is what makes this
work with a quadratic-solver MPC — far from the target it saturates to ~1
and the optimizer focuses on reaching the basin rather than fighting the
distant quadratic.

The dynamics are learned: a GP on the one-step residual between a coarse
RK4 map and the true plant (``discrete_method='hybrid'``), trained from
random transitions — no pendulum parameters reach the controller.

Usage:  python examples/pendulum.py [--quick] [--tpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def _configure_backend(use_tpu: bool):
    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


import numpy as np
import jax.numpy as jnp


def pendulum_ode(x, u, m=1.0, l=1.0, b=0.10, g=9.81):
    """theta'' = (u - b w - m g l sin(theta)) / (m l^2); theta=0 hanging,
    theta=pi upright."""
    th, w = x[0], x[1]
    return jnp.stack([w, (u[0] - b * w - m * g * l * jnp.sin(th)) / (m * l * l)])


def main(quick: bool = False, use_tpu: bool = False):
    _configure_backend(use_tpu)
    from gpmpc_tpu import GP, MPC, Model

    dtype = jnp.float32 if use_tpu else jnp.float64
    dt = 0.1
    model = Model(Nx=2, Nu=1, ode=pendulum_ode, dt=dt,
                  R=np.diag([1e-6, 1e-5]), dtype=dtype,
                  integrator_substeps=10)

    # hybrid: GP learns the residual between one coarse RK4 step and the
    # true plant, from uniformly random transitions over the swing envelope
    n_train = 60 if quick else 120
    kx, ku = jax.random.split(jax.random.PRNGKey(7))
    x_lb = np.array([-2.0 * np.pi, -9.0])
    x_ub = np.array([2.0 * np.pi, 9.0])
    u_max = 5.0
    x_s = jax.random.uniform(kx, (n_train, 2), minval=x_lb, maxval=x_ub,
                             dtype=dtype)
    u_s = jax.random.uniform(ku, (n_train, 1), minval=-u_max, maxval=u_max,
                             dtype=dtype)
    resid = jax.vmap(model.integrate)(x_s, u_s) - jax.vmap(model.rk4)(x_s, u_s)
    Z = jnp.concatenate([x_s, u_s], axis=1)
    gp = GP(Z, resid, mean_func="zero", gp_method="TA",
            multistart=2, max_iters=150, seed=5)

    x0 = np.array([0.0, 0.0])            # hanging at rest
    x_sp = np.array([np.pi, 0.0])        # upright
    horizon = (20 if quick else 25) * dt
    mpc = MPC(horizon=horizon, model=model, gp=gp,
              gp_method="TA", discrete_method="hybrid",
              costFunc="sat",
              # sat-cost width: ~1 rad / ~2 rad/s basin
              Q=np.diag([1.0, 0.25]), P=np.diag([2.0, 0.5]),
              R=1e-3 * np.eye(1),
              ulb=[-u_max], uub=[u_max],
              percentile=None, feedback=False,
              solver_opts=dict(al_iters=2, max_iters=8),
              cov_updates=1, dtype=dtype)

    sim_time = (45 if quick else 60) * dt
    t0 = time.perf_counter()
    xs, us = mpc.solve(x0=x0, sim_time=sim_time, x_sp=x_sp, noise=False)
    wall = time.perf_counter() - t0
    xs, us = np.asarray(xs), np.asarray(us)
    r = mpc.last_run
    final_err = abs(((xs[-1, 0] - np.pi) + np.pi) % (2 * np.pi) - np.pi)
    print(f"pendulum sat-cost swing-up: wall={wall:.2f}s "
          f"({1e3 * r['wall_time_per_step']:.1f} ms/step incl. compile) "
          f"final theta={xs[-1, 0]:.3f} (target pi={np.pi:.3f}) "
          f"|angle err|={final_err:.3f} rad  max|u|={np.abs(us).max():.2f} "
          f"(limit {u_max})")
    assert np.abs(us).max() <= u_max + 1e-6
    # self-check: actually upright (quick mode is still settling at the end
    # of its shorter sim, hence the looser bound)
    assert final_err < (0.35 if quick else 0.1), \
        f"swing-up failed: |angle err|={final_err:.3f} rad"
    mpc.plot(filename="pendulum_states.png")
    print("plot written: pendulum_states.png")
    return final_err


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    a = ap.parse_args()
    main(a.quick, a.tpu)
