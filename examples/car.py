"""Car GP-MPC demo with obstacle avoidance — SURVEY C8 / BASELINE config 4.

Kinematic bicycle car, hybrid dynamics (known model + GP residuals), exact
moment matching, chance constraints, and ellipse obstacle keep-out zones
injected through the inequality-constraint hook with per-solve runtime
parameters (``num_con_par`` / ``con_par_func`` [SURVEY C6/C8]).

Usage:  python examples/car.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# NOTE: in this image the JAX_PLATFORMS env var is not honored; the platform
# must be pinned via jax.config before first backend use.  Examples default
# to CPU + x64 (the parity-grade path); pass --tpu for the f32 device path.
def _configure_backend(use_tpu: bool):
    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.systems import car_ode, ellipse_obstacle_constraints


def main(quick: bool = False, use_tpu: bool = False):
    _configure_backend(use_tpu)
    dtype = jnp.float32 if use_tpu else jnp.float64
    dt = 0.1
    model = Model(Nx=4, Nu=2, ode=lambda x, u: car_ode(x, u), dt=dt,
                  R=np.diag([1e-5, 1e-5, 1e-6, 1e-5]),
                  dtype=dtype, integrator_substeps=10)

    # GP learns the one-step *residual* between an intentionally coarse
    # model (single large RK4 step) and the true plant — hybrid mode
    # [SURVEY C6 'hybrid', C8]
    n_train = 40 if quick else 80
    key = jax.random.PRNGKey(4)
    kx, ku = jax.random.split(key)
    x_lb = np.array([-1.0, -1.0, -0.6, 0.0])
    x_ub = np.array([1.0, 1.0, 0.6, 8.0])
    u_lb = np.array([-3.0, -0.5])
    u_ub = np.array([3.0, 0.5])
    x_s = jax.random.uniform(kx, (n_train, 4), minval=x_lb, maxval=x_ub,
                             dtype=dtype)
    u_s = jax.random.uniform(ku, (n_train, 2), minval=u_lb, maxval=u_ub,
                             dtype=dtype)
    true_next = jax.vmap(model.integrate)(x_s, u_s)
    crude_next = jax.vmap(model.rk4)(x_s, u_s)
    resid = true_next - crude_next
    Z = jnp.concatenate([x_s, u_s], axis=1)
    gp = GP(Z, resid, mean_func="zero", gp_method="EM",
            multistart=2, max_iters=200, seed=3)

    # two static obstacle ellipses between start and goal
    obstacles = np.array([
        [6.0, 0.3, 1.5, 1.0],
        [12.0, -0.6, 1.5, 1.2],
    ])
    n_obs = obstacles.shape[0]
    ineq_cb, n_par = ellipse_obstacle_constraints(n_obs, scale=2.0)

    def con_par_func(k):
        return obstacles.reshape(-1)

    x0 = np.array([0.0, 0.0, 0.0, 2.0])
    x_sp = np.array([18.0, 0.0, 0.0, 2.0])
    horizon = (8 if quick else 20) * dt
    mpc = MPC(horizon=horizon, model=model, gp=gp,
              gp_method="EM", discrete_method="hybrid",
              Q=np.diag([5.0, 20.0, 0.5, 1.0]), R=np.diag([0.1, 1.0]),
              S=np.diag([0.05, 0.5]),
              ulb=u_lb, uub=u_ub,
              xlb=[-5.0, -4.0, -2.0, 0.0], xub=[25.0, 4.0, 2.0, 10.0],
              percentile=0.95, feedback=True,
              # feedback gain linearized at the cruise speed: at v=0 the
              # position modes are uncontrollable and the LQR Riccati
              # iteration cannot converge
              op_x=x0,
              inequality_constraints=ineq_cb, num_con_par=n_par,
              cov_updates=2)

    sim_time = (20 if quick else 100) * dt
    t0 = time.perf_counter()
    xs, us = mpc.solve(x0=x0, sim_time=sim_time, x_sp=x_sp,
                       con_par_func=con_par_func, key=jax.random.PRNGKey(0))
    wall = time.perf_counter() - t0
    xs = np.asarray(xs)
    r = mpc.last_run
    # obstacle clearance check
    min_clear = np.inf
    for cx, cy, rx, ry in obstacles:
        d = ((xs[:, 0] - cx) / rx) ** 2 + ((xs[:, 1] - cy) / ry) ** 2
        min_clear = min(min_clear, float(d.min()))
    print(f"car EM+hybrid: wall={wall:.2f}s "
          f"({1e3 * r['wall_time_per_step']:.1f} ms/step incl. compile) "
          f"final pos=({xs[-1, 0]:.2f},{xs[-1, 1]:.2f}) "
          f"min obstacle metric={min_clear:.2f} (>1 means outside) "
          f"converged={int(r['converged'].sum())}/{len(us)}")
    mpc.plot(filename="car_states.png")

    # trajectory plot with obstacles
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(9, 4))
    ax.plot(xs[:, 0], xs[:, 1], "-o", ms=2, label="closed-loop path")
    for cx, cy, rx, ry in obstacles:
        ax.add_patch(plt.matplotlib.patches.Ellipse(
            (cx, cy), 2 * rx, 2 * ry, fill=True, alpha=0.3, color="r"))
    ax.plot(*x_sp[:2], "g*", ms=14, label="goal")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig("car_trajectory.png", dpi=120)
    print("plots written: car_states.png, car_trajectory.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (f32) instead of CPU (f64)")
    a = ap.parse_args()
    main(a.quick, a.tpu)
