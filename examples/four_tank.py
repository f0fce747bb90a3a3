"""Four-tank GP-MPC demo — the reference's flagship example [SURVEY C7].

Canonical API sequence (SURVEY Appendix):
    Model -> generate_training_data -> GP -> MPC -> solve -> plot

Runs the BASELINE configs 2-3: mean-equivalent propagation with box
constraints, then first-order Taylor propagation with chance-constraint
tightening.  Usage:  python examples/four_tank.py [--quick]
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
from gpmpc_tpu.systems import four_tank_ode


def main(quick: bool = False, use_tpu: bool = False):
    _configure_backend(use_tpu)
    dtype = jnp.float32 if use_tpu else jnp.float64
    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True,
                  dtype=dtype, integrator_substeps=10)

    # -- training data + GP --------------------------------------------------
    n_train = 40 if quick else 100
    X, Y = model.generate_training_data(
        n_train, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    gp = GP(X, Y, mean_func="zero", gp_method="TA",
            multistart=2, max_iters=200, seed=1)
    print(f"GP training ({n_train} pts, 4 dims, 2 starts): "
          f"{time.perf_counter() - t0:.2f}s")
    gp.print_hyper_parameters()

    Xt, Yt = model.generate_training_data(
        100, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        noise=False, key=jax.random.PRNGKey(9))
    print("validation (held-out):")
    gp.validate(Xt, Yt)

    # -- MPC -----------------------------------------------------------------
    x0 = np.array([8.0, 10.0, 1.0, 1.5])
    x_sp = np.array([14.0, 14.0, 1.8, 1.4])
    horizon = (5 if quick else 20) * dt
    sim_time = (10 if quick else 30) * dt
    common = dict(
        horizon=horizon, model=model, gp=gp,
        Q=np.diag([20.0, 20.0, 0.1, 0.1]), R=0.05 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0],
        xlb=[0.5, 0.5, 0.1, 0.1], xub=[16.0, 16.0, 8.0, 8.0],
        discrete_method="gp")

    # UT (unscented sigma points) and GH (tensor Gauss-Hermite quadrature)
    # are beyond-reference schemes: UT sits between TA and EM on the
    # accuracy/cost frontier; GH is the kernel-generic full-covariance
    # scheme (converges to EM's exact SE answer with order)
    for gp_method, percentile in [("ME", None), ("TA", 0.95),
                                  ("UT", 0.95), ("EM", 0.95),
                                  ("GH", 0.95)]:
        mpc = MPC(gp_method=gp_method, percentile=percentile,
                  feedback=percentile is not None, **common)
        t0 = time.perf_counter()
        xs, us = mpc.solve(x0=x0, sim_time=sim_time, x_sp=x_sp,
                           key=jax.random.PRNGKey(0))
        wall = time.perf_counter() - t0
        r = mpc.last_run
        n_steps = len(np.asarray(us))
        cost = float(np.sum((np.asarray(xs)[:-1] - x_sp) ** 2
                            @ np.diag([20.0, 20.0, 0.1, 0.1])))
        print(f"[{gp_method:>2}] steps={n_steps} "
              f"wall={wall:.2f}s ({1e3 * r['wall_time_per_step']:.1f} ms/step "
              f"incl. compile) closed-loop cost={cost:.1f} "
              f"converged={int(r['converged'].sum())}/{n_steps} "
              f"max defect={r['defect'].max():.2e}")
        mpc.plot(filename=f"four_tank_{gp_method.lower()}.png")
    print("plots written: four_tank_{me,ta,ut,em,gh}.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small sizes for a fast smoke run")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU backend (f32) instead of CPU (f64)")
    a = ap.parse_args()
    main(a.quick, a.tpu)
