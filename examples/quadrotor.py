"""Planar-quadrotor hybrid GP-MPC under parametric model mismatch.

Third plant family (beyond the reference's tank [SURVEY C7] and car
[SURVEY C8]): a PVTOL quadrotor whose TRUE mass is 30% above the nominal
model's.  The nominal-model controller plans its hover thrust for the
wrong gravity balance and droops below the waypoint; the hybrid
controller (``discrete_method='hybrid'`` — nominal RK4 step + GP trained
on observed one-step residuals [SURVEY C6 'hybrid']) learns the missing
dynamics and closes the gap.

Unlike the other examples, the plant here is NOT the controller's model
(that is the whole point), so the loop drives the true plant externally
through ``mpc.solve_step`` — the interface a real vehicle would use.

Self-checks: the hybrid controller's settled altitude error is several
times smaller than the nominal controller's, both loops stay finite, and
thrusts respect the rotor limits.

Usage:  python examples/quadrotor.py [--quick] [--tpu]
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


def main(quick: bool = False, use_tpu: bool = False):
    _configure_backend(use_tpu)
    from gpmpc_tpu import GP, MPC, Model
    from gpmpc_tpu.systems import QUAD_PARAMS, planar_quadrotor_ode

    dtype = jnp.float32 if use_tpu else jnp.float64
    dt = 0.05
    p_true = dict(QUAD_PARAMS, m=1.3)        # the real vehicle is heavier

    nominal = Model(Nx=6, Nu=2, ode=lambda x, u: planar_quadrotor_ode(x, u),
                    dt=dt, R=np.diag([1e-8] * 6), dtype=dtype,
                    integrator_substeps=4)
    plant = Model(Nx=6, Nu=2,
                  ode=lambda x, u: planar_quadrotor_ode(x, u, p_true),
                  dt=dt, R=np.diag([1e-8] * 6), dtype=dtype,
                  integrator_substeps=4)

    # residual data: observed true one-step transitions minus the nominal
    # RK4 prediction, over the hover/transit envelope
    n_train = 60 if quick else 120
    key = jax.random.PRNGKey(0)
    kx, ku = jax.random.split(key)
    x_lo = np.array([-2.0, 0.0, -0.4, -1.5, -1.5, -1.0])
    x_hi = np.array([3.0, 3.0, 0.4, 1.5, 1.5, 1.0])
    xs = jax.random.uniform(kx, (n_train, 6), minval=x_lo, maxval=x_hi,
                            dtype=dtype)
    us = jax.random.uniform(ku, (n_train, 2), minval=2.0, maxval=9.0,
                            dtype=dtype)
    resid = (jax.vmap(plant.integrate)(xs, us)
             - jax.vmap(nominal.rk4)(xs, us))
    gp = GP(jnp.concatenate([xs, us], axis=1), resid, mean_func="zero",
            gp_method="TA", multistart=2, max_iters=150, seed=1)

    x0 = np.array([0.0, 1.0, 0.0, 0.0, 0.0, 0.0])     # hover at (0, 1)
    x_sp = np.array([1.5, 2.0, 0.0, 0.0, 0.0, 0.0])   # waypoint (1.5, 2)
    n_steps = 30 if quick else 60
    u_lb, u_ub = np.array([0.0, 0.0]), np.array([10.0, 10.0])
    q_w = np.diag([10.0, 30.0, 2.0, 1.0, 1.0, 0.2])
    r_w = 0.02 * np.eye(2)

    def run(discrete_method):
        mpc = MPC(horizon=15 * dt, model=nominal,
                  gp=gp if discrete_method == "hybrid" else None,
                  gp_method="TA" if discrete_method == "hybrid" else "ME",
                  discrete_method=discrete_method,
                  Q=q_w, R=r_w, ulb=u_lb, uub=u_ub,
                  xlb=[-5.0, 0.2, -1.0, -5.0, -5.0, -6.0],
                  xub=[5.0, 5.0, 1.0, 5.0, 5.0, 6.0],
                  feedback=False, percentile=None, cov_updates=1,
                  dtype=dtype)
        # the controller's model is the (wrong) nominal one; the applied
        # input drives the TRUE plant — mpc.solve_step, the real-vehicle
        # interface
        x = jnp.asarray(x0, dtype)
        warm, u_prev = None, None
        traj, inputs = [np.asarray(x)], []
        t0 = time.perf_counter()
        for _ in range(n_steps):
            u0, warm, _, _ = mpc.solve_step(x, x_sp, warm=warm,
                                            u_prev=u_prev)
            u_prev = u0
            x = plant.integrate(x, u0)
            traj.append(np.asarray(x))
            inputs.append(np.asarray(u0))
        wall = time.perf_counter() - t0
        return np.stack(traj), np.stack(inputs), wall

    xs_nom, us_nom, wall_n = run("rk4")
    xs_hyb, us_hyb, wall_h = run("hybrid")

    tail = slice(-max(n_steps // 3, 5), None)
    err_nom = float(np.abs(xs_nom[tail, 1] - x_sp[1]).mean())
    err_hyb = float(np.abs(xs_hyb[tail, 1] - x_sp[1]).mean())
    print(f"nominal model (mass -23% wrong): settled |z err|={err_nom:.3f} m"
          f"  wall={wall_n:.1f}s")
    print(f"hybrid GP residuals           : settled |z err|={err_hyb:.3f} m"
          f"  wall={wall_h:.1f}s")
    assert np.all(np.isfinite(xs_hyb)) and np.all(np.isfinite(xs_nom))
    assert us_hyb.min() >= -1e-6 and us_hyb.max() <= 10.0 + 1e-6
    assert err_hyb < 0.5 * err_nom, (err_hyb, err_nom)
    assert err_hyb < 0.1, err_hyb

    # altitude tracking plot: the droop and its correction
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    t = np.arange(xs_nom.shape[0]) * dt
    fig, axes = plt.subplots(2, 1, sharex=True, figsize=(8, 5))
    for ax, idx, name in ((axes[0], 1, "z [m]"), (axes[1], 0, "x [m]")):
        ax.plot(t, xs_nom[:, idx], c="tab:red", label="nominal model")
        ax.plot(t, xs_hyb[:, idx], c="tab:blue", label="hybrid GP")
        ax.axhline(x_sp[idx], ls=":", c="g", lw=0.9, label="waypoint")
        ax.set_ylabel(name)
        ax.legend(loc="lower right", fontsize=8)
    axes[-1].set_xlabel("time [s]")
    fig.suptitle("Planar quadrotor: hybrid GP corrects a 30% mass mismatch")
    fig.tight_layout()
    fig.savefig("quadrotor.png", dpi=120)
    print("plot written: quadrotor.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    main(quick=args.quick, use_tpu=args.tpu)
