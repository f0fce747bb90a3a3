"""Output-feedback GP-MPC: MHE state estimation closing the loop.

The reference feeds the exact plant state back into the controller
[SURVEY C6 runtime] — a luxury real plants rarely offer.  Here the
four-tank plant exposes only NOISY measurements of the two LOWER tank
levels; the upper levels are never measured.  A moving-horizon estimator
(``gpmpc_tpu.MHE``, sharing the controller's AL-SQP/Riccati solver)
reconstructs the full state each step, and the MPC regulates from the
estimate.

Self-checks printed at the end:
  * the unmeasured upper-tank estimation error settles well below the
    measurement noise scale,
  * closed-loop cost under estimated-state feedback lands close to the
    (unrealizable) true-state-feedback run.

Usage:  python examples/output_feedback.py [--quick] [--tpu]
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


def main(quick=False, tpu=False):
    _configure_backend(tpu)
    from gpmpc_tpu import MHE, MPC, Model
    from gpmpc_tpu.systems import four_tank_ode

    dt = 3.0
    dtype = jnp.float32 if tpu else jnp.float64
    proc_q = np.diag([1e-4] * 4)
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=proc_q, clip_negative=True, dtype=dtype,
                  integrator_substeps=10)

    # -- sensing: lower tanks only, noisy ---------------------------------
    c_meas = np.array([[1.0, 0.0, 0.0, 0.0],
                       [0.0, 1.0, 0.0, 0.0]])
    r_meas = np.diag([2.5e-3, 2.5e-3])       # ~0.05 m level noise

    mhe = MHE(model, window=6 if quick else 10,
              Q_noise=proc_q, R_meas=r_meas,
              P_arrival=np.diag([0.5] * 4),
              h=lambda x: jnp.asarray(c_meas, x.dtype) @ x,
              xlb=[0.05] * 4, xub=[25.0] * 4,
              discrete_method="rk4",
              solver_opts=dict(al_iters=2, max_iters=20))

    mpc = MPC(horizon=(5 if quick else 15) * dt, model=model, gp=None,
              gp_method="ME", discrete_method="rk4",
              Q=np.diag([20.0, 20.0, 0.1, 0.1]), R=0.05 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.1, 0.1, 0.05, 0.05], xub=[16.0, 16.0, 8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1, dtype=dtype)

    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    x0_true = np.array([8.0, 9.0, 2.2, 1.7])
    x0_prior = np.array([8.0, 9.0, 1.0, 1.0])   # upper tanks unknown
    n_steps = 12 if quick else 30
    rng = np.random.default_rng(0)
    q_weights = np.diag([20.0, 20.0, 0.1, 0.1])

    def closed_loop(feed_estimate: bool):
        """One closed loop; feed the MPC either the MHE estimate or the
        (unrealizable baseline) true plant state."""
        x_true = x0_true.copy()
        y0 = c_meas @ x_true + rng.multivariate_normal(np.zeros(2), r_meas)
        est_state = mhe.init_filter(x0_prior, y0)
        x_hat = np.asarray(x0_prior)
        warm, u_prev = None, None
        cost = 0.0
        est_err = []
        for k in range(n_steps):
            x_feed = x_hat if feed_estimate else x_true
            u0, warm, _, _ = mpc.solve_step(x_feed, x_sp, warm=warm,
                                            u_prev=u_prev)
            u_prev = u0
            u_np = np.asarray(u0)
            cost += float((x_true - x_sp) @ q_weights @ (x_true - x_sp))
            w = rng.multivariate_normal(np.zeros(4), proc_q)
            x_true = np.asarray(model.integrate(
                jnp.asarray(x_true, dtype), u0)) + w
            x_true = np.maximum(x_true, 1e-3)
            y = c_meas @ x_true + rng.multivariate_normal(np.zeros(2),
                                                          r_meas)
            est_state, x_hat_j = mhe.step(est_state,
                                          jnp.asarray(y, dtype), u0)
            x_hat = np.asarray(x_hat_j)
            est_err.append(np.abs(x_hat - x_true))
        return cost, np.stack(est_err), x_true

    t0 = time.perf_counter()
    cost_est, est_err, x_final = closed_loop(feed_estimate=True)
    wall = time.perf_counter() - t0
    cost_true, _, _ = closed_loop(feed_estimate=False)

    tail = est_err[n_steps // 2:]
    print(f"output-feedback GP-MPC: wall={wall:.2f}s "
          f"({1e3 * wall / n_steps:.1f} ms/step incl. compile)")
    print(f"  final levels {np.round(x_final, 2)} (setpoint "
          f"{np.round(x_sp, 2)})")
    print(f"  unmeasured upper-tank |err| (settled): "
          f"max={tail[:, 2:].max():.3f} mean={tail[:, 2:].mean():.3f}")
    print(f"  closed-loop cost: estimate-fed={cost_est:.1f}  "
          f"true-state-fed={cost_true:.1f}  "
          f"ratio={cost_est / cost_true:.3f}")

    assert np.all(np.isfinite(est_err))
    assert tail[:, 2:].max() < 0.5, "upper-tank estimates did not settle"
    assert cost_est < 1.5 * cost_true, "estimate feedback cost blew up"

    # the same stack as ONE compiled program (simulation/evaluation path):
    # both NLPs and the plant step fuse into a single lax.scan, so the
    # per-step cost is device time, not n_steps x host dispatch
    from gpmpc_tpu import simulate_output_feedback
    res = simulate_output_feedback(mpc, mhe, x0_true, x0_prior,
                                   n_steps * dt, x_sp,
                                   key=jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    res = simulate_output_feedback(mpc, mhe, x0_true, x0_prior,
                                   n_steps * dt, x_sp,
                                   key=jax.random.PRNGKey(2))
    wall_fused = time.perf_counter() - t0
    e_fused = np.abs(res.x_hat - res.x_true[:-1])[n_steps // 2:, 2:]
    print(f"fused one-program variant (simulate_output_feedback): "
          f"{1e3 * wall_fused / n_steps:.1f} ms/step warm "
          f"(vs {1e3 * wall / n_steps:.1f} host-composed incl. compile); "
          f"settled upper-tank |err| mean={e_fused.mean():.3f}")
    assert np.all(np.isfinite(res.x_true))
    assert e_fused.max() < 0.5

    # plot: true vs estimated trajectories for the unmeasured tanks
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(1, 1, figsize=(7, 3.2))
        steps = np.arange(est_err.shape[0])
        ax.plot(steps, est_err[:, 2], label="|err| h3 (unmeasured)")
        ax.plot(steps, est_err[:, 3], label="|err| h4 (unmeasured)")
        ax.plot(steps, est_err[:, 0], "--", alpha=0.6,
                label="|err| h1 (measured)")
        ax.set_xlabel("control step")
        ax.set_ylabel("estimation error [m]")
        ax.legend()
        ax.set_title("MHE estimation error in closed loop")
        fig.tight_layout()
        fig.savefig("output_feedback.png", dpi=110)
        print("plot written: output_feedback.png")
    except Exception as e:  # pragma: no cover
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    a = ap.parse_args()
    main(quick=a.quick, tpu=a.tpu)
