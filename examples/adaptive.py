"""Adaptive GP-MPC under plant/model mismatch — beyond-reference capability.

The reference GP is frozen after construction [SURVEY C5 'no
online/streaming conditioning']; ``MPC(online_capacity=N)`` removes that
limitation: the closed loop conditions its GP posterior on every observed
transition (bordered-inverse updates with a novelty gate —
``gpmpc_tpu.parallel.online_gp``), entirely on device inside the fused
``lax.scan``.

Scenario: the four-tank controller is trained on a COVERAGE-STARVED prior —
transitions sampled only from a low-level corner of the state space — while
the setpoint lies far outside it.  The frozen-GP controller must act on pure
extrapolation; the adaptive controller learns the territory as it crosses
it.  The script runs both and prints their realized closed-loop costs and
terminal tracking errors (the adaptive one must win — self-checking, like
the other examples).

Usage:  python examples/adaptive.py [--quick] [--tpu]
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
    from gpmpc_tpu.systems import four_tank_ode

    dtype = jnp.float32 if use_tpu else jnp.float64
    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-4] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=10)

    # starved prior: data only from the low-level corner (h <= 5), setpoint
    # at h ~ 12.4 — far outside the training coverage
    X, Y = model.generate_training_data(
        25, uub=[2.5, 2.5], ulb=[0.0, 0.0],
        xub=[5.0, 5.0, 2.0, 2.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(3))
    gp = GP(X, Y, multistart=2, max_iters=150, seed=1)

    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    n_steps = 15 if quick else 40
    q_w = np.diag([10.0, 10.0, 0.1, 0.1])
    r_w = 0.01 * np.eye(2)

    def run(online):
        mpc = MPC(horizon=5 * dt, model=model, gp=gp, gp_method="ME",
                  discrete_method="gp", Q=q_w, R=r_w,
                  ulb=[0.0, 0.0], uub=[8.0, 8.0],
                  feedback=False, percentile=None, cov_updates=1,
                  online_capacity=64 if online else None, dtype=dtype)
        t0 = time.perf_counter()
        xs, us = mpc.solve(x0=x0, sim_time=n_steps * dt, x_sp=x_sp,
                           noise=True, key=jax.random.PRNGKey(5))
        wall = time.perf_counter() - t0
        xs, us = np.asarray(xs), np.asarray(us)
        ex = xs[:-1] - x_sp
        cost = float(np.einsum("ti,ij,tj->", ex, q_w, ex)
                     + np.einsum("ti,ij,tj->", us, r_w, us))
        return xs, cost, wall, mpc

    xs_frozen, cost_frozen, wall_f, _ = run(online=False)
    xs_online, cost_online, wall_o, mpc_o = run(online=True)

    tail = min(10, n_steps // 2)
    err_f = float(np.abs(xs_frozen[-tail:, :2] - x_sp[:2]).mean())
    err_o = float(np.abs(xs_online[-tail:, :2] - x_sp[:2]).mean())
    pts = mpc_o.last_run["gp_points"]
    print(f"frozen GP : closed-loop cost={cost_frozen:9.1f}  "
          f"tail |err|={err_f:.3f}  wall={wall_f:.1f}s")
    print(f"adaptive  : closed-loop cost={cost_online:9.1f}  "
          f"tail |err|={err_o:.3f}  wall={wall_o:.1f}s  "
          f"(GP grew 25 -> {pts} points online)")
    assert np.isfinite(xs_online).all()
    assert pts > 25, "online conditioning accumulated no data"
    assert cost_online < cost_frozen, \
        "adaptive controller did not beat the frozen one"

    # side-by-side tracking plot
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    t = np.arange(xs_frozen.shape[0]) * dt
    fig, axes = plt.subplots(2, 1, sharex=True, figsize=(8, 5))
    for i, ax in enumerate(axes):
        ax.plot(t, xs_frozen[:, i], c="tab:red", label="frozen GP")
        ax.plot(t, xs_online[:, i], c="tab:blue", label="adaptive GP")
        ax.axhline(x_sp[i], ls=":", c="g", lw=0.9, label="setpoint")
        ax.set_ylabel(f"h{i + 1} [cm]")
        ax.legend(loc="lower right", fontsize=8)
    axes[-1].set_xlabel("time [s]")
    fig.suptitle("Adaptive GP-MPC under a coverage-starved prior")
    fig.tight_layout()
    fig.savefig("adaptive_tracking.png", dpi=120)
    print("plot written: adaptive_tracking.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    a = ap.parse_args()
    main(quick=a.quick, use_tpu=a.tpu)
