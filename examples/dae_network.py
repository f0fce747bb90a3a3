"""MPC on a semi-explicit index-1 DAE plant — the reference's ``alg``
option [SURVEY C2], end to end.

Plant: two tanks coupled through a junction node.  The junction head z is
not a state — it is determined ALGEBRAICALLY by the flow balance at the
node (what the reference hands to CVODES as the ``alg`` equation):

    inflow from tank 1:   q1  = c1 * sqrt(h1 - z)
    outflow to tank 2:    q12 = c2 * sqrt(z - h2)
    leak to ambient:      qL  = c3 * sqrt(z)
    node balance:         0   = q1 - q12 - qL          (solves for z)

    h1' = (u - q1) / A1,      h2' = (q12 - c4 sqrt(h2)) / A2

``Model(alg=...)`` eliminates z pointwise with an on-device Newton solve;
derivatives flow through by the implicit function theorem, so the SAME
reduced ODE serves the plant integrator, the RK4 map embedded in the MPC
NLP, and its linearizations — no special-casing anywhere downstream.

The controller tracks a level setpoint on tank 2 through the nonlinear
junction, with input and level box constraints.  Self-checking: the loop
must converge to the setpoint and the algebraic residual along the closed
trajectory must stay at Newton tolerance.

Usage:  python examples/dae_network.py [--quick] [--tpu]
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

A1, A2 = 2.0, 3.0
C1, C2, C3, C4 = 1.2, 1.0, 0.25, 0.6


def _sq(x):
    """sqrt clamped at a small positive floor (flows vanish smoothly as
    heads equalize; keeps the Newton iteration and AD well-defined)."""
    return jnp.sqrt(jnp.maximum(x, 1e-9))


def dae_ode(x, z, u):
    h1, h2 = x[0], x[1]
    zh = z[0]
    q1 = C1 * _sq(h1 - zh)
    q12 = C2 * _sq(zh - h2)
    return jnp.stack([(u[0] - q1) / A1,
                      (q12 - C4 * _sq(h2)) / A2])


def dae_alg(x, z, u):
    h1, h2 = x[0], x[1]
    zh = z[0]
    return jnp.stack([C1 * _sq(h1 - zh) - C2 * _sq(zh - h2) - C3 * _sq(zh)])


def main(quick: bool = False, use_tpu: bool = False):
    _configure_backend(use_tpu)
    from gpmpc_tpu import MPC, Model

    dtype = jnp.float32 if use_tpu else jnp.float64
    dt = 2.0
    model = Model(Nx=2, Nu=1, ode=dae_ode, alg=dae_alg, Nz=1,
                  z_guess=lambda x, u: 0.5 * (x[:1] + x[1:]),
                  alg_newton_iters=12,
                  dt=dt, R=np.diag([1e-5, 1e-5]), clip_negative=True,
                  dtype=dtype, integrator_substeps=20)

    x0 = np.array([6.0, 1.0])
    x_sp = np.array([5.0, 2.5])     # track tank-2 level through the node
    n_steps = 12 if quick else 30
    mpc = MPC(horizon=6 * dt, model=model, gp=None, discrete_method="rk4",
              Q=np.diag([0.05, 10.0]), R=0.05 * np.eye(1),
              ulb=[0.0], uub=[4.0], xlb=[0.2, 0.2], xub=[12.0, 8.0],
              feedback=False, percentile=None, cov_updates=1, dtype=dtype)

    t0 = time.perf_counter()
    xs, us = mpc.solve(x0=x0, sim_time=n_steps * dt, x_sp=x_sp, noise=False)
    wall = time.perf_counter() - t0
    xs, us = np.asarray(xs), np.asarray(us)

    # self-checks: setpoint reached; the algebraic constraint is satisfied
    # along the realized closed loop (the Newton elimination actually
    # solved the node balance, not just produced numbers)
    err = abs(float(xs[-1, 1]) - x_sp[1])
    res = []
    for k in range(len(us)):
        xk = jnp.asarray(xs[k], dtype)
        uk = jnp.asarray(us[k], dtype)
        zk = model.solve_alg(xk, uk)
        res.append(abs(float(dae_alg(xk, zk, uk)[0])))
    max_res = max(res)
    print(f"DAE network MPC: wall={wall:.1f}s  final h2={xs[-1, 1]:.3f} "
          f"(setpoint {x_sp[1]})  |err|={err:.4f}  "
          f"max alg residual={max_res:.2e}")
    assert np.all(np.isfinite(xs))
    assert err < 0.05, "did not reach the tank-2 setpoint"
    assert max_res < 1e-6, "algebraic node balance violated"

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    t = np.arange(xs.shape[0]) * dt
    fig, axes = plt.subplots(3, 1, sharex=True, figsize=(8, 6))
    axes[0].plot(t, xs[:, 0], label="h1")
    axes[0].set_ylabel("h1")
    axes[1].plot(t, xs[:, 1], label="h2")
    axes[1].axhline(x_sp[1], ls=":", c="g")
    axes[1].set_ylabel("h2 (controlled)")
    zs = [float(model.solve_alg(jnp.asarray(xs[k], dtype),
                                jnp.asarray(us[k], dtype))[0])
          for k in range(len(us))]
    axes[2].plot(t[:-1], zs, c="tab:orange")
    axes[2].set_ylabel("junction head z (algebraic)")
    axes[2].set_xlabel("time [s]")
    fig.suptitle("MPC on an index-1 DAE plant (algebraic junction node)")
    fig.tight_layout()
    fig.savefig("dae_network.png", dpi=120)
    print("plot written: dae_network.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    a = ap.parse_args()
    main(quick=a.quick, use_tpu=a.tpu)
