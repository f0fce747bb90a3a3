"""Empirical chance-constraint audit — beyond-reference capability.

The reference tightens state bounds by ``Phi^{-1}(percentile) * sqrt(diag
Sigma)`` and never checks what that buys on the realized closed loop
[SURVEY C6 'chance-constraint tightening'; §4 'no test suite'].  Here the
check is cheap: ``MPC.solve_mc`` runs a whole Monte-Carlo ensemble of noisy
closed loops as ONE vmapped XLA program, and
``gpmpc_tpu.utils.calibration.chance_calibration`` compares the realized
violation frequency of the ORIGINAL bounds against the design risk
``alpha = 1 - percentile``.

Scenario: the tank-1 upper bound sits within one noise sigma of the
setpoint.  The untightened controller optimizes straight to the setpoint
and rides the bound — crossing it on a large fraction of steps — while the
percentile=0.95 controller backs off by the propagated-uncertainty margin
and keeps the realized risk at the designed ~5%.  Self-checking like the
other examples: the tightened ensemble must audit as calibrated, the
untightened one must not.

Usage:  python examples/risk_audit.py [--quick] [--tpu]
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
    from gpmpc_tpu import MPC, Model
    from gpmpc_tpu.systems import four_tank_ode
    from gpmpc_tpu.utils.calibration import (chance_calibration,
                                             violation_rates)

    dtype = jnp.float32 if use_tpu else jnp.float64
    dt = 3.0
    # plant noise std on each tank is sqrt(1e-3) ~ 0.032 cm
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=10)

    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    h1_ub = float(x_sp[0]) + 0.02          # bound < 1 sigma above setpoint
    n_mc = 24 if quick else 64
    n_steps = 12 if quick else 20

    kwargs = dict(
        horizon=5 * dt, model=model, gp=None,
        discrete_method="rk4", gp_method="ME",
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0],
        xlb=[0.5, 0.5, 0.1, 0.1], xub=[h1_ub, 25.0, 8.0, 8.0],
        feedback=False, cov_updates=1, dtype=dtype)

    t0 = time.perf_counter()
    mpc_tight = MPC(percentile=0.95, **kwargs)
    report = chance_calibration(mpc_tight, x0, n_steps * dt, x_sp,
                                n_mc=n_mc, key=jax.random.PRNGKey(5))
    xs_tight = mpc_tight.last_mc["x_sim"]

    mpc_plain = MPC(percentile=None, **kwargs)
    xs_plain, _ = mpc_plain.solve_mc(x0, n_steps * dt, x_sp, n_mc,
                                     key=jax.random.PRNGKey(5))
    xs_plain = np.asarray(xs_plain)
    rate_p, worst_p, _ = violation_rates(xs_plain, mpc_plain.xlb,
                                         mpc_plain.xub)
    wall = time.perf_counter() - t0

    alpha, bound = report["alpha"], report["bound"]
    print(f"ensemble: {n_mc} noisy closed loops x {n_steps} steps "
          f"(one vmapped program each), wall={wall:.1f}s")
    print(f"design risk alpha = {alpha:.3f}  (percentile=0.95); audit "
          f"bound = alpha + 3 SE = {bound:.3f}")
    print(f"tightened   : h1 violation rate={report['rate'][0]:.4f}  "
          f"worst step={report['worst_step_rate'][0]:.3f}  "
          f"calibrated={report['calibrated']}")
    print(f"untightened : h1 violation rate={rate_p[0]:.4f}  "
          f"worst step={worst_p[0]:.3f}")
    assert report["calibrated"], "tightened controller failed its audit"
    assert worst_p[0] > 3 * alpha, "untightened controller should ride the " \
        "bound into violation in this scenario"

    # ensemble plot: tank-1 5-95% band + median per controller, one axis
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    t = np.arange(xs_tight.shape[1]) * dt
    fig, ax = plt.subplots(figsize=(8, 4))
    for xs, color, name in ((xs_plain, "tab:red", "untightened"),
                            (np.asarray(xs_tight), "tab:blue",
                             "tightened (p=0.95)")):
        lo, med, hi = np.percentile(xs[:, :, 0], [5, 50, 95], axis=0)
        ax.fill_between(t, lo, hi, color=color, alpha=0.18, lw=0)
        ax.plot(t, med, c=color, lw=2, label=f"{name} median (5-95% band)")
    ax.axhline(h1_ub, ls="--", c="k", lw=1.2, label="state bound")
    ax.axhline(x_sp[0], ls=":", c="g", lw=0.9, label="setpoint")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("h1 [cm]")
    # zoom on the bound region — the whole story is the last 0.2 cm (the
    # rise transient clips out of frame)
    ax.set_ylim(x_sp[0] - 0.2, h1_ub + 0.08)
    ax.legend(loc="lower right", fontsize=8)
    fig.suptitle("Chance-constraint audit: realized tank-1 ensembles")
    fig.tight_layout()
    fig.savefig("risk_audit.png", dpi=120)
    print("plot written: risk_audit.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    main(quick=args.quick, use_tpu=args.tpu)
