"""Round-4 TPU numbers for the round-3c/3d capabilities (VERDICT r3 #2).

Measures on the live chip, with the K-slope/forced-sync methodology of
bench.py:

  * ``ofb``: the fused output-feedback loop (measurement -> MHE window
    solve -> MPC solve -> plant step, one lax.scan) — ms per control
    period, i.e. BOTH trajectory NLPs + plant, four-tank instance with
    2-of-4 measured states (the device_parity.py MHE problem).
  * ``mhe``: the standalone MHE filter (``MHE.run`` scan) — ms per
    measurement update at window M=4 and M=10, GP dynamics.
  * ``mc``: ``MPC.solve_mc`` Monte-Carlo ensembles — lane-solves/s at
    n_mc in {64, 256, 1024} on the bench four-tank TA controller (RTI
    budget, the chance-calibration consumer's configuration).

Usage: python benchmarks/r4_estimation_bench.py [--section ofb|mhe|mc|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks._timing import sync


def _tank(dtype=jnp.float32, fused_integrator=True):
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.systems import four_tank_ode
    from benchmarks.bench_spec import (DT, MODEL_R, TRAIN_N, TRAIN_UUB,
                                       TRAIN_ULB, TRAIN_XUB, TRAIN_XLB)
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=fused_integrator)
    X, Y = model.generate_training_data(
        TRAIN_N, uub=TRAIN_UUB, ulb=TRAIN_ULB, xub=TRAIN_XUB,
        xlb=TRAIN_XLB, key=jax.random.PRNGKey(2))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
            max_iters=100, seed=1,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))
    return model, gp


def _slope(run, k_small, k_large, reps=4, estimates=3):
    def t(k):
        sync(run(k))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(k))
            best = min(best, time.perf_counter() - t0)
        return best

    slopes = []
    for _ in range(estimates):
        slopes.append((t(k_large) - t(k_small)) / (k_large - k_small))
    return float(np.median(slopes)), [float(s) for s in slopes]


def ofb_section():
    from benchmarks.device_parity import run_ofb  # the shared OFB problem
    from gpmpc_tpu import MHE, MPC
    from gpmpc_tpu.mpc.output_feedback import simulate_output_feedback
    from benchmarks.bench_spec import X0, XSP, DT

    dtype = jnp.float32
    model, gp = _tank(dtype, fused_integrator=False)
    c = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], dtype)
    mhe = MHE(model, gp, window=4,
              Q_noise=model.R, R_meas=np.diag([2.5e-3, 2.5e-3]),
              P_arrival=np.diag([0.5] * 4), h=lambda x: c @ x,
              xlb=[0.0] * 4, discrete_method="gp", arrival_update=True,
              solver_opts=dict(fused_kkt=True))
    mpc = MPC(horizon=20 * DT, model=model, gp=gp,
              gp_method="TA", discrete_method="gp",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.5, 0.5, 0.1, 0.1], xub=[16.0, 25.0, 8.0, 8.0],
              percentile=0.95, feedback=True, cov_updates=1, op_x=XSP,
              op_u=np.array([3.0, 3.0]),
              solver_opts=dict(al_iters=2, max_iters=4, ls_steps=8,
                               penalty_init=1e3, fused_kkt=True))

    def run(k):
        return simulate_output_feedback(
            mpc, mhe, x0=X0, x_bar=np.asarray(X0) + 0.3, sim_time=k * DT,
            x_sp=XSP, noise=True, key=jax.random.PRNGKey(1)).x_true

    ms, spread = _slope(run, 30, 130)
    print(f"[ofb] MHE(M=4,gp,arrival) + MPC(N=20,TA,RTI) + plant: "
          f"{ms * 1e3:7.3f} ms/period  spread="
          f"{np.round(np.array(spread) * 1e3, 3)}", flush=True)


def mhe_section():
    from gpmpc_tpu import MHE
    from benchmarks.bench_spec import X0, DT

    dtype = jnp.float32
    model, gp = _tank(dtype, fused_integrator=False)
    c = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]], dtype)
    for m in (4, 10):
        mhe = MHE(model, gp, window=m,
                  Q_noise=model.R, R_meas=np.diag([2.5e-3, 2.5e-3]),
                  P_arrival=np.diag([0.5] * 4), h=lambda x: c @ x,
                  xlb=[0.0] * 4, discrete_method="gp", arrival_update=True,
                  solver_opts=dict(fused_kkt=True))
        key = jax.random.PRNGKey(3)
        x_bar = jnp.asarray(X0, dtype)

        def run(k, mhe=mhe, m=m):
            # k measurement updates through the scan filter
            ys = (mhe.h(x_bar)[None]
                  + 0.05 * jax.random.normal(key, (k, 2), dtype))
            us = 3.0 * jnp.ones((k - 1, 2), dtype)
            return mhe.run(x_bar, ys, us)[0]

        ms, spread = _slope(run, 30, 130)
        print(f"[mhe] window M={m:2d} (gp dynamics, arrival update): "
              f"{ms * 1e3:7.3f} ms/update  spread="
              f"{np.round(np.array(spread) * 1e3, 3)}", flush=True)


def mc_section():
    import bench as B
    from benchmarks.bench_spec import DT, X0, XSP

    dtype = jnp.float32
    model, gp = _tank(dtype, fused_integrator=False)
    mpc = B.build_mpc(model, gp, dtype,
                      dict(al_iters=2, max_iters=4, ls_steps=8,
                           penalty_init=1e3, fused_kkt=True))
    for n_mc in (64, 256, 1024):
        def run(k, n_mc=n_mc):
            return mpc.solve_mc(X0, k * DT, XSP, n_mc=n_mc,
                                key=jax.random.PRNGKey(5))[0]

        per_step, spread = _slope(run, 8, 24, reps=3, estimates=2)
        print(f"[mc] n_mc={n_mc:5d}: {per_step * 1e3:8.3f} ms/step  "
              f"{n_mc / per_step:12,.0f} lane-solves/s  spread_ms="
              f"{np.round(np.array(spread) * 1e3, 3)}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["ofb", "mhe", "mc", "all"])
    a = ap.parse_args()
    if a.section in ("ofb", "all"):
        ofb_section()
    if a.section in ("mhe", "all"):
        mhe_section()
    if a.section in ("mc", "all"):
        mc_section()
