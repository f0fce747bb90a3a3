"""Round-3c ablation (TPU): matmul precision of the SOLVE program.

The package-wide default is full-fidelity f32 matmuls (gpmpc_tpu/__init__:
XLA's single-bf16-pass default corrupted GP *training* on v5e).  The solve
program is a different regime — its cancellation-critical forms carry local
HIGHEST pins — so this script measures, with the GP always TRAINED at full
fidelity, what `solve_precision='default'` does to:

  * four-tank RTI latency (K-slope 140->1140) and realized closed-loop
    cost vs the full-fidelity converged anchor (the bench.py quality gate),
  * car EM+hybrid+obstacles latency and obstacle clearance,
  * batched-study throughput at B=1024 and its psum'd mean cost.

Usage: python benchmarks/r3c_precision.py [--section tank|car|study|all]
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


def timed(run, k, reps=4):
    sync(run(k))
    best, out = np.inf, None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(k)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def _tank_setup():
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.systems import four_tank_ode
    from benchmarks.bench_spec import (DT, MODEL_R, TRAIN_N, TRAIN_UUB,
                                       TRAIN_ULB, TRAIN_XUB, TRAIN_XLB)

    dtype = jnp.float32
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=True)
    X, Y = model.generate_training_data(
        TRAIN_N, uub=TRAIN_UUB, ulb=TRAIN_ULB, xub=TRAIN_XUB,
        xlb=TRAIN_XLB, key=jax.random.PRNGKey(2))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
            max_iters=100, seed=1,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))
    return model, gp, dtype


def tank_section(smoke=False):
    import bench as B
    from benchmarks.bench_spec import DT, X0, XSP, closed_loop_cost

    model, gp, dtype = _tank_setup()
    x0 = jnp.asarray(X0, dtype)
    x_sp = jnp.asarray(XSP, dtype)
    n_cost = 10 if smoke else 140
    k_s, k_l = (4, 10) if smoke else (140, 1140)
    reps, ests = (1, 1) if smoke else (4, 3)

    # full-fidelity converged anchor (the bench quality yardstick)
    mpc_anchor = B.build_mpc(model, gp, dtype,
                             dict(al_iters=4, max_iters=20, fused_kkt=True))
    xs_a, us_a = mpc_anchor.solve(x0, n_cost * DT, x_sp, noise=False)
    cost_anchor = closed_loop_cost(xs_a, us_a, x_sp)
    print(f"[tank] anchor (al4/mi20, highest) cost={cost_anchor:9.2f}",
          flush=True)

    rti = dict(al_iters=2, max_iters=4, ls_steps=8, penalty_init=1e3,
               fused_kkt=True)
    for prec in (None, "default"):
        mpc = B.build_mpc(model, gp, dtype, rti, solve_precision=prec)

        def run(k, mpc=mpc):
            return mpc.solve(x0, k * DT, x_sp, noise=False)[0]

        slopes = []
        for _ in range(ests):
            t_s, _ = timed(run, k_s, reps=reps)
            t_l, _ = timed(run, k_l, reps=reps)
            slopes.append((t_l - t_s) / (k_l - k_s) * 1e3)
        xs, us = mpc.solve(x0, n_cost * DT, x_sp, noise=False)
        cost = closed_loop_cost(xs, us, x_sp)
        print(f"[tank] rti prec={str(prec):8s} "
              f"ms/solve={float(np.median(slopes)):7.4f}  "
              f"cost={cost:9.2f}  ratio={cost / cost_anchor:7.4f}",
              flush=True)


def car_section():
    import bench as B

    for prec in (None, "default"):
        out = {}
        try:
            B.bench_car(jnp.float32, out, solve_precision=prec)
        except Exception as e:
            print(f"[car] prec={prec} FAILED: {type(e).__name__}: {e}"[:160],
                  flush=True)
            continue
        print(f"[car] prec={str(prec):8s} ms={out['car_em_hybrid_ms']:7.3f}  "
              f"clear={out['car_min_clearance']:6.3f}  "
              f"feasible={out['car_feasible']}", flush=True)


def study_section(smoke=False):
    from gpmpc_tpu.parallel.batched import BatchedStudy
    from gpmpc_tpu import Model
    from gpmpc_tpu.systems import four_tank_ode
    from benchmarks.bench_spec import DT, MODEL_R

    _, gp, dtype = _tank_setup()
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=False)
    x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)
    b = 16 if smoke else 1024
    x0s = (jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)[None]
           + 0.5 * jax.random.uniform(jax.random.PRNGKey(0), (b, 4),
                                      dtype=dtype))
    for prec in (None, "default"):
        study = BatchedStudy(
            model, gp, horizon=8 * DT,
            Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
            ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=128,
            solver_opts=dict(al_iters=1, max_iters=3, ls_steps=4),
            solve_precision=prec)

        def run(n, study=study):
            return study.run(x0s, x_sp, n_steps=n, noise=True,
                             key=jax.random.PRNGKey(1)).cost

        t4, _ = timed(run, 4, reps=1 if smoke else 3)
        t12, c12 = timed(run, 12, reps=1 if smoke else 3)
        per_step = (t12 - t4) / 8.0
        print(f"[study] prec={str(prec):8s} B={b}  "
              f"{per_step * 1e3:7.2f} ms/step  "
              f"{b / per_step:10,.0f} rollout-solves/s  "
              f"mean_cost={float(jnp.mean(c12)):9.2f}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["tank", "car", "study", "all"])
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes/reps to validate the script (CPU)")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    if a.section in ("tank", "all"):
        tank_section(smoke=a.smoke)
    if a.section in ("car", "all"):
        car_section()
    if a.section in ("study", "all"):
        study_section(smoke=a.smoke)
