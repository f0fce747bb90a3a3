"""Round-3 operating-point sweeps (TPU): RTI budget vs closed-loop cost,
car budget vs feasibility+latency, batched-study batch scaling.

Feeds three decisions with measured data (VERDICT r2 weak #1/#5, next #2/#7):
  * which RTI budget gives cost_ratio <= 1.005 with latency well under 1 ms,
  * which car solver budget keeps the obstacle path feasible at speed,
  * whether the B=512 round-1 -> round-2 throughput delta reproduces.

Usage: python benchmarks/r3_sweep.py [--section tank|car|study|all]
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
    best = np.inf
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(k)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def tank_section():
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.systems import four_tank_ode
    from benchmarks.bench_spec import (DT, MODEL_R, TRAIN_N, TRAIN_UUB,
                                       TRAIN_ULB, TRAIN_XUB, TRAIN_XLB,
                                       X0, XSP, closed_loop_cost)
    import bench as B

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
    x0 = jnp.asarray(X0, dtype)
    x_sp = jnp.asarray(XSP, dtype)

    budgets = [
        ("al4_mi2_ls8_p100", dict(al_iters=4, max_iters=2, ls_steps=8,
                                  penalty_init=100.0, fused_kkt=True)),
        ("al3_mi3_ls8_p1e3", dict(al_iters=3, max_iters=3, ls_steps=8,
                                  penalty_init=1e3, fused_kkt=True)),
        ("al2_mi6_ls8_p300", dict(al_iters=2, max_iters=6, ls_steps=8,
                                  penalty_init=300.0, fused_kkt=True)),
        ("al4_mi4_ls8_p100", dict(al_iters=4, max_iters=4, ls_steps=8,
                                  penalty_init=100.0, fused_kkt=True)),
    ]
    for name, opts in budgets:
        mpc = B.build_mpc(model, gp, dtype, opts)

        def run(k, mpc=mpc):
            return mpc.solve(x0, k * DT, x_sp, noise=False)[0]

        t140, xs = timed(run, 140, reps=3)
        xs2, us2 = mpc.solve(x0, 140 * DT, x_sp, noise=False)
        cost = closed_loop_cost(xs2, us2, x_sp)
        print(f"[tank] {name:14s} cost140={cost:9.2f}  t140={t140*1e3:7.1f}ms",
              flush=True)


def car_section():
    import bench as B

    dtype = jnp.float32
    budgets = [
        ("al2_mi3", dict(al_iters=2, max_iters=3, ls_steps=6,
                         parallel_kkt=True)),
        ("al3_mi5", dict(al_iters=3, max_iters=5, ls_steps=6,
                         parallel_kkt=True)),
        ("al4_mi8", dict(al_iters=4, max_iters=8, ls_steps=8,
                         parallel_kkt=True)),
        ("al3_mi5_fused", dict(al_iters=3, max_iters=5, ls_steps=6,
                               fused_kkt=True)),
    ]
    for name, opts in budgets:
        out = {}
        try:
            B.bench_car(dtype, out, solver_opts=opts)
        except Exception as e:
            print(f"[car] {name:16s} FAILED: {type(e).__name__}: {e}"[:160],
                  flush=True)
            continue
        print(f"[car] {name:16s} ms={out['car_em_hybrid_ms']:7.3f}  "
              f"clear={out['car_min_clearance']:6.3f}  "
              f"feasible={out['car_feasible']}", flush=True)


def study_section(batches=(256, 512, 1024), fused_opts=(True, False)):
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.parallel.batched import BatchedStudy
    from gpmpc_tpu.systems import four_tank_ode
    from benchmarks.bench_spec import (DT, MODEL_R, TRAIN_N, TRAIN_UUB,
                                       TRAIN_ULB, TRAIN_XUB, TRAIN_XLB)

    dtype = jnp.float32
    for fused in fused_opts:
        model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u),
                      dt=DT, R=MODEL_R, clip_negative=True, dtype=dtype,
                      integrator_substeps=10, fused_integrator=fused)
        X, Y = model.generate_training_data(
            TRAIN_N, uub=TRAIN_UUB, ulb=TRAIN_ULB, xub=TRAIN_XUB,
            xlb=TRAIN_XLB, key=jax.random.PRNGKey(2))
        gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
                max_iters=100, seed=1,
                optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))

        study = BatchedStudy(
            model, gp, horizon=8 * DT,
            Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
            ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=128,
            solver_opts=dict(al_iters=1, max_iters=3, ls_steps=4))
        x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)
        for b in batches:
            x0s = (jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)[None]
                   + 0.5 * jax.random.uniform(jax.random.PRNGKey(0), (b, 4),
                                              dtype=dtype))

            def run(n, x0s=x0s, study=study):
                return study.run(x0s, x_sp, n_steps=n, noise=True,
                                 key=jax.random.PRNGKey(1)).cost

            t4, _ = timed(run, 4, reps=3)
            t12, _ = timed(run, 12, reps=3)
            per_step = (t12 - t4) / 8.0
            print(f"[study] fused={int(fused)} B={b:5d}  "
                  f"{per_step*1e3:7.2f} ms/step  "
                  f"{b/per_step:10,.0f} rollout-solves/s", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["tank", "car", "study", "all"])
    a = ap.parse_args()
    if a.section in ("tank", "all"):
        tank_section()
    if a.section in ("car", "all"):
        car_section()
    if a.section in ("study", "all"):
        study_section()
