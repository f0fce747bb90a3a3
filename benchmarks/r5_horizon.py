"""Round-5: end-to-end MPC latency vs horizon, THROUGH the fused-KKT cap.

Round 4's full-controller table stopped at Nt=100 (the KKT-only crossover
went to 200, cap 256) — leaving the whole-solve behavior approaching and
crossing the fused cap uncharacterized (VERDICT r4 item 5).  This measures
the FULL controller (TA + chance tightening + feedback, RTI budget
al2/mi2, fused KKT requested via the auto policy) at
Nt in {20, 50, 100, 150, 200, 256, 300}; the 300 row exercises
riccati.select_backend's auto-degrade to the associative scan inside a
real solve.  Pinned bench model; compile wall time recorded per horizon.

Long horizons are seeded with a hold-input guess (solve(u0=[2,3])): the
u=0 cold rollout drains the tank onto the sqrt-outflow clamp where the
covariance propagation overflows over hundreds of stages (round-5
finding, see controller.solve_step docstring).

Usage: python benchmarks/r5_horizon.py [--nts 20,50,...] [--cpu]
(--cpu = smoke test only)
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".jax_cache")))


def main(nts):
    import bench as B
    from benchmarks.bench_spec import (DT, X0, XSP, Q_W, R_W, ULB, UUB,
                                       XLB, XUB)
    from benchmarks._timing import sync
    from gpmpc_tpu import MPC, Model
    from gpmpc_tpu.systems import four_tank_ode

    dtype = jnp.float32
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=5, fused_integrator=True)
    gp = B._fixture_gp("tank", dtype)
    assert gp is not None, "pinned fixture required for comparable rows"
    x0 = jnp.asarray(X0, dtype)
    x_sp = jnp.asarray(XSP, dtype)
    u_hold = np.array([2.0, 3.0])

    for nt in nts:
        mpc = MPC(horizon=nt * DT, model=model, gp=gp, gp_method="TA",
                  discrete_method="gp", Q=Q_W, R=R_W,
                  ulb=ULB, uub=UUB, xlb=XLB, xub=XUB,
                  percentile=0.95, feedback=True, cov_updates=1,
                  op_x=XSP, op_u=np.array([3.0, 3.0]),
                  solver_opts=dict(al_iters=2, max_iters=2, ls_steps=8,
                                   penalty_init=1e3, fused_kkt=True),
                  dtype=dtype)

        def run(k):
            return mpc.solve(x0, k * DT, x_sp, noise=False, u0=u_hold)

        t0 = time.perf_counter()
        xs, _ = run(40)
        sync(xs)
        compile_s = time.perf_counter() - t0
        assert np.all(np.isfinite(np.asarray(xs))), f"Nt={nt} NaN loop"

        def t(k, reps=4):
            sync(run(k)[0])
            best = np.inf
            for _ in range(reps):
                tt = time.perf_counter()
                xs, _ = run(k)
                sync(xs)
                best = min(best, time.perf_counter() - tt)
            return best

        slopes = [(t(340) - t(40)) / 300.0 * 1e3 for _ in range(3)]
        print(f"[horizon] Nt={nt:4d} ms/solve median={np.median(slopes):7.4f}"
              f" all={np.round(slopes, 4)} compile={compile_s:6.1f}s",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nts", default="20,50,100,150,200,256,300")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    main([int(s) for s in a.nts.split(",")])
