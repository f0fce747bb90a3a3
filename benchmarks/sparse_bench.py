"""Sparse-vs-exact GP scaling benchmark (run on TPU; --cpu for a smoke run).

Quantifies what `GP(inducing=M)` buys at production data sizes, on the
four-tank system shape (D=6, Ny=4) [SURVEY C4/C5 scale-out;
models/sparse.py]:

  1. hyperparameter training wall time (multistart grid, compile + steady)
     — exact NLL is O(N^3) per evaluation, the VFE bound O(M^2 N)
  2. embedded TA one-step moment-map latency — O(N^2) vs O(M^2) per stage,
     measured as a carry-coupled scan K-slope (tunnel-safe methodology,
     see benchmarks/_timing.py)
  3. held-out SMSE for both, so the speed column is tied to a quality
     column (sparsity is only interesting if accuracy survives)

Usage: python benchmarks/sparse_bench.py [--cpu] [--m 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from benchmarks._timing import sync as _sync
from benchmarks.detail_bench import scan_bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[200, 1000, 4000])
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.models.propagate import propagate_ta
    from gpmpc_tpu.systems import four_tank_ode

    dev = jax.devices()[0].platform
    dtype = jnp.float64 if dev == "cpu" else jnp.float32
    print(f"# sparse_bench on {dev} dtype={dtype.__name__} M={args.m}")

    model = Model(Nx=4, Nu=2, ode=four_tank_ode, dt=3.0,
                  R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=10)
    # one shared held-out set, big enough for a stable SMSE
    Xt, Yt = model.generate_training_data(
        512, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(99))

    rows = []
    for n in args.sizes:
        X, Y = model.generate_training_data(
            n, uub=[6.0, 6.0], ulb=[0.0, 0.0],
            xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
            key=jax.random.PRNGKey(7))
        row = {"N": n, "M": args.m}
        for kind in ("exact", "sparse"):
            if kind == "sparse" and args.m >= n:
                continue
            if kind == "exact" and dev == "tpu" and n > 2000:
                # the N=4000 exact multistart grid (O(N^3) NLL x starts x
                # dims as one program) reproducibly kills the v5e worker
                # over the tunnel; the sparse column is the whole point at
                # this scale anyway
                row["exact"] = {"skipped": f"N={n} exact grid crashes the "
                                           "TPU worker; cap is N=2000"}
                continue
            kw = {"inducing": args.m} if kind == "sparse" else {}
            if dev != "cpu":
                # f32 conditioning-cliff floors, same as bench.py's TPU GP
                kw["optimizer_opts"] = dict(jitter=1e-5, min_noise=1e-5)
            t0 = time.perf_counter()
            gp = GP(np.asarray(X), np.asarray(Y), mean_func="zero",
                    gp_method="TA", multistart=2, max_iters=200, seed=0,
                    **kw)
            _sync(gp.post.alpha)
            t_cold = time.perf_counter() - t0
            t0 = time.perf_counter()          # steady-state: shapes cached
            gp.train(jax.random.PRNGKey(1))
            _sync(gp.post.alpha)
            t_warm = time.perf_counter() - t0
            smse, _, _ = gp.validate(np.asarray(Xt), np.asarray(Yt),
                                     verbose=False)
            # embedded TA one-step map latency (what each MPC stage pays)
            post, norm, cfg = gp.post, gp.norm, gp.cfg
            mu0 = jnp.asarray(np.r_[12.0, 12.0, 1.5, 1.5, 3.0, 3.0],
                              dtype=dtype)
            sig0 = 0.01 * jnp.eye(6, dtype=dtype)

            def op(c):
                mu, sig, _ = propagate_ta(post, norm, cfg,
                                          mu0 + c * 1e-20, sig0)
                return jnp.sum(mu) + sig[0, 0]

            t_ta = scan_bench(op, 64, 512)
            row[kind] = {"train_cold_s": round(t_cold, 2),
                         "train_warm_s": round(t_warm, 2),
                         "ta_step_us": round(t_ta * 1e6, 1),
                         "smse_max": float(np.max(smse))}
            print(f"N={n:5d} {kind:6s} train {t_cold:6.1f}s cold /"
                  f" {t_warm:6.1f}s warm   TA step {t_ta*1e6:8.1f} us  "
                  f" SMSE_max {np.max(smse):.2e}")
        rows.append(row)

    print(json.dumps({"device": dev, "rows": rows}))


if __name__ == "__main__":
    main()
