"""Round-5: batched-study throughput vs batch size on one chip.

bench.py's config-5 number of record is B=1024 (139.7k rollout-solves/s,
BENCH_r04).  Round-2 history claimed "batch-linear through 4096" but that
predates the full-fidelity matmul default, the capacity-N+64 online
conditioning, and solve_precision='default' for the study — so the
scaling curve of the CURRENT stack is unmeasured.  This harness runs the
exact bench_study configuration at B in {256, 512, 1024, 2048, 4096} and
reports per-step ms and rollout-solves/s at each point, locating the
single-chip saturation knee (where the MXU stops being fed by bigger
batches and throughput goes flat — the point past which multi-chip DP is
the only lever, which is exactly what BatchedStudy(mesh=) shards).

Timing methodology matches bench.bench_study: K-slope over device-
resident scans (t(12)-t(4))/8 to cancel the axon tunnel's fixed per-call
dispatch cost, best-of-3 per length, median of 2 slope estimates.

Usage: python benchmarks/r5_study_scaling.py [--batches 256 512 1024 ...]
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


def main(batches, chunk=None):
    import bench as B
    from gpmpc_tpu import Model
    from gpmpc_tpu.parallel.batched import BatchedStudy
    from gpmpc_tpu.systems import four_tank_ode

    from benchmarks.bench_spec import MODEL_R, DT
    from benchmarks._timing import sync

    dtype = jnp.float32
    # Reuse the pinned bench fixture GP exactly as bench_study does.
    gp = B._fixture_gp("tank", dtype, gp_method="TA")
    assert gp is not None, "pinned bench fixture required"
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u),
                  dt=DT, R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=False)
    study = BatchedStudy(
        model, gp, horizon=8 * model.dt,
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=128,
        solver_opts=dict(al_iters=1, max_iters=3, ls_steps=4),
        solve_precision="default", chunk=chunk)
    x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)

    rows = []
    for b in batches:
        x0s = (jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)[None]
               + 0.5 * jax.random.uniform(jax.random.PRNGKey(0), (b, 4),
                                          dtype=dtype))

        def run(n):
            return study.run(x0s, x_sp, n_steps=n, noise=True,
                             key=jax.random.PRNGKey(1)).cost

        def t(k, reps=3):
            sync(run(k))
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(run(k))
                best = min(best, time.perf_counter() - t0)
            return best

        slopes = [(t(12) - t(4)) / 8.0 for _ in range(2)]
        per_step = max(float(np.median(slopes)), 1e-9)
        rows.append((b, per_step * 1e3, b / per_step))
        print(f"[study-scaling] B={b:5d} step={per_step*1e3:7.3f} ms "
              f"throughput={b/per_step:10.0f} rollout-solves/s", flush=True)

    base = rows[0][2] / rows[0][0]
    print("[study-scaling] B / step-ms / solves-per-s / efficiency-vs-"
          f"B={rows[0][0]}:", flush=True)
    for b, ms, thr in rows:
        print(f"  {b:5d}  {ms:7.3f}  {thr:10.0f}  {thr/(base*b):5.2f}",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[256, 512, 1024, 2048, 4096])
    ap.add_argument("--chunk", type=int, default=None,
                    help="BatchedStudy(chunk=): run B>chunk as lax.map "
                         "over vmapped groups (the past-the-knee path)")
    a = ap.parse_args()
    main(a.batches, a.chunk)
