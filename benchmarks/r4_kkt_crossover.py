"""Round-4: KKT-backend crossover in the horizon Nt (VERDICT r3 #3).

``riccati.solve_fused`` Python-unrolls the stage loops inside one Pallas
kernel (Nt is static), which is measured 6x faster than the associative-scan
backend at Nt=20 — but its compile time and VMEM footprint grow with Nt and
were uncharacterized past 20.  This script measures, per backend
(sequential scan / associative-scan parallel / fused Pallas) and per
Nt in {20, 50, 100, 200}:

  * compile (first-call) wall time of the jitted solve,
  * amortized per-solve latency via a carry-coupled scan K-slope
    (the repeated solve cannot be hoisted or batched by XLA),

on the MPC-sized stage shapes (nx=4, nu=2, f32).  The measured table feeds
``solvers/riccati.py::solve_auto``'s per-horizon dispatch policy.

Usage: python benchmarks/r4_kkt_crossover.py [--nts 20,50,100,200]
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
from gpmpc_tpu.solvers import riccati

RNG = np.random.default_rng(42)


def make_qp(nt, nx=4, nu=2, dtype=jnp.float32):
    def spd(n):
        a = RNG.standard_normal((n, n))
        return a @ a.T + n * np.eye(n)

    return riccati.StageQP(
        a=jnp.asarray(RNG.standard_normal((nt, nx, nx)) * 0.3, dtype),
        b=jnp.asarray(RNG.standard_normal((nt, nx, nu)) * 0.3, dtype),
        c=jnp.asarray(RNG.standard_normal((nt, nx)) * 0.1, dtype),
        q_xx=jnp.asarray(np.stack([spd(nx) for _ in range(nt)]), dtype),
        q_uu=jnp.asarray(np.stack([spd(nu) for _ in range(nt)]), dtype),
        q_xu=jnp.asarray(RNG.standard_normal((nt, nx, nu)) * 0.1, dtype),
        q_x=jnp.asarray(RNG.standard_normal((nt, nx)), dtype),
        q_u=jnp.asarray(RNG.standard_normal((nt, nu)), dtype),
        qf_xx=jnp.asarray(spd(nx), dtype),
        qf_x=jnp.asarray(RNG.standard_normal(nx), dtype))


def bench_backend(name, solver, qp, dx0, lengths=(64, 512), reps=5):
    """Compile time + carry-coupled amortized per-solve latency."""

    cache = {}

    def run(k):
        if k not in cache:
            def body(carry, _):
                qp_t = qp._replace(q_x=qp.q_x + carry * 1e-20)
                sol = solver(qp_t, dx0, 1e-6)
                return carry * 0.5 + jnp.sum(sol.du) * 1e-30, None
            cache[k] = jax.jit(lambda: jax.lax.scan(
                body, jnp.asarray(1.0, qp.b.dtype), None, length=k)[0])
        return cache[k]()

    t0 = time.perf_counter()
    sync(run(lengths[0]))
    compile_s = time.perf_counter() - t0
    sync(run(lengths[1]))  # compile the long loop before timing

    def t(k):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(k))
            best = min(best, time.perf_counter() - t0)
        return best

    slopes = []
    for _ in range(3):
        slopes.append((t(lengths[1]) - t(lengths[0]))
                      / (lengths[1] - lengths[0]) * 1e6)
    return compile_s, float(np.median(slopes))


def main(nts):
    dtype = jnp.float32
    backends = [("sequential", riccati.solve),
                ("parallel", riccati.solve_parallel),
                ("fused", riccati.solve_fused)]
    print(f"backend      Nt   compile_s   us/solve   (nx=4, nu=2, "
          f"{jax.default_backend()})", flush=True)
    for nt in nts:
        qp = make_qp(nt)
        dx0 = jnp.zeros(4, dtype)
        # cross-check the three backends agree on this instance before
        # trusting the timings
        ref = np.asarray(jax.jit(riccati.solve)(qp, dx0, 1e-6).du,
                         np.float64)
        for name, solver in backends:
            try:
                # jit the cross-check call: eager op-by-op dispatch through
                # the tunnel costs ~25 ms/op (a bare solve_parallel at Nt=20
                # measured 235 s eager vs 4.7 s jit-compiled)
                t0 = time.perf_counter()
                sol = jax.jit(solver)(qp, dx0, 1e-6)
                sol.du.block_until_ready()
                dev = float(np.max(np.abs(np.asarray(sol.du, np.float64)
                                          - ref)) / (1 + np.abs(ref).max()))
                one_s = time.perf_counter() - t0
                if dev > 1e-2:
                    print(f"{name:12s} {nt:4d}   DISAGREES dev={dev:.2e}",
                          flush=True)
                    continue
                compile_s, us = bench_backend(name, solver, qp, dx0)
                print(f"{name:12s} {nt:4d}   {compile_s:8.1f}   {us:9.2f}"
                      f"   (single-call first build {one_s:.1f}s, "
                      f"dev {dev:.1e})", flush=True)
            except Exception as e:
                print(f"{name:12s} {nt:4d}   FAILED "
                      f"{type(e).__name__}: {e}"[:140], flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nts", default="20,50,100,200")
    a = ap.parse_args()
    main([int(s) for s in a.nts.split(",")])
