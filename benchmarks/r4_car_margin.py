"""Round-4: re-establish car feasibility MARGIN against session noise.

The round-3 operating point (al2 x mi15, fused KKT, cov_updates=1,
clearance 0.993-0.996 across that round's sessions) measured clearance
0.918 in a round-4 session with IDENTICAL seeds/code — TPU f32
cross-session nondeterminism moves the trained GP and with it the dodge
geometry.  Clearance is a HARD feasibility gate (min over the trajectory),
so unlike the tank's cost ratio it cannot be medianized away: the fix is
solver budget that clears the obstacles with margin in every session.

Usage: python benchmarks/r4_car_margin.py --set 1|2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax.numpy as jnp

SETS = {
    1: [
        ("al2/mi15/cov1 (r3 op point)", dict(al_iters=2, max_iters=15,
                                             fused_kkt=True), 1),
        ("al3/mi15/cov1", dict(al_iters=3, max_iters=15, fused_kkt=True), 1),
        ("al2/mi20/cov1", dict(al_iters=2, max_iters=20, fused_kkt=True), 1),
    ],
    2: [
        ("al2/mi15/cov2", dict(al_iters=2, max_iters=15, fused_kkt=True), 2),
        ("al3/mi20/cov1", dict(al_iters=3, max_iters=20, fused_kkt=True), 1),
        ("al2/mi25/cov1", dict(al_iters=2, max_iters=25, fused_kkt=True), 1),
    ],
}


def main(which):
    import bench as B
    for label, opts, cov in SETS[which]:
        out = {}
        try:
            B.bench_car(jnp.float32, out, solver_opts=opts, cov_updates=cov)
        except Exception as e:
            print(f"[car-margin] {label}: FAILED {type(e).__name__}: {e}"
                  [:150], flush=True)
            continue
        print(f"[car-margin] {label:26s} ms={out['car_em_hybrid_ms']:7.3f} "
              f"clear={out['car_min_clearance']:6.3f} "
              f"feasible={out['car_feasible']}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", type=int, default=1, choices=[1, 2])
    main(ap.parse_args().set)
