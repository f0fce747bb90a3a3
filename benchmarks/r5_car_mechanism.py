"""Round-5: attack the car's latency with MECHANISM, not budget.

Round 4 carried the car's feasibility margin by brute force (al3 x mi15,
4.25-4.43 ms — a third full AL round) because al2 failed at every inner
budget tested (clearance 0.918/0.939/0.957 at mi15/20/25).  With the bench
model now PINNED (benchmarks/bench_fixture.npz) the session drift is gone,
so the question becomes mechanical: which solver *mechanism* lets a
2-AL-round budget clear the obstacles?

Candidates (VERDICT r4 item 2):
  A. penalty schedule — al2's two outer rounds run at mu = {10, 100}
     (defaults); the obstacle AL terms may simply be underweighted.
     Sweep penalty_init (and growth) so al2 reaches mu ~ 1e3-1e4.
  B. violation-aware line search — SQPConfig.merit_viol adds a static
     L1 exact-penalty on inequality violations to the line-search merit,
     independent of the mu schedule.
  C. best mechanism at REDUCED inner budget (mi12/mi10/mi8) — the
     latency prize.

Two modes:
  --screen : CPU f32 clearance-only pre-screen (one 130-step closed loop
             per config, no timing) — runs while the TPU tunnel is down;
             clearance on the pinned fixture is a deterministic function
             of the solver config up to last-ulp backend differences, so
             the screen predicts which configs are worth TPU time.
  default  : full TPU bench rows (K-slope latency + clearance) via
             bench.bench_car.

Usage: python benchmarks/r5_car_mechanism.py --set A|B|C [--screen]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

F = dict(fused_kkt=True)

SETS = {
    "A": [
        ("al2/mi15 p10x10 (r4 fail)", dict(al_iters=2, max_iters=15,
                                           penalty_init=10.0, **F)),
        ("al2/mi15 p100x10", dict(al_iters=2, max_iters=15,
                                  penalty_init=100.0, **F)),
        ("al2/mi15 p1e3x10", dict(al_iters=2, max_iters=15,
                                  penalty_init=1e3, **F)),
        ("al2/mi15 p100x30", dict(al_iters=2, max_iters=15,
                                  penalty_init=100.0, penalty_mult=30.0,
                                  **F)),
    ],
    "B": [
        ("al2/mi15 mv10", dict(al_iters=2, max_iters=15, merit_viol=10.0,
                               **F)),
        ("al2/mi15 mv100", dict(al_iters=2, max_iters=15, merit_viol=100.0,
                                **F)),
        ("al2/mi15 p100+mv10", dict(al_iters=2, max_iters=15,
                                    penalty_init=100.0, merit_viol=10.0,
                                    **F)),
    ],
    "C": [
        ("al2/mi12 BEST", dict(al_iters=2, max_iters=12, **F)),
        ("al2/mi10 BEST", dict(al_iters=2, max_iters=10, **F)),
        ("al2/mi8 BEST", dict(al_iters=2, max_iters=8, **F)),
    ],
}


def rows_for(which, best_extra=None):
    rows = SETS[which]
    if which == "C":
        extra = best_extra or {}
        rows = [(lbl.replace("BEST", "+".join(
            f"{k}={v:g}" for k, v in extra.items()) or "base"),
            {**opts, **extra}) for lbl, opts in rows]
    return rows


def screen(which, best_extra=None):
    """CPU clearance-only pre-screen (no latency)."""
    import bench as B
    for label, opts in rows_for(which, best_extra):
        mpc, x0, x_sp, con_par, obstacles, dt = B.build_car(
            jnp.float32, solver_opts=opts, cov_updates=1)
        xs, _ = mpc.solve(x0, 130 * dt, x_sp, noise=False,
                          con_par_func=lambda k: con_par)
        clear = B.car_min_clearance(xs, obstacles)
        print(f"[car-screen] {label:28s} clear={clear:6.3f} "
              f"feasible={clear >= 0.995}", flush=True)


def main(which, best_extra=None):
    import bench as B
    for label, opts in rows_for(which, best_extra):
        out = {}
        try:
            B.bench_car(jnp.float32, out, solver_opts=opts, cov_updates=1)
        except Exception as e:
            print(f"[car-mech] {label}: FAILED {type(e).__name__}: {e}"
                  [:160], flush=True)
            continue
        print(f"[car-mech] {label:28s} ms={out['car_em_hybrid_ms']:7.3f} "
              f"clear={out['car_min_clearance']:6.3f} "
              f"feasible={out['car_feasible']}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="A", choices=list(SETS))
    ap.add_argument("--screen", action="store_true")
    ap.add_argument("--penalty-init", type=float, default=None)
    ap.add_argument("--penalty-mult", type=float, default=None)
    ap.add_argument("--merit-viol", type=float, default=None)
    a = ap.parse_args()
    extra = {k: v for k, v in (("penalty_init", a.penalty_init),
                               ("penalty_mult", a.penalty_mult),
                               ("merit_viol", a.merit_viol))
             if v is not None}
    if a.screen:
        jax.config.update("jax_platforms", "cpu")
        screen(a.set, extra)
    else:
        main(a.set, extra)
