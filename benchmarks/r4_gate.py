"""Round-4: make the cost-parity gate pass with MARGIN (VERDICT r3 #1).

Round 3's artifact failed its own headline gate (ratio 1.01026 > 1.01) at an
operating point the builder measured at 1.0066 the day before: the
single-(x0, seed) ratio has cross-session noise of the same order as its
margin.  This script measures the two robustness axes the round-4 gate is
built on:

  * ``--section ratio``: per-candidate RTI budget (x solve_precision), the
    realized-cost ratio vs the converged anchor computed SEPARATELY at K
    perturbed initial states — the gate statistic is the MEDIAN of the
    per-x0 ratios (differential model noise partially cancels across
    transients), and the spread (min/max) is the margin evidence.
  * ``--section seeds``: the same statistic re-measured across independent
    GP training seeds — the presumed dominant cross-session noise source is
    the L-BFGS fit on TPU f32, so a candidate must keep its median ratio
    <= 1.01 across fits, not just at seed 1.
  * ``--section lat``: K-slope latency (140->1140) of the shortlisted
    budget at solve_precision in {None, 'default'} — the round-3c recovery
    lever, measured with the quality gate in view.

Usage: python benchmarks/r4_gate.py --section ratio|seeds|lat|all
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


def x0_set(dtype, k=5):
    """The bench_spec X0 panel (shared with bench.py's gate)."""
    from benchmarks.bench_spec import X0_PANEL
    return [jnp.asarray(x, dtype) for x in X0_PANEL[:k]]


def setup(seed_train=2, seed_gp=1, fixture=False):
    import bench as B
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.systems import four_tank_ode
    from benchmarks.bench_spec import (DT, MODEL_R, TRAIN_N, TRAIN_UUB,
                                       TRAIN_ULB, TRAIN_XUB, TRAIN_XLB)
    dtype = jnp.float32
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=True)
    if fixture:
        # the pinned bench model (round 4): quality panels on it are
        # bit-reproducible across sessions, so a budget sweep's verdict
        # is trustworthy — serve exactly what bench.py serves
        gp = B._fixture_gp("tank", dtype, gp_method="TA",
                           optimizer_opts=dict(min_noise=1e-4))
        assert gp is not None, "bench fixture missing"
        return B, model, gp, dtype
    X, Y = model.generate_training_data(
        TRAIN_N, uub=TRAIN_UUB, ulb=TRAIN_ULB, xub=TRAIN_XUB,
        xlb=TRAIN_XLB, key=jax.random.PRNGKey(seed_train))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
            max_iters=100, seed=seed_gp,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))
    return B, model, gp, dtype


CANDIDATES = [
    # (label, solver_opts)
    # cheaper-than-headline budgets (round-4 late sweep ON THE PINNED
    # MODEL — only trustworthy post-pinning)
    ("al1/mi4/ls8/p1e3", dict(al_iters=1, max_iters=4, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
    ("al1/mi6/ls8/p1e3", dict(al_iters=1, max_iters=6, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
    ("al2/mi2/ls8/p1e3", dict(al_iters=2, max_iters=2, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
    ("al2/mi3/ls8/p1e3", dict(al_iters=2, max_iters=3, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
    ("al2/mi4/ls8/p1e3", dict(al_iters=2, max_iters=4, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
    ("al2/mi5/ls8/p1e3", dict(al_iters=2, max_iters=5, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
    ("al2/mi6/ls8/p1e3", dict(al_iters=2, max_iters=6, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
    ("al3/mi4/ls8/p1e3", dict(al_iters=3, max_iters=4, ls_steps=8,
                              penalty_init=1e3, fused_kkt=True)),
]
ANCHOR = dict(al_iters=4, max_iters=20, fused_kkt=True)


def ratios_for(B, model, gp, dtype, solver_opts, x0s, anchor_costs,
               n_steps=140, solve_precision=None):
    from benchmarks.bench_spec import DT, XSP, closed_loop_cost
    x_sp = jnp.asarray(XSP, dtype)
    mpc = B.build_mpc(model, gp, dtype, solver_opts,
                      solve_precision=solve_precision)
    out = []
    for x0, ca in zip(x0s, anchor_costs):
        xs, us = mpc.solve(x0, n_steps * DT, x_sp, noise=False)
        out.append(closed_loop_cost(xs, us, x_sp) / ca)
    return np.array(out)


def anchor_costs_for(B, model, gp, dtype, x0s, n_steps=140):
    from benchmarks.bench_spec import DT, XSP, closed_loop_cost
    x_sp = jnp.asarray(XSP, dtype)
    mpc = B.build_mpc(model, gp, dtype, ANCHOR)
    return [closed_loop_cost(*mpc.solve(x0, n_steps * DT, x_sp, noise=False),
                             x_sp=x_sp) for x0 in x0s]


def ratio_section(precisions=(None, "default"), fixture=False):
    B, model, gp, dtype = setup(fixture=fixture)
    x0s = x0_set(dtype)
    t0 = time.perf_counter()
    ca = anchor_costs_for(B, model, gp, dtype, x0s)
    print(f"[anchor] costs={np.round(ca, 1)}  "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    for label, opts in CANDIDATES:
        for prec in precisions:
            r = ratios_for(B, model, gp, dtype, opts, x0s, ca,
                           solve_precision=prec)
            print(f"[ratio] {label:18s} prec={str(prec):8s} "
                  f"median={np.median(r):7.4f}  min={r.min():7.4f}  "
                  f"max={r.max():7.4f}  per-x0={np.round(r, 4)}",
                  flush=True)


def seeds_section(shortlist=("al2/mi2/ls8/p1e3",   # shipping bench budget
                             "al2/mi4/ls8/p1e3", "al2/mi6/ls8/p1e3"),
                  seeds=((2, 1), (7, 3), (11, 5))):
    cand = {k: v for k, v in CANDIDATES}
    for seed_train, seed_gp in seeds:
        B, model, gp, dtype = setup(seed_train, seed_gp)
        x0s = x0_set(dtype)
        ca = anchor_costs_for(B, model, gp, dtype, x0s)
        print(f"[seeds] train_key={seed_train} gp_seed={seed_gp} "
              f"anchor={np.round(ca, 1)}", flush=True)
        for label in shortlist:
            r = ratios_for(B, model, gp, dtype, cand[label], x0s, ca)
            print(f"[seeds]   {label:18s} median={np.median(r):7.4f}  "
                  f"max={r.max():7.4f}  per-x0={np.round(r, 4)}", flush=True)


def lat_section(budget="al2/mi6/ls8/p1e3", fixture=False,
                precisions=(None, "default")):
    from benchmarks.bench_spec import DT, X0, XSP
    B, model, gp, dtype = setup(fixture=fixture)
    x0 = jnp.asarray(X0, dtype)
    x_sp = jnp.asarray(XSP, dtype)
    opts = {k: v for k, v in CANDIDATES}[budget]
    for prec in precisions:
        mpc = B.build_mpc(model, gp, dtype, opts, solve_precision=prec)

        def t(k, reps=5, mpc=mpc):
            mpc.solve(x0, k * DT, x_sp, noise=False)
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                xs, _ = mpc.solve(x0, k * DT, x_sp, noise=False)
                sync(xs)
                best = min(best, time.perf_counter() - t0)
            return best

        slopes = [(t(1140) - t(140)) / 1000.0 * 1e3 for _ in range(3)]
        print(f"[lat] {budget} prec={str(prec):8s} "
              f"ms/solve median={np.median(slopes):7.4f} "
              f"all={np.round(slopes, 4)}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["ratio", "seeds", "lat", "all"])
    ap.add_argument("--fixture", action="store_true",
                    help="serve the pinned bench model (bit-reproducible "
                         "quality panels) instead of an in-session fit")
    ap.add_argument("--budget", default="al2/mi2/ls8/p1e3")
    ap.add_argument("--no-prec", action="store_true",
                    help="skip the solve_precision='default' lanes")
    a = ap.parse_args()
    precs = (None,) if a.no_prec else (None, "default")
    if a.section in ("ratio", "all"):
        ratio_section(precisions=precs, fixture=a.fixture)
    if a.section in ("seeds", "all"):
        seeds_section()
    if a.section in ("lat", "all"):
        lat_section(budget=a.budget, fixture=a.fixture, precisions=precs)
