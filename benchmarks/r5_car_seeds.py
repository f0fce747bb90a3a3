"""Round-5: car operating-point robustness across GP training seeds.

The shipping car solver config (al2/mi12 + penalty_init=100/
penalty_mult=30 + merit_viol=10; see bench.build_car) was SELECTED on the
pinned car fixture (benchmarks/bench_fixture.npz).  Pinning removed
session drift from the *benchmark*, but invites the same criticism
VERDICT r4 made of the headline gate: is the mechanism-based feasibility
margin a property of the solver, or of one particular model fit?

This screen answers that by retraining the car residual GP from scratch
at several seeds (each seed drives BOTH the 80-point training-data sample
and the multistart hyper draw, via bench.build_car(gp_seed=)) and running
the clearance-only 130-step closed loop under the shipping config.  Pass
criterion is the bench gate: trajectory-min ellipse clearance >= 0.995.

Caveat on the default seed list: gp_seed=4 draws the SAME training
sample as the pinned fixture (both use PRNGKey(4)); only the multistart
hyper draw differs (seed 4 vs the fixture's 3).  The measured outcome —
seed 4 FAILS the shipping config at 0.982 where the fixture clears at
1.001 — means the overlap does not bias the screen toward the
fixture-tuned config; it is instead direct evidence that the hyper draw
alone flips the near-boundary outcome.

Clearance on a fixed model is deterministic up to last-ulp backend
differences, so the CPU screen predicts the TPU gate; CPU is the default
(pass --tpu to use the chip — the axon tunnel is single-client, so never
concurrently with another TPU process).  Note the JAX_PLATFORMS env var
is ignored in this image; platform must be set via jax.config.

Usage: python benchmarks/r5_car_seeds.py [--seeds 0 1 2 3 4] [--steps 130]
                                         [--config ship|mi15|r4|p99|al3|r4m]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


# Named configs for the cross-seed screen: (solver_opts, percentile).
# "ship" = bench.py's shipping default (al2/mi12 + p100x30 + mv10,
# selected on the pinned fixture); "mi15" = same mechanisms at the mi15
# inner budget (the fixture-measured robustness row, 3.17 ms on v5e);
# "r4" = round 4's budget-only operating point (al3/mi15, default
# penalties, 4.43 ms); "p99" = shipping budget with the chance level
# raised to 0.99 — the control-theoretic robustness lever (more
# covariance inflation on the obstacle tightening) as opposed to more
# solver iterations.
CONFIGS = {
    "ship": (None, 0.95),
    "mi15": (dict(al_iters=2, max_iters=15, penalty_init=100.0,
                  penalty_mult=30.0, merit_viol=10.0, fused_kkt=True),
             0.95),
    "r4": (dict(al_iters=3, max_iters=15, fused_kkt=True), 0.95),
    "p99": (None, 0.99),
    # third AL round at the REDUCED mi12 budget, mechanisms kept — probes
    # whether the seed-robustness r4 buys comes from the al3 multiplier
    # refinement alone (making al3/mi12+mech the cheaper robust point).
    "al3": (dict(al_iters=3, max_iters=12, penalty_init=100.0,
                 penalty_mult=30.0, merit_viol=10.0, fused_kkt=True),
            0.95),
    # the full r4 budget WITH the round-5 mechanisms — distinguishes
    # "mechanisms overfit the fixture" from "budget is simply necessary".
    "r4m": (dict(al_iters=3, max_iters=15, penalty_init=100.0,
                 penalty_mult=30.0, merit_viol=10.0, fused_kkt=True),
            0.95),
    # cheaper-robust candidates (session 3): al3 with the DEFAULT gentle
    # penalty schedule at reduced inner budgets — the screen above showed
    # the default schedule is what carries cross-seed robustness (the
    # aggressive schedule collapses at al3) and that the third AL round's
    # multiplier refinement is the other load-bearing piece; neither says
    # mi15 itself is necessary.
    "r4mi12": (dict(al_iters=3, max_iters=12, fused_kkt=True), 0.95),
    "r4mi10": (dict(al_iters=3, max_iters=10, fused_kkt=True), 0.95),
    "r4mi8": (dict(al_iters=3, max_iters=8, fused_kkt=True), 0.95),
    # r4 budget + the violation-aware merit ALONE (no penalty schedule):
    # decomposes which round-5 mechanism broke al3's robustness above.
    "r4mv": (dict(al_iters=3, max_iters=15, merit_viol=10.0,
                  fused_kkt=True), 0.95),
}


def main(seeds, steps, config):
    import bench as B
    opts, pct = CONFIGS[config]
    clears = []
    for s in seeds:
        mpc, x0, x_sp, con_par, obstacles, dt = B.build_car(
            jnp.float32, solver_opts=opts, cov_updates=1,
            gp_seed=s, percentile=pct)
        xs, _ = mpc.solve(x0, steps * dt, x_sp, noise=False,
                          con_par_func=lambda k: con_par)
        clear = B.car_min_clearance(xs, obstacles)
        clears.append(clear)
        print(f"[car-seeds] config={config} seed={s:2d} clear={clear:6.3f} "
              f"feasible={clear >= 0.995}", flush=True)
    clears = np.asarray(clears)
    print(f"[car-seeds] config={config} {len(seeds)} seeds: "
          f"min={clears.min():.3f} median={np.median(clears):.3f} "
          f"max={clears.max():.3f} "
          f"all_feasible={bool((clears >= 0.995).all())}", flush=True)


def validate_models(seeds):
    """Held-out GP quality per seed — correlates the clearance failures
    with model error (no MPC loop).  Test set: 200 fresh points in the
    same state/input box build_car trains in, residual targets from the
    same integrate-minus-rk4 truth."""
    import bench as B
    for s in seeds:
        mpc = B.build_car(jnp.float32, cov_updates=1, gp_seed=s)[0]
        model, gp = mpc.model, mpc.gp
        kx, ku = jax.random.split(jax.random.PRNGKey(10_000 + s))
        x_t = jax.random.uniform(kx, (200, 4), minval=B.CAR_X_LB,
                                 maxval=B.CAR_X_UB, dtype=jnp.float32)
        u_t = jax.random.uniform(ku, (200, 2), minval=B.CAR_U_LB,
                                 maxval=B.CAR_U_UB, dtype=jnp.float32)
        y_t = (jax.vmap(model.integrate)(x_t, u_t)
               - jax.vmap(model.rk4)(x_t, u_t))
        smse, mnlp, rmse = gp.validate(
            jnp.concatenate([x_t, u_t], axis=1), y_t, verbose=False)
        print(f"[car-seeds] validate seed={s:2d} "
              f"smse_mean={float(np.mean(smse)):.4f} "
              f"smse_max={float(np.max(smse)):.4f} "
              f"mnlp_mean={float(np.mean(mnlp)):.2f}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[0, 1, 2, 3, 4])
    ap.add_argument("--steps", type=int, default=130)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real chip (default: CPU)")
    ap.add_argument("--config", default="ship", choices=list(CONFIGS))
    ap.add_argument("--validate", action="store_true",
                    help="print held-out GP quality per seed instead of "
                         "running the clearance loop")
    a = ap.parse_args()
    if not a.tpu:
        jax.config.update("jax_platforms", "cpu")
    if a.validate:
        validate_models(a.seeds)
    else:
        main(a.seeds, a.steps, a.config)
