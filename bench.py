"""Headline benchmark: MPC solve latency at horizon N=20 on real TPU.

BASELINE.json metric: "MPC solve latency at N=20 (ms); GP mean/var predict
(us); closed-loop cost parity".  The reference publishes no numbers and the
CasADi/IPOPT baseline cannot run here (casadi not installed, offline —
SURVEY §6), so ``vs_baseline`` reports speedup against the BASELINE.json
north-star target of 1 ms/solve on a single chip: vs_baseline > 1 means the
target is beaten.

Methodology: the whole receding-horizon loop is ONE device-resident
``lax.scan`` (that is the framework's deployment shape — zero host round
trips).  Per-solve latency is the K-slope of total wall time between two
loop lengths, which cancels the axon tunnel's fixed per-call dispatch cost
(~25 ms, measured) that has nothing to do with on-device execution.

Solution-quality tie-in (VERDICT round-1 item 3): the RTI-budget loop
(single-Newton real-time iteration, the headline latency) is only a
legitimate controller if its closed-loop cost matches a converged-budget
run.  Both loops are run and their realized closed-loop costs
sum_t [(x_t - x_sp)' Q (x_t - x_sp) + (u_t - u_sp)' R (u_t - u_sp)] are
reported; ``cost_ratio_rti_vs_converged`` must stay within 1% of 1.0.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N,
   "converged_latency_ms": N, "rti_cost": N, "converged_cost": N,
   "cost_ratio_rti_vs_converged": N, "cost_parity_ok": bool}
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.systems import four_tank_ode
from benchmarks.bench_spec import (Q_W, R_W, ULB, UUB, XLB, XUB, X0, XSP,
                                   DT, NT, MODEL_R, TRAIN_N, TRAIN_UUB,
                                   TRAIN_ULB, TRAIN_XUB, TRAIN_XLB,
                                   closed_loop_cost)

TARGET_MS = 1.0  # BASELINE north star: < 1 ms / MPC solve at N=20


def build_mpc(model, gp, dtype, solver_opts):
    return MPC(horizon=NT * model.dt, model=model, gp=gp, gp_method="TA",
               discrete_method="gp",
               Q=Q_W, R=R_W,
               ulb=ULB, uub=UUB, xlb=XLB, xub=XUB,
               percentile=0.95, feedback=True, cov_updates=1,
               # LQR feedback gain linearized at the setpoint region (the
               # GP has no data at the zero-level default point)
               op_x=XSP,
               op_u=np.array([3.0, 3.0]),
               solver_opts=solver_opts, dtype=dtype)


def main():
    dtype = jnp.float32  # TPU-native precision path
    dt = DT
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10, fused_integrator=True)
    X, Y = model.generate_training_data(
        TRAIN_N, uub=TRAIN_UUB, ulb=TRAIN_ULB,
        xub=TRAIN_XUB, xlb=TRAIN_XLB,
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
            max_iters=100, seed=1,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))

    # warm-started receding horizon runs RTI-grade iteration budgets
    # (single-Newton real-time iteration) for the headline latency; the
    # converged-budget controller is the quality yardstick.  The hot AL
    # penalty (1e4) is what buys cost parity at a single Newton step per
    # period: multipliers warm-carry across steps, and a strong penalty
    # makes the one linearized solve respect the tightened constraints
    # immediately (budget sweep: benchmarks/RESULTS.md).
    mpc_rti = build_mpc(model, gp, dtype,
                        dict(al_iters=1, max_iters=1, ls_steps=8,
                             penalty_init=1e4, fused_kkt=True))
    mpc_full = build_mpc(model, gp, dtype,
                         dict(al_iters=4, max_iters=20, fused_kkt=True))

    x0 = jnp.asarray(X0, dtype)
    x_sp = jnp.asarray(XSP, dtype)

    def timed_loop(mpc, n_steps, reps=7):
        # compile once for this length
        mpc.solve(x0, n_steps * dt, x_sp, noise=False)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            xs, us = mpc.solve(x0, n_steps * dt, x_sp, noise=False)
            jax.block_until_ready(xs)
            best = min(best, time.perf_counter() - t0)
        return best, xs, us

    def k_slope_ms(mpc, reps=7, estimates=3, k_small=20, k_large=140):
        # longer loops + median of repeated slope estimates: the axon
        # tunnel's per-call dispatch jitter (tens of ms, drifting) is the
        # dominant error source at these sub-ms per-step scales
        slopes = []
        for _ in range(estimates):
            t_small, _, _ = timed_loop(mpc, k_small, reps)
            t_large, xs, us = timed_loop(mpc, k_large, reps)
            slopes.append((t_large - t_small) / (k_large - k_small) * 1e3)
        return max(float(np.median(slopes)), 1e-6), xs, us

    # RTI loop: after the round-2 fused kernels the per-step cost is tens of
    # us, so the 20->140 length pair sits inside the tunnel's multi-ms
    # dispatch jitter (a measured slope of ~0).  Use a ~8x longer pair —
    # ~60 ms of real work in the long loop, well above the jitter floor.
    # k_small=140 is shared with the cost-parity run (each distinct loop
    # length is a separate XLA compile; keep the set small).
    def k_slope_rti(reps=5, estimates=3):
        slopes = []
        for _ in range(estimates):
            t_small, xs, us = timed_loop(mpc_rti, 140, reps)
            t_large, _, _ = timed_loop(mpc_rti, 1140, reps)
            slopes.append((t_large - t_small) / 1000.0 * 1e3)
        return max(float(np.median(slopes)), 1e-6), xs, us

    rti_ms, xs_rti, us_rti = k_slope_rti()
    # converged loop: same lengths so closed-loop costs are comparable
    # (both cost evaluations below use the k_large=140-step run); one
    # estimate with fewer reps — at ~10 ms/step the relative tunnel jitter
    # is small and this keeps total bench wall time bounded
    full_ms, xs_full, us_full = k_slope_ms(mpc_full, reps=2, estimates=1)

    cost_rti = closed_loop_cost(xs_rti, us_rti, x_sp)
    cost_full = closed_loop_cost(xs_full, us_full, x_sp)
    ratio = cost_rti / cost_full
    out = {
        "metric": "mpc_solve_latency_N20_four_tank_TA",
        "value": round(rti_ms, 4),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / rti_ms, 4),
        "converged_latency_ms": round(full_ms, 4),
        "rti_cost": round(cost_rti, 3),
        "converged_cost": round(cost_full, 3),
        "cost_ratio_rti_vs_converged": round(ratio, 5),
        "cost_parity_ok": bool(abs(ratio - 1.0) <= 0.01),
    }
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
            out["vs_cpu_slsqp"] = round(cpu_ms / rti_ms, 1)
            out["cpu_cost_parity_ratio"] = base.get(
                "cost_ratio_ours_vs_slsqp")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
