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

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.systems import four_tank_ode

TARGET_MS = 1.0  # BASELINE north star: < 1 ms / MPC solve at N=20


def main():
    dtype = jnp.float32  # TPU-native precision path
    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=10)
    X, Y = model.generate_training_data(
        100, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
            max_iters=100, seed=1,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))

    mpc = MPC(horizon=20 * dt, model=model, gp=gp, gp_method="TA",
              discrete_method="gp",
              Q=np.diag([20.0, 20.0, 0.1, 0.1]), R=0.05 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.5, 0.5, 0.1, 0.1], xub=[16.0, 16.0, 8.0, 8.0],
              percentile=0.95, feedback=True, cov_updates=1,
              # warm-started receding horizon runs RTI-grade iteration
              # budgets (single-Newton real-time iteration)
              solver_opts=dict(al_iters=1, max_iters=1, ls_steps=4,
                               parallel_kkt=True),
              dtype=dtype)

    x0 = jnp.asarray([8.0, 10.0, 1.0, 1.5], dtype)
    x_sp = jnp.asarray([14.0, 14.0, 1.8, 1.4], dtype)

    def timed_loop(n_steps):
        # compile once for this length
        mpc.solve(x0, n_steps * dt, x_sp, noise=False)
        reps = []
        for _ in range(7):
            t0 = time.perf_counter()
            xs, _ = mpc.solve(x0, n_steps * dt, x_sp, noise=False)
            jax.block_until_ready(xs)
            reps.append(time.perf_counter() - t0)
        return min(reps)

    k_small, k_large = 10, 80
    t_small = timed_loop(k_small)
    t_large = timed_loop(k_large)
    per_solve_ms = (t_large - t_small) / (k_large - k_small) * 1e3
    per_solve_ms = max(per_solve_ms, 1e-6)
    print(json.dumps({
        "metric": "mpc_solve_latency_N20_four_tank_TA",
        "value": round(per_solve_ms, 4),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / per_solve_ms, 4),
    }))


if __name__ == "__main__":
    main()
