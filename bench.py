"""Headline benchmark: MPC solve latency at horizon N=20 on real TPU.

BASELINE.json metric: "MPC solve latency at N=20 (ms); GP mean/var predict
(us); closed-loop cost parity".  The reference publishes no numbers and the
CasADi/IPOPT baseline cannot run here (casadi not installed, offline —
SURVEY §6), so ``vs_baseline`` reports speedup against the BASELINE.json
north-star target of 1 ms/solve on a single chip: vs_baseline > 1 means the
target is beaten.

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
              dtype=dtype)

    x = jnp.asarray([8.0, 10.0, 1.0, 1.5], dtype)
    x_sp = jnp.asarray([14.0, 14.0, 1.8, 1.4], dtype)

    # compile + warm the warm-start state
    u0, warm, _, _ = mpc.solve_step(x, x_sp)
    jax.block_until_ready(u0)

    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        u0, warm, _, _ = mpc.solve_step(x, x_sp, warm=warm, u_prev=u0)
        jax.block_until_ready(u0)
        times.append(time.perf_counter() - t0)
        x = model.integrate(x, u0)
    ms = float(np.median(times) * 1e3)
    print(json.dumps({
        "metric": "mpc_solve_latency_N20_four_tank_TA",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
