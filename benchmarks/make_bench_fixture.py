"""Generate the pinned bench model fixture (CPU x64, deterministic).

Round-4 finding (`benchmarks/r4_gate.py`, `r4_car_margin.py`): the bench
GPs were retrained on the TPU every session, and the f32 fit drifts across
sessions with IDENTICAL seeds/code (XLA autotuning/fusion choices move the
L-BFGS trajectory) — the realized-cost ratio moved +-3% and the car
clearance 0.92 <-> 0.99 session to session, which is what made the round-3
gates coin flips.  The model is benchmark SETUP, not a benchmark metric
(GP training latency is reported separately in RESULTS.md), so it should
be pinned: this script trains both bench GPs on CPU — bit-deterministic
across sessions — and freezes training data + hyperparameters into
``benchmarks/bench_fixture.npz``.  ``bench.py`` loads the fixture when
present (and falls back to in-session training when absent).

Trained in f32, NOT x64: an x64 fit descends the NLL far enough to drive
sn2 to ~4e-6, below the f32 conditioning cliff — serving those hypers in
the f32 TPU posterior produced garbage predictive variances and closed-loop
costs of 130k-175k for BOTH the RTI and converged controllers (measured;
the same cliff device_parity.py documents and avoids with min_noise=1e-4).
The f32 CPU fit stays in the regime the production path actually runs in,
while remaining session-deterministic.

Regenerate ONLY when the bench problem spec changes:
    python benchmarks/make_bench_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")
# f32 on purpose — see the conditioning-cliff note in the docstring

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.systems import car_ode, four_tank_ode
    from benchmarks.bench_spec import (DT, MODEL_R, TRAIN_N, TRAIN_UUB,
                                       TRAIN_ULB, TRAIN_XUB, TRAIN_XLB)

    dtype = jnp.float32
    out = {}

    # --- tank (bench_spec instance, same seeds as bench.py) ---------------
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=MODEL_R, clip_negative=True, dtype=dtype,
                  integrator_substeps=10)
    X, Y = model.generate_training_data(
        TRAIN_N, uub=TRAIN_UUB, ulb=TRAIN_ULB, xub=TRAIN_XUB,
        xlb=TRAIN_XLB, key=jax.random.PRNGKey(2))
    # min_noise=1e-4: the f32-SAFE noise floor (same rationale as
    # device_parity.py) — at 1e-5 BOTH an x64 and a CPU-f32 fit descend to
    # sn2 ~ 4e-6, where the served f32 posterior's predictive variances are
    # cancellation-degraded and the closed loop lands in the 7k-175k cost
    # class instead of ~2.2k (measured, round 4).  The in-session TPU fits
    # only avoided the cliff by terminating earlier on noisier gradients —
    # i.e. by luck, which is exactly the session noise this fixture removes.
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
            max_iters=100, seed=1,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-4))
    out.update(tank_X=np.asarray(X), tank_Y=np.asarray(Y),
               tank_log_ell=np.asarray(gp.hyper.log_ell),
               tank_log_sf2=np.asarray(gp.hyper.log_sf2),
               tank_log_sn2=np.asarray(gp.hyper.log_sn2))

    # --- car (bench.bench_car instance, same seeds) ------------------------
    dt = 0.1
    car = Model(Nx=4, Nu=2, ode=lambda x, u: car_ode(x, u), dt=dt,
                R=np.diag([1e-5, 1e-5, 1e-6, 1e-5]),
                dtype=dtype, integrator_substeps=10)
    kx, ku = jax.random.split(jax.random.PRNGKey(4))
    x_lb = np.array([-1.0, -1.0, -0.6, 0.0])
    x_ub = np.array([1.0, 1.0, 0.6, 8.0])
    u_lb, u_ub = np.array([-3.0, -0.5]), np.array([3.0, 0.5])
    x_s = jax.random.uniform(kx, (80, 4), minval=x_lb, maxval=x_ub,
                             dtype=dtype)
    u_s = jax.random.uniform(ku, (80, 2), minval=u_lb, maxval=u_ub,
                             dtype=dtype)
    resid = (jax.vmap(car.integrate)(x_s, u_s)
             - jax.vmap(car.rk4)(x_s, u_s))
    Xc = jnp.concatenate([x_s, u_s], axis=1)
    gpc = GP(Xc, resid, mean_func="zero", gp_method="EM", multistart=2,
             max_iters=200, seed=3)
    out.update(car_X=np.asarray(Xc), car_Y=np.asarray(resid),
               car_log_ell=np.asarray(gpc.hyper.log_ell),
               car_log_sf2=np.asarray(gpc.hyper.log_sf2),
               car_log_sn2=np.asarray(gpc.hyper.log_sn2))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_fixture.npz")
    np.savez(path, **out)
    print(f"fixture written: {path}")
    print(f"tank hypers: sf2={np.exp(out['tank_log_sf2']).round(4)} "
          f"sn2={np.exp(out['tank_log_sn2']).round(7)}")
    print(f"car hypers:  sf2={np.exp(out['car_log_sf2']).round(5)}")


if __name__ == "__main__":
    main()
