"""Batched closed-loop study — BASELINE config 5.

1024 parallel receding-horizon GP-MPC rollouts from randomized initial
states, each conditioning its own GP online on the transitions it observes;
the batch axis shards over every available device (`Mesh('dp')`).

Usage:  python examples/batched_study.py [--quick] [--tpu] [--batch N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main(quick=False, use_tpu=False, batch=None):
    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.parallel import initialize_multihost, make_study_mesh
    from gpmpc_tpu.parallel.batched import BatchedStudy, save_study
    from gpmpc_tpu.systems import four_tank_ode

    dtype = jnp.float32 if use_tpu else jnp.float64
    b = batch or (16 if quick else 1024)
    n_steps = 5 if quick else 20
    dt = 3.0

    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=10)
    X, Y = model.generate_training_data(
        50, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, multistart=1, max_iters=100, seed=1,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))

    # single-process this is a no-op; on a TPU pod the same two lines
    # join the coordinator and build a 2-D ("dcn", "dp") topology mesh
    initialize_multihost()
    devs = jax.devices()
    mesh = make_study_mesh(devs) if len(devs) > 1 else None
    print(f"devices: {len(devs)} ({jax.default_backend()}), "
          f"mesh: {mesh.axis_names if mesh else 'single'}  batch={b}")

    study = BatchedStudy(
        model, gp, horizon=8 * dt,
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=50 + n_steps + 14,
        solver_opts=dict(al_iters=1, max_iters=3, ls_steps=4), mesh=mesh)

    key = jax.random.PRNGKey(0)
    x0s = jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)[None] + \
        jax.random.uniform(key, (b, 4), dtype=dtype,
                           minval=jnp.asarray([-3.0, -3.0, -0.4, -0.4]),
                           maxval=jnp.asarray([6.0, 6.0, 2.0, 2.0]))
    x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)

    t0 = time.perf_counter()
    res = study.run(x0s, x_sp, n_steps=n_steps, noise=True,
                    key=jax.random.PRNGKey(1))
    jax.block_until_ready(res.cost)
    wall = time.perf_counter() - t0
    cost = np.asarray(res.cost)
    print(f"ran {b} rollouts x {n_steps} steps in {wall:.2f}s "
          f"(incl. compile) = {b * n_steps / wall:,.0f} rollout-solves/s")
    print(f"closed-loop cost: mean {cost.mean():.1f}  p10 "
          f"{np.percentile(cost, 10):.1f}  p90 {np.percentile(cost, 90):.1f}")
    print(f"GP points per rollout after online conditioning: "
          f"{int(np.asarray(res.gp_points)[0])} (from 50)")
    save_study("batched_study.npz", res)
    print("checkpoint written: batched_study.npz (resume via "
          "study.run(..., init_post=load_study(...).post))")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--batch", type=int)
    a = ap.parse_args()
    main(a.quick, a.tpu, a.batch)
