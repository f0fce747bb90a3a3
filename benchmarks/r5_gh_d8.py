"""Round-5: GH at D=8 — price the sparse cubature where GH's generality
matters (VERDICT r4 item 4).

The quadrotor hybrid (Nx=6 + Nu=2 -> D=8) is exactly the plant family the
round-4 GH tensor grid could not serve (order 3 = 6561 points/stage).
This measures the full-controller ms/solve on the PVTOL hybrid loop for:

* TA (the cheap baseline),
* GH auto == degree-5 cubature (129 points/stage, eigenvalue-floored),
* GH order-2 tensor (256 points/stage, PSD by construction),

same model/GP/budget, K-slope with forced sync.

Usage: python benchmarks/r5_gh_d8.py [--cpu]   (--cpu = smoke test only)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".jax_cache")))

from benchmarks._timing import sync  # noqa: E402


def main():
    from gpmpc_tpu import GP, MPC, Model
    from gpmpc_tpu.systems import QUAD_PARAMS, planar_quadrotor_ode

    dtype = jnp.float32
    dt = 0.05
    p_true = dict(QUAD_PARAMS, m=1.3)
    nominal = Model(Nx=6, Nu=2, ode=lambda x, u: planar_quadrotor_ode(x, u),
                    dt=dt, R=np.diag([1e-8] * 6), dtype=dtype,
                    integrator_substeps=4)
    plant = Model(Nx=6, Nu=2,
                  ode=lambda x, u: planar_quadrotor_ode(x, u, p_true),
                  dt=dt, R=np.diag([1e-8] * 6), dtype=dtype,
                  integrator_substeps=4)
    kx, ku = jax.random.split(jax.random.PRNGKey(0))
    x_lo = np.array([-2.0, 0.0, -0.4, -1.5, -1.5, -1.0])
    x_hi = np.array([3.0, 3.0, 0.4, 1.5, 1.5, 1.0])
    xs_s = jax.random.uniform(kx, (40, 6), minval=x_lo, maxval=x_hi,
                              dtype=dtype)
    us_s = jax.random.uniform(ku, (40, 2), minval=2.0, maxval=9.0,
                              dtype=dtype)
    resid = (jax.vmap(plant.integrate)(xs_s, us_s)
             - jax.vmap(nominal.rk4)(xs_s, us_s))
    z = jnp.concatenate([xs_s, us_s], axis=1)

    x0 = jnp.asarray([0.0, 1.0, 0.0, 0.0, 0.0, 0.0], dtype)
    x_sp = np.array([1.5, 2.0, 0.0, 0.0, 0.0, 0.0])

    configs = [
        ("TA (baseline)", dict(gp_method="TA")),
        ("GH auto=cubature5 (129 pts)", dict(gp_method="GH")),
        ("GH order-2 tensor (256 pts)", dict(gp_method="GH", gh_order=2,
                                             gh_grid="tensor")),
    ]
    for label, gkw in configs:
        method = gkw.pop("gp_method")
        gp = GP(z, resid, mean_func="zero", gp_method=method,
                multistart=2, max_iters=150, seed=1, **gkw)
        mpc = MPC(horizon=8 * dt, model=nominal, gp=gp, gp_method=method,
                  discrete_method="hybrid",
                  Q=np.diag([10.0, 30.0, 2.0, 1.0, 1.0, 0.2]),
                  R=0.02 * np.eye(2),
                  ulb=[0.0, 0.0], uub=[10.0, 10.0],
                  xlb=[-5.0, 0.2, -1.0, -5.0, -5.0, -6.0],
                  xub=[5.0, 5.0, 1.0, 5.0, 5.0, 6.0],
                  feedback=False, percentile=0.95, cov_updates=1,
                  solver_opts=dict(al_iters=2, max_iters=4, fused_kkt=True),
                  dtype=dtype)

        def run(k):
            return mpc.solve(x0, k * dt, x_sp, noise=False)

        sync(run(20)[0])

        def t(k, reps=4):
            sync(run(k)[0])
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                xs, _ = run(k)
                sync(xs)
                best = min(best, time.perf_counter() - t0)
            return best, xs

        slopes, xs = [], None
        for _ in range(3):
            t_small, _ = t(20)
            t_large, xs = t(120)
            slopes.append((t_large - t_small) / 100.0 * 1e3)
        xs = np.asarray(xs)
        err_z = abs(float(xs[-1, 1]) - 2.0)
        print(f"[gh-d8] {label:30s} ms/solve median="
              f"{np.median(slopes):7.3f} all={np.round(slopes, 3)} "
              f"final |z err|={err_z:.3f}", flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
