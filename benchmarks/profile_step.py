"""Decompose the headline RTI solve step into its components (TPU).

Answers "where do the 0.4 ms go?" for the bench.py config: per-component
K-slope latency of (1) the full _solve_step, (2) the zero-order covariance
refresh (TA scan over Nt stages + margins), (3) the AL-SQP solve at fixed
margins, (4) the plant integrate.  Methodology identical to
detail_bench.py (device-resident scan slope, forced D2H sync).

Usage: python benchmarks/profile_step.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from benchmarks._timing import slope as _slope


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from gpmpc_tpu import GP, MPC, Model
    from gpmpc_tpu.mpc.controller import MPCParams
    from gpmpc_tpu.solvers import al_sqp
    from gpmpc_tpu.systems import four_tank_ode

    dtype = jnp.float32
    dt = 3.0
    print(f"backend: {jax.default_backend()}")

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
              op_x=np.array([14.0, 14.0, 1.8, 1.4]),
              op_u=np.array([3.0, 3.0]),
              # the bench.py round-3 RTI operating point
              solver_opts=dict(al_iters=2, max_iters=4, ls_steps=8,
                               penalty_init=1e3, fused_kkt=True),
              dtype=dtype)

    x0 = jnp.asarray([8.0, 10.0, 1.0, 1.5], dtype)
    x_sp = mpc._ref_window(jnp.asarray([14.0, 14.0, 1.8, 1.4], dtype))
    u_prev = jnp.zeros(2, dtype)
    sigma0 = jnp.zeros((4, 4), dtype)
    con_par = jnp.zeros(0, dtype)
    consts = mpc.consts
    warm = mpc._init_warm(mpc._augment_x0(x0, u_prev), x_sp)
    # settle the warm state with one full step
    warm, _, sigmas, _ = mpc._solve_step(warm, x0, x_sp, u_prev, sigma0,
                                         con_par, consts,
                                         cfg=mpc.init_sqp_cfg)
    mx, mu_m = mpc._margins(sigmas, consts)
    params = MPCParams(x0=x0, x_sp=x_sp, u_prev=u_prev, margins_x=mx,
                       margins_u=mu_m, sigmas=sigmas, con_par=con_par,
                       consts=consts)

    def bench(name, scan_body, carry0, k1=64, k2=512):
        cache = {}

        def run(k):
            if k not in cache:
                cache[k] = jax.jit(lambda c: jax.lax.scan(
                    scan_body, c, None, length=k)[0])
            return cache[k](carry0)

        per = _slope(run, k1, k2)
        print(f"{name:<42s} {per*1e6:9.1f} us")
        return per

    # 1. full solve step (what bench.py pays per control period)
    def full_body(c, _):
        st, u0, _s, _i = mpc._solve_step(c, x0, x_sp, u_prev, sigma0,
                                         con_par, consts)
        return st, None
    t_full = bench("full _solve_step (RTI budget)", full_body, warm)

    # 2. covariance refresh: TA propagation scan + margins
    def cov_body(c, _):
        sig = mpc.propagate_covariances(warm.x, warm.u, sigma0 + c * 1e-30,
                                        consts)
        m1, m2 = mpc._margins(sig, consts)
        return c * 0.5 + m1.sum() * 1e-30 + m2.sum() * 1e-30, None
    t_cov = bench("cov refresh (TA scan Nt=20 + margins)", cov_body,
                  jnp.float32(0.0))

    # 3. AL-SQP solve at fixed margins/sigmas
    def sqp_body(c, _):
        res = al_sqp.solve(mpc.problem, params, c, mpc.sqp_cfg)
        return res.state, None
    t_sqp = bench("al_sqp.solve (RTI budget al2 x mi4)", sqp_body, warm)

    # 3a-3d. inside one Gauss-Newton iteration (the inner-loop body):
    from gpmpc_tpu.solvers import riccati
    mu_al = jnp.asarray(1e3, dtype)
    reg = jnp.asarray(1e-6, dtype)

    def qp_body(c, _):
        st = warm._replace(x=warm.x + c * 1e-30)
        qp, defects = al_sqp._build_qp(mpc.problem, st, params, mu_al, reg)
        # consume EVERY field or XLA dead-code-eliminates the jacobians
        sink = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(qp))
        return c * 0.5 + sink * 1e-30, None
    bench("  _build_qp (jacfwd+hessian, Nt=20)", qp_body, jnp.asarray(0.0, dtype))

    def qp_riccati_body(c, _):
        st = warm._replace(x=warm.x + c * 1e-30)
        qp, _ = al_sqp._build_qp(mpc.problem, st, params, mu_al, reg)
        sol = riccati.solve_fused(qp, jnp.zeros(mpc.Nxa, dtype), reg)
        return c * 0.5 + sol.dx.sum() * 1e-30, None
    bench("  _build_qp + fused Riccati", qp_riccati_body,
          jnp.asarray(0.0, dtype))

    def merit_body(c, _):
        st = warm._replace(x=warm.x + c * 1e-30)
        m, _ = al_sqp._merit(mpc.problem, st, params, mu_al,
                             jnp.asarray(1e3, dtype))
        return c * 0.5 + m * 1e-30, None
    bench("  _merit (1 eval)", merit_body, jnp.asarray(0.0, dtype))

    def ls_body(c, _):
        alphas = 0.5 ** jnp.arange(8, dtype=dtype)

        def try_alpha(alpha):
            st = warm._replace(x=warm.x + (alpha + c) * 1e-30)
            m, _ = al_sqp._merit(mpc.problem, st, params, mu_al,
                                 jnp.asarray(1e3, dtype))
            return m
        ms = jax.vmap(try_alpha)(alphas)
        return c * 0.5 + ms.sum() * 1e-30, None
    bench("  line search (vmap 8 merit evals)", ls_body,
          jnp.asarray(0.0, dtype))

    def stat_body(c, _):
        st = warm._replace(x=warm.x + c * 1e-30)
        s = al_sqp._kkt_stat(mpc.problem, st, params, mu_al)
        return c * 0.5 + s * 1e-30, None
    bench("  _kkt_stat (final diagnostics)", stat_body,
          jnp.asarray(0.0, dtype))

    # 4. plant integrate (10 RK4 substeps)
    def plant_body(c, _):
        return model.integrate(c, u_prev), None
    t_plant = bench("plant integrate (10 substeps)", plant_body, x0,
                    k1=256, k2=2048)

    print(f"\nsum of parts: {(t_cov + t_sqp + t_plant)*1e6:.1f} us "
          f"vs full step {t_full*1e6:.1f} us "
          f"(residual = shift/clip/logging/fusion effects)")


if __name__ == "__main__":
    main()
