"""Detailed benchmark suite (run on TPU; --cpu for a smoke run).

Covers the BASELINE.json metric set beyond the headline bench.py number:
  1. GP predictive mean/var latency (us-scale target, config 1)
  2. ME/TA/EM one-step moment maps
  3. Pallas kernels vs XLA reference (Gram, Cholesky) — compiled, not
     interpreted
  4. MPC solve latency at N=20 (K-slope over the fused loop, configs 2/3)
  5. Batched closed-loop study throughput (config 5: parallel rollouts with
     online GP conditioning)

Methodology: every per-op latency is the K-slope of a device-resident
``lax.scan`` repeating the op (carry-coupled so XLA cannot hoist it), which
cancels the axon tunnel's fixed per-call dispatch cost.  Results are fetched
once per line.

Usage: python benchmarks/detail_bench.py [--cpu] [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from benchmarks._timing import slope as _slope, sync as _sync


def scan_bench(op, k1=256, k2=2048):
    """Per-call seconds for ``op(carry_scalar) -> scalar`` via scan slope."""
    import jax.numpy as jnp
    cache = {}

    def run(k):
        if k not in cache:
            cache[k] = jax.jit(lambda: jax.lax.scan(
                lambda c, _: (op(c) * 1e-30 + c * 0.5, None),
                jnp.float32(1.0), None, length=k)[0])
        return cache[k]()

    return _slope(run, k1, k2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from gpmpc_tpu import GP, MPC, Model
    from gpmpc_tpu.models import gp_core
    from gpmpc_tpu.models.propagate import (propagate_me, propagate_ta,
                                            propagate_em)
    from gpmpc_tpu.ops.kernels import se_ard_gram
    from gpmpc_tpu.ops.pallas_kernels import (se_ard_gram_pallas,
                                              cholesky_pallas)
    from gpmpc_tpu.systems import four_tank_ode
    from gpmpc_tpu.parallel.batched import BatchedStudy

    dtype = jnp.float32
    dt = 3.0
    interp = args.cpu  # pallas kernels need interpret mode off-TPU
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
    post, norm, cfg = gp.post, gp.norm, gp.cfg

    # ---- 1. GP predict (config 1: us-scale target) -----------------------
    for b in (1, 128, 1024):
        zs = jnp.linspace(0.0, 1.0, b * 6, dtype=dtype).reshape(b, 6)

        def op(c, zs=zs):
            def one(z):
                zn = (z + c * 1e-20 - norm.z_mean) / norm.z_std
                mu, var = gp_core.predict(post, zn, cfg)
                return mu.sum() + var.sum()
            return jax.vmap(one)(zs).sum()

        per = scan_bench(op)
        print(f"GP predict mean+var  batch {b:5d}: {per*1e6:9.1f} us/call"
              f"  ({per/b*1e6:7.3f} us/point)")

    # ---- 2. moment maps --------------------------------------------------
    sz = 0.01 * jnp.eye(6, dtype=dtype)
    for name, prop in (("ME", propagate_me), ("TA", propagate_ta),
                       ("EM", propagate_em)):
        def op(c, prop=prop):
            mu, sig, cc = prop(post, norm, cfg,
                               jnp.zeros(6, dtype) + c * 1e-20, sz)
            return mu.sum() + sig.sum()
        per = scan_bench(op)
        print(f"moment map {name}: {per*1e6:9.1f} us/step")

    # ---- 3. Pallas vs XLA kernels ---------------------------------------
    for n in (128, 512):
        xk = jnp.linspace(-2, 2, n * 6, dtype=dtype).reshape(n, 6)
        ell = jnp.ones(6, dtype)

        def op_ref(c, xk=xk):
            return se_ard_gram(xk + c * 1e-20, ell, 1.0, 0.01).sum()

        def op_pal(c, xk=xk):
            return se_ard_gram_pallas(xk + c * 1e-20, ell, 1.0, 0.01,
                                      interpret=interp).sum()

        t_ref = scan_bench(op_ref, k1=32, k2=256)
        t_pal = scan_bench(op_pal, k1=32, k2=256)
        print(f"SE-ARD gram N={n:4d}: XLA {t_ref*1e6:8.1f} us | "
              f"pallas {t_pal*1e6:8.1f} us")

        a = jnp.eye(n, dtype=dtype) * (n * 1.0)

        def op_cref(c, a=a):
            return jnp.linalg.cholesky(a + c * 1e-20).sum()

        def op_cpal(c, a=a):
            return cholesky_pallas(a + c * 1e-20, interpret=interp).sum()

        t_cref = scan_bench(op_cref, k1=16, k2=128)
        t_cpal = scan_bench(op_cpal, k1=16, k2=128)
        print(f"Cholesky   N={n:4d}: XLA {t_cref*1e6:8.1f} us | "
              f"pallas {t_cpal*1e6:8.1f} us")

    # ---- 3b. large-N GP train + predict (scaling evidence, VERDICT r1 #7;
    # goes through the ops.dispatch policy like all GP-core code) ----------
    n_large = 512
    Xl, Yl = model.generate_training_data(
        n_large, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(12))
    t0 = time.perf_counter()
    gp_l = GP(Xl, Yl, mean_func="zero", gp_method="TA", multistart=1,
              max_iters=60, seed=1,
              optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))
    np.asarray(gp_l.hyper.log_ell)
    t_train = time.perf_counter() - t0
    post_l, norm_l, cfg_l = gp_l.post, gp_l.norm, gp_l.cfg

    def op_large(c):
        def one(z):
            zn = (z + c * 1e-20 - norm_l.z_mean) / norm_l.z_std
            mu, var = gp_core.predict(post_l, zn, cfg_l)
            return mu.sum() + var.sum()
        zs = jnp.linspace(0.0, 1.0, 128 * 6, dtype=dtype).reshape(128, 6)
        return jax.vmap(one)(zs).sum()

    per = scan_bench(op_large, k1=16, k2=128)
    print(f"GP N={n_large} train (1 start, 60 iters): {t_train:6.2f} s | "
          f"predict batch 128: {per*1e6:8.1f} us/call "
          f"({per/128*1e6:6.3f} us/point)")

    # ---- 4. MPC solve (configs 2-3) -------------------------------------
    for gm, pc in (("ME", None), ("TA", 0.95)):
        mpc = MPC(horizon=20 * dt, model=model, gp=gp, gp_method=gm,
                  discrete_method="gp",
                  Q=np.diag([20.0, 20.0, 0.1, 0.1]), R=0.05 * np.eye(2),
                  ulb=[0.0, 0.0], uub=[8.0, 8.0],
                  xlb=[0.5, 0.5, 0.1, 0.1], xub=[16.0, 16.0, 8.0, 8.0],
                  percentile=pc, feedback=pc is not None, cov_updates=1,
                  op_x=np.array([14.0, 14.0, 1.8, 1.4]),
                  op_u=np.array([3.0, 3.0]),
                  solver_opts=dict(al_iters=1, max_iters=2, ls_steps=4,
                                   fused_kkt=not args.cpu),
                  dtype=dtype)
        x0 = jnp.asarray([8.0, 10.0, 1.0, 1.5], dtype)
        x_sp = jnp.asarray([14.0, 14.0, 1.8, 1.4], dtype)

        def run(k, mpc=mpc, x0=x0, x_sp=x_sp):
            xs, _ = mpc.solve(x0, k * dt, x_sp, noise=False)
            return xs
        per = _slope(run, 10, 40)
        print(f"MPC solve N=20 ({gm}{'+tight' if pc else ''}): "
              f"{per*1e3:7.3f} ms/solve")

    # ---- 5. batched study (config 5) ------------------------------------
    study = BatchedStudy(
        model, gp, horizon=8 * dt,
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=128,
        solver_opts=dict(al_iters=1, max_iters=3, ls_steps=4))
    b = args.batch
    key = jax.random.PRNGKey(0)
    x0s = jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)[None] + \
        0.5 * jax.random.uniform(key, (b, 4), dtype=dtype)
    x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)

    def run(n, study=study):
        return study.run(x0s, x_sp, n_steps=n, noise=True,
                         key=jax.random.PRNGKey(1)).cost
    per_step = _slope(run, 4, args.steps, reps=3)
    thr = b / per_step
    print(f"batched study B={b}: {per_step*1e3:8.2f} ms/step  "
          f"= {thr:,.0f} rollout-solves/sec (online GP conditioning on)")


if __name__ == "__main__":
    main()
