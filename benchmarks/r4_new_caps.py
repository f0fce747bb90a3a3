"""TPU numbers for the late round-4 capabilities (VERDICT r3 weak #2 says
new capabilities must not ship CPU-only).

Sections (``--section gh|fifo|online_mean|all``):

* ``gh``     — Gauss-Hermite propagation (gp_method='GH', order 3 = 729
               quadrature points at D=6) inside the headline four-tank MPC
               loop at the RTI budget, vs the TA headline: ms/solve
               (K-slope) + realized closed-loop cost on the pinned model.
* ``fifo``   — BatchedStudy B=1024 with ``online_policy='fifo'`` (exact
               eviction downdate per accepted point) vs 'saturate':
               rollout-solves/s + psum'd ensemble mean cost.
* ``online_mean`` — adaptive single-rollout MPC (online_capacity=64) with
               a LINEAR prior mean riding along frozen: ms/solve + final
               tracking error, against the same loop with a zero-mean GP
               (both trained in-session f32 at the 1e-4 noise floor, fixed
               seeds — this section measures the mean path's cost, not
               session-stable quality).

Run on the live chip from the repo root:  python benchmarks/r4_new_caps.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import sync  # noqa: E402
from benchmarks.bench_spec import (  # noqa: E402
    DT, MODEL_R, NT, Q_W, R_W, ULB, UUB, X0, XLB, XSP, XUB,
    closed_loop_cost)


def _tank_model(dtype, fused=True):
    from gpmpc_tpu import Model
    from gpmpc_tpu.systems import four_tank_ode
    return Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                 R=MODEL_R, clip_negative=True, dtype=dtype,
                 integrator_substeps=10, fused_integrator=fused)


def _fixture_gp(dtype, **kw):
    import bench
    gp = bench._fixture_gp("tank", dtype, **kw)
    assert gp is not None, "bench fixture missing"
    return gp


def _k_slope(run, k1, k2, reps=4, estimates=3):
    def t(k):
        sync(run(k))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(k))
            best = min(best, time.perf_counter() - t0)
        return best
    return [(t(k2) - t(k1)) / (k2 - k1) for _ in range(estimates)]


def section_gh(out):
    from bench import build_mpc
    dtype = jnp.float32
    model = _tank_model(dtype)
    opts = dict(al_iters=2, max_iters=4, ls_steps=8, penalty_init=1e3,
                fused_kkt=True)
    x_sp = jnp.asarray(XSP, dtype)
    x0 = jnp.asarray(X0, dtype)
    for method in ("TA", "GH"):
        gp = _fixture_gp(dtype, gp_method=method,
                         optimizer_opts=dict(min_noise=1e-4))
        if method == "TA":
            mpc = build_mpc(model, gp, dtype, opts)
        else:
            from gpmpc_tpu import MPC
            mpc = MPC(horizon=NT * DT, model=model, gp=gp, gp_method="GH",
                      discrete_method="gp", Q=Q_W, R=R_W,
                      ulb=ULB, uub=UUB, xlb=XLB, xub=XUB,
                      percentile=0.95, feedback=True, cov_updates=1,
                      op_x=XSP, op_u=np.array([3.0, 3.0]),
                      solver_opts=opts, dtype=dtype)

        def run(k, mpc=mpc):
            return mpc.solve(x0, k * DT, x_sp, noise=False)[0]

        slopes = sorted(s * 1e3 for s in _k_slope(run, 20, 140))
        xs, us = mpc.solve(x0, 140 * DT, x_sp, noise=False)
        out[f"{method.lower()}_rti_ms"] = round(float(np.median(slopes)), 4)
        out[f"{method.lower()}_rti_ms_spread"] = [round(s, 4) for s in slopes]
        out[f"{method.lower()}_cost"] = round(closed_loop_cost(xs, us), 2)


def section_fifo(out):
    from gpmpc_tpu.parallel.batched import BatchedStudy
    dtype = jnp.float32
    model = _tank_model(dtype, fused=False)
    gp = _fixture_gp(dtype, gp_method="TA",
                     optimizer_opts=dict(min_noise=1e-4))
    b = 1024
    x0s = (jnp.asarray([8.0, 9.0, 1.0, 1.0], dtype)[None]
           + 0.5 * jax.random.uniform(jax.random.PRNGKey(0), (b, 4),
                                      dtype=dtype))
    x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)
    for policy in ("saturate", "fifo"):
        study = BatchedStudy(
            model, gp, horizon=8 * DT,
            Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
            ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=128,
            online_policy=policy,
            solver_opts=dict(al_iters=1, max_iters=3, ls_steps=4),
            solve_precision="default")

        def run(n, study=study):
            return study.run(x0s, x_sp, n_steps=n, noise=True,
                             key=jax.random.PRNGKey(1)).cost

        slopes = sorted(_k_slope(run, 4, 12, reps=3, estimates=2))
        cost = float(jnp.mean(run(12)))
        per_step = max(float(np.median(slopes)), 1e-9)
        out[f"study_{policy}_solves_per_s"] = round(b / per_step, 0)
        out[f"study_{policy}_spread"] = [
            round(b / max(float(s), 1e-9), 0) for s in slopes]
        out[f"study_{policy}_mean_cost"] = round(cost, 2)


def section_online_mean(out):
    from gpmpc_tpu import GP, MPC
    dtype = jnp.float32
    model = _tank_model(dtype)
    X, Y = model.generate_training_data(
        40, uub=[2.5, 2.5], ulb=[0.0, 0.0],
        xub=[8.0, 8.0, 2.0, 2.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(3))
    x_sp = jnp.asarray(XSP, dtype)
    x0 = jnp.asarray(X0, dtype)
    for mf in ("zero", "linear"):
        gp = GP(X, Y, mean_func=mf, multistart=2, max_iters=150, seed=1,
                optimizer_opts=dict(min_noise=1e-4))
        mpc = MPC(horizon=5 * DT, model=model, gp=gp, gp_method="ME",
                  discrete_method="gp",
                  Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
                  ulb=[0.0, 0.0], uub=[8.0, 8.0],
                  feedback=False, percentile=None, cov_updates=1,
                  online_capacity=64, dtype=dtype,
                  solver_opts=dict(al_iters=2, max_iters=4, ls_steps=8,
                                   penalty_init=1e3, fused_kkt=True))

        def run(k, mpc=mpc):
            return mpc.solve(x0, k * DT, x_sp, noise=True,
                             key=jax.random.PRNGKey(5))[0]

        slopes = sorted(s * 1e3 for s in _k_slope(run, 20, 140))
        xs = np.asarray(run(60))
        err = float(np.abs(xs[-10:, :2] - np.asarray(XSP[:2])).mean())
        assert np.isfinite(xs).all()
        out[f"online_{mf}_ms"] = round(float(np.median(slopes)), 4)
        out[f"online_{mf}_ms_spread"] = [round(s, 4) for s in slopes]
        out[f"online_{mf}_track_err"] = round(err, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["gh", "fifo", "online_mean", "all"])
    args = ap.parse_args()
    out = {"device": str(jax.devices()[0])}
    if args.section in ("gh", "all"):
        section_gh(out)
    if args.section in ("fifo", "all"):
        section_fifo(out)
    if args.section in ("online_mean", "all"):
        section_online_mean(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
