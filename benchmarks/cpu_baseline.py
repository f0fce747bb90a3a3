"""Measured CPU baseline in the reference's execution architecture.

The true CasADi/IPOPT baseline cannot run here (no casadi wheel, offline —
SURVEY §6, PARITY 'known gaps'), so this script measures the closest
runnable stand-in for the reference's execution model
[SURVEY §3.4 'MPC.solve' call stack]:

* a **Python receding-horizon loop** on the host,
* each control step solved by a **native dense SQP NLP solver**
  (scipy's SLSQP — compiled Fortran, the same architectural role IPOPT
  plays for the reference),
* NLP callbacks (objective/constraints + exact AD gradients/Jacobians)
  are **jit-compiled XLA CPU** executables — the analog of CasADi's
  compiled VM callbacks, if anything *faster* than the reference's, which
  biases the comparison AGAINST our speedup claim,
* identical problem instance: the SAME trained GP posterior, weights,
  bounds, horizon, and plant as `bench.py`'s config (BASELINE config 2:
  four-tank, mean-equivalent propagation, N=20, box constraints), so
  closed-loop cost parity is checkable directly.

Caveats stated plainly: SLSQP is a dense active-set SQP while IPOPT is a
sparse interior-point method; published CasADi/IPOPT timings for GP-MPC
problems of this size are typically tens of ms/solve, the same order as
what this measures.  This gives a *measured, same-host, same-problem*
CPU number where before there was only a plausibility argument.

Writes ``benchmarks/cpu_baseline.json`` (read by ``bench.py`` to report
``vs_cpu_slsqp``) and prints a summary.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from scipy.optimize import minimize  # noqa: E402

from gpmpc_tpu import GP, MPC, Model  # noqa: E402
from gpmpc_tpu.models.gp import mean_fn_functional  # noqa: E402
from gpmpc_tpu.systems import four_tank_ode  # noqa: E402
# the problem instance (weights, bounds, start/setpoint, cost metric) is
# SHARED with bench.py via this module — the "matched closed-loop cost"
# claim depends on both sides solving the identical problem
from benchmarks.bench_spec import (  # noqa: E402
    Q_W, R_W, P_W, ULB, UUB, XLB, XUB, X0, XSP, DT, MODEL_R,
    TRAIN_N, TRAIN_UUB, TRAIN_ULB, TRAIN_XUB, TRAIN_XLB, closed_loop_cost)

OUT_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cpu_baseline.json")


def build_problem(nt=20, n_steps=20, seed=2, n_train=TRAIN_N):
    """Same model + trained GP as bench.py (x64 here for the CPU path)."""
    dt = DT
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=MODEL_R, clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=10)
    X, Y = model.generate_training_data(
        n_train, uub=TRAIN_UUB, ulb=TRAIN_ULB,
        xub=TRAIN_XUB, xlb=TRAIN_XLB,
        key=jax.random.PRNGKey(seed))
    # min_noise=1e-4 since round 4: the bench spec's f32-safe noise floor
    # (see make_bench_fixture.py) — kept identical on the CPU side so the
    # two sides keep solving the same problem class
    gp = GP(X, Y, mean_func="zero", gp_method="ME", multistart=1,
            max_iters=100, seed=1,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-4))
    return model, gp, dt, nt, n_steps


def make_nlp(gp, nt, nx=4, nu=2):
    """Multiple-shooting NLP over the GP-mean dynamics (ME: Sigma == 0),
    exactly the reference's transcription [SURVEY §3.3]: decision vector
    w = [X (nt+1, nx); U (nt, nu)], equality constraints = shooting gaps,
    box bounds on X and U."""
    post, norm, cfg = gp.post, gp.norm, gp.cfg
    n_w = (nt + 1) * nx + nt * nu

    def split(w):
        xs = w[:(nt + 1) * nx].reshape(nt + 1, nx)
        us = w[(nt + 1) * nx:].reshape(nt, nu)
        return xs, us

    def objective(w, x_sp):
        xs, us = split(w)
        ex = xs[:-1] - x_sp
        en = xs[-1] - x_sp
        return (jnp.einsum("ti,ij,tj->", ex, jnp.asarray(Q_W), ex)
                + jnp.einsum("ti,ij,tj->", us, jnp.asarray(R_W), us)
                + en @ jnp.asarray(P_W) @ en)

    def eq_con(w, x0):
        xs, us = split(w)
        step = jax.vmap(lambda x, u: mean_fn_functional(
            post, norm, cfg, jnp.concatenate([x, u])))
        gaps = xs[1:] - step(xs[:-1], us)
        return jnp.concatenate([(xs[0] - x0), gaps.ravel()])

    f = jax.jit(jax.value_and_grad(objective))
    g = jax.jit(eq_con)
    gj = jax.jit(jax.jacfwd(eq_con))
    lb = np.concatenate([np.tile(XLB, nt + 1), np.tile(ULB, nt)])
    ub = np.concatenate([np.tile(XUB, nt + 1), np.tile(UUB, nt)])
    return f, g, gj, lb, ub, split, n_w


def make_ta_margins(gp, quantile):
    """Zero-order TA chance-tightening margins, mirroring the controller's
    scheme exactly (``MPC._cov_step``/``_margins`` with feedback=False):
    Sigma_{t+1} = TA(sig_y at (x_t, u_t, Sigma_t)) + noise_cov, margins
    Phi^{-1}(p)*sqrt(diag Sigma_t) clamped to 0.49*box.  Gives the SLSQP
    loop the same tightened NLP the AL-SQP controller solves."""
    from gpmpc_tpu.models.propagate import propagate_ta

    post, norm, cfg = gp.post, gp.norm, gp.cfg
    noise_cov = gp.noise_cov()
    box = jnp.asarray(np.asarray(XUB) - np.asarray(XLB))

    @jax.jit
    def margins(xs, us):
        nx = xs.shape[1]

        def step(sig, xu):
            x, u = xu
            z = jnp.concatenate([x, u])
            sig_z = jnp.zeros((z.shape[0], z.shape[0]),
                              xs.dtype).at[:nx, :nx].set(sig)
            _, sig_y, _ = propagate_ta(post, norm, cfg, z, sig_z)
            sig_n = sig_y + noise_cov
            return 0.5 * (sig_n + sig_n.T), sig

        sig_last, sigs = jax.lax.scan(
            step, jnp.zeros((nx, nx), xs.dtype), (xs[:-1], us))
        sigs = jnp.concatenate([sigs, sig_last[None]], axis=0)
        dx = jnp.sqrt(jnp.clip(jax.vmap(jnp.diagonal)(sigs), 0.0, None))
        return jnp.minimum(quantile * dx, 0.49 * box)

    return margins


def run_slsqp_loop(model, gp, nt, n_steps, percentile=None):
    """The reference's MPC.solve shape: per step pack params, warm start
    from the shifted previous solution, call the native NLP solver, apply
    u0* to the plant [SURVEY §3.4].  With ``percentile`` set, the state
    boxes are chance-tightened per stage by the zero-order TA margins
    (BASELINE config 3), computed along the shifted warm trajectory just
    like the controller's covariance pass."""
    f, g, gj, lb, ub, split, n_w = make_nlp(gp, nt)
    x_sp = jnp.asarray(XSP)
    margins = None
    if percentile is not None:
        from scipy.stats import norm as _norm
        margins = make_ta_margins(gp, float(_norm.ppf(percentile)))

    # initial guess mirrors al_sqp.init_state exactly: roll the GP-mean
    # dynamics from X0 under zero input (trajectory-parity tests compare
    # the two loops step by step, so the warm-start logic must match)
    post, norm, cfg = gp.post, gp.norm, gp.cfg
    x_c, xs0 = jnp.asarray(X0), [np.asarray(X0)]
    for _ in range(nt):
        x_c = mean_fn_functional(post, norm, cfg,
                                 jnp.concatenate([x_c, jnp.zeros(2)]))
        xs0.append(np.asarray(x_c))
    w = np.concatenate([np.array(xs0).ravel(), np.zeros(nt * 2)])
    x = jnp.asarray(X0)
    xs_sim, us_sim, solve_times, nit = [np.asarray(x)], [], [], []
    for _ in range(n_steps):
        x0_h = jnp.asarray(x)
        cons = [{"type": "eq",
                 "fun": lambda w_, x0_=x0_h: np.asarray(g(jnp.asarray(w_), x0_)),
                 "jac": lambda w_, x0_=x0_h: np.asarray(gj(jnp.asarray(w_), x0_))}]
        lb_k, ub_k = lb, ub
        if margins is not None:
            xs_w, us_w = split(w)
            mx = np.asarray(margins(jnp.asarray(np.vstack([np.asarray(x)[None],
                                                           xs_w[1:]])),
                                    jnp.asarray(us_w)))
            lb_k = np.concatenate([(np.tile(XLB, (nt + 1, 1)) + mx).ravel(),
                                   np.tile(ULB, nt)])
            ub_k = np.concatenate([(np.tile(XUB, (nt + 1, 1)) - mx).ravel(),
                                   np.tile(UUB, nt)])
        t0 = time.perf_counter()
        res = minimize(
            lambda w_: tuple(np.asarray(v) for v in f(jnp.asarray(w_), x_sp)),
            w, jac=True, bounds=list(zip(lb_k, ub_k)), constraints=cons,
            method="SLSQP", options={"maxiter": 200, "ftol": 1e-9})
        solve_times.append(time.perf_counter() - t0)
        nit.append(res.nit)
        xs_o, us_o = split(res.x)
        u0 = np.clip(np.asarray(us_o[0]), ULB, UUB)
        x = model.integrate(x, jnp.asarray(u0))
        xs_sim.append(np.asarray(x))
        us_sim.append(u0)
        # warm start: shift EXACTLY like al_sqp.shift_state ([x0, x2.., xNt,
        # xNt]) so the tightened NLPs both sides solve are built from the
        # same trajectory
        xs_w = np.vstack([np.asarray(x)[None], xs_o[2:], xs_o[-1:]])
        us_w = np.vstack([us_o[1:], us_o[-1:]])
        w = np.concatenate([xs_w.ravel(), us_w.ravel()])
    return (np.array(xs_sim), np.array(us_sim), np.array(solve_times),
            np.array(nit))


def run_ours(model, gp, nt, n_steps, dt):
    """Our framework on the same problem (CPU here; the TPU number is
    bench.py's headline).  Converged budget for a like-for-like cost."""
    mpc = MPC(horizon=nt * dt, model=model, gp=gp, gp_method="ME",
              discrete_method="gp", Q=Q_W, R=R_W,
              ulb=ULB, uub=UUB, xlb=XLB, xub=XUB,
              feedback=False, cov_updates=1, dtype=jnp.float64,
              solver_opts=dict(al_iters=4, max_iters=20))
    mpc.solve(jnp.asarray(X0), n_steps * dt, jnp.asarray(XSP), noise=False)
    t0 = time.perf_counter()
    xs, us = mpc.solve(jnp.asarray(X0), n_steps * dt, jnp.asarray(XSP),
                       noise=False)
    jax.block_until_ready(xs)
    wall = time.perf_counter() - t0
    return np.asarray(xs), np.asarray(us), wall / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--nt", type=int, default=20)
    args = ap.parse_args()

    model, gp, dt, nt, n_steps = build_problem(args.nt, args.steps)

    xs_b, us_b, times, nit = run_slsqp_loop(model, gp, nt, n_steps)
    cost_b = closed_loop_cost(xs_b, us_b, XSP)
    med_ms = float(np.median(times) * 1e3)

    xs_o, us_o, ours_ms = run_ours(model, gp, nt, n_steps, dt)
    cost_o = closed_loop_cost(xs_o, us_o, XSP)

    out = {
        "config": "four-tank ME N=%d, %d control steps (BASELINE config 2)"
                  % (nt, n_steps),
        "solver": "scipy SLSQP (native Fortran dense SQP) + jitted XLA-CPU "
                  "AD callbacks; reference-architecture Python receding loop",
        "cpu_slsqp_ms_per_solve_median": round(med_ms, 3),
        "cpu_slsqp_ms_per_solve_mean": round(float(np.mean(times) * 1e3), 3),
        "cpu_slsqp_iters_mean": round(float(np.mean(nit)), 2),
        "cpu_slsqp_closed_loop_cost": round(cost_b, 3),
        "ours_cpu_x64_ms_per_solve": round(ours_ms * 1e3, 3),
        "ours_cpu_x64_closed_loop_cost": round(cost_o, 3),
        "cost_ratio_ours_vs_slsqp": round(cost_o / cost_b, 5),
    }
    with open(OUT_JSON, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
