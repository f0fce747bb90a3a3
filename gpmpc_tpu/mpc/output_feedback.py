"""Fused output-feedback GP-MPC: estimator + controller + plant, ONE program.

The reference's receding loop feeds the exact plant state back [SURVEY C6
runtime]; real plants offer sensors.  :mod:`gpmpc_tpu.mpc.mhe` supplies the
estimator and this module closes the loop the TPU-native way: measurement →
MHE window solve → MPC solve → plant step, for the whole simulation, inside
ONE ``lax.scan`` — two trajectory NLPs per control period and zero host
round-trips (the same fusion discipline as ``MPC.solve``'s full-state loop
[SURVEY §3.4 'the rebuild fuses this whole body on-device']).

``examples/output_feedback.py`` demonstrates the host-composed variant
(``mhe.step`` + ``mpc.solve_step`` per step — the right shape for driving a
REAL plant, where the measurement arrives from hardware);
:func:`simulate_output_feedback` is the simulation/evaluation counterpart
for when the plant is the model itself, e.g. tuning estimator/controller
covariances or Monte-Carlo studies, where per-step host round-trips would
dominate wall time.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from gpmpc_tpu.solvers import al_sqp


class OutputFeedbackResult(NamedTuple):
    """Realized closed loop under estimated-state feedback."""

    x_true: jnp.ndarray           # (M+1, Nx) plant states
    x_hat: jnp.ndarray            # (M, Nx) MHE estimates the MPC acted on
    u: jnp.ndarray                # (M, Nu) applied inputs
    y: jnp.ndarray                # (M, Nm) measurements
    mpc_converged: jnp.ndarray    # (M,) controller solve status
    mhe_converged: jnp.ndarray    # (M,) estimator solve status


def _make_runner(mpc, mhe):
    sigma0 = jnp.zeros((mpc.Nx, mpc.Nx), mpc.dtype)

    def run(x0, est_state, warm, ref_windows, con_pars, noise_w, noise_v,
            n_steps):
        u_start = jnp.zeros(mpc.Nu, mpc.dtype)

        # cold-start preconditioning, as in MPC._closed_loop: one
        # full-budget solve so the in-loop (possibly RTI-grade) budget
        # only tracks
        if mpc.init_sqp_cfg != mpc.sqp_cfg:
            warm, _, _, _ = mpc._solve_step(
                warm, est_state.x_bar, ref_windows[0], u_start, sigma0,
                con_pars[0] if con_pars.shape[0] else
                jnp.zeros(mpc.num_con_par, mpc.dtype),
                mpc.consts, cfg=mpc.init_sqp_cfg)

        def step(carry, inp):
            x, est, warm, u_prev = carry
            x_sp_w, con_par, w, v = inp
            y = mhe.h(x) + v
            est, (x_hat, mhe_res) = mhe._step(est, y, u_prev)
            warm, u_cmd, _sigmas, info = mpc._solve_step(
                warm, x_hat, x_sp_w, u_prev, sigma0, con_par, mpc.consts)
            u_cmd = jnp.clip(u_cmd, mpc.consts.ulb, mpc.consts.uub)
            if mpc.has_du_bounds:
                u_cmd = jnp.clip(u_cmd, u_prev + mpc.consts.dulb,
                                 u_prev + mpc.consts.duub)
            x_next = mpc.model.integrate(x, u_cmd) + w
            if mpc.model.clip_negative:
                x_next = jnp.maximum(x_next, 0.0)
            out = (x, x_hat, u_cmd, y, info.converged, mhe_res.converged)
            return (x_next, est, warm, u_cmd), out

        (x_last, _, _, _), outs = jax.lax.scan(
            step, (x0, est_state, warm, u_start),
            (ref_windows, con_pars, noise_w, noise_v), length=n_steps)
        xs = jnp.concatenate([outs[0], x_last[None]], axis=0)
        return OutputFeedbackResult(
            x_true=xs, x_hat=outs[1], u=outs[2], y=outs[3],
            mpc_converged=outs[4], mhe_converged=outs[5])

    return run


def simulate_output_feedback(mpc, mhe, x0, x_bar, sim_time, x_sp,
                             key: Optional[jax.Array] = None,
                             noise: bool = True,
                             con_par_func=None,
                             noise_w=None, noise_v=None
                             ) -> OutputFeedbackResult:
    """Simulate the full output-feedback stack as one compiled program.

    Per control period: measure ``y = h(x) + v``, slide the MHE window and
    solve the estimation NLP, solve the MPC NLP from the estimate, apply
    the (saturated) input to the plant with process noise ``w``.  ``x0`` is
    the TRUE initial plant state; ``x_bar`` the estimator's prior on it.

    ``noise_w (M, Nx)`` / ``noise_v (M, Nm)`` override the process /
    measurement noise draws (used by the parity test against the
    host-composed ``mhe.step`` + ``mpc.solve_step`` loop); by default they
    are drawn from ``mpc.model.R`` and the estimator's ``R_meas`` (zeroed
    when ``noise=False``).

    Limitations: the adaptive controller (``MPC(online_capacity=...)``) is
    not supported here — its conditioning consumes the TRUE transition,
    which an output-feedback deployment does not observe.
    """
    if mpc.online_capacity is not None:
        raise ValueError("simulate_output_feedback does not support "
                         "MPC(online_capacity=...) — online conditioning "
                         "needs true-state observations")
    if mpc.dtype != mhe.dtype:
        raise ValueError(f"mpc dtype {mpc.dtype} != mhe dtype {mhe.dtype}")
    if mhe.Nu != mpc.Nu or mhe.Nx != mpc.Nx:
        raise ValueError("mpc and mhe disagree on state/input dimensions")

    n_steps = int(round(sim_time / mpc.dt))
    dtype = mpc.dtype
    x0 = jnp.asarray(x0, dtype)
    x_bar = jnp.asarray(x_bar, dtype)
    ref_windows = mpc._prep_ref_windows(x_sp, n_steps)
    con_pars = mpc._prep_con_pars(con_par_func, n_steps)

    if key is None:
        key = jax.random.PRNGKey(0)
    kw, kv = jax.random.split(key)
    if noise_w is None:
        noise_w = (jax.random.normal(kw, (n_steps, mpc.Nx), dtype)
                   @ mpc._noise_chol().T) if noise else \
            jnp.zeros((n_steps, mpc.Nx), dtype)
    else:
        noise_w = jnp.asarray(noise_w, dtype)
    if noise_v is None:
        chol_v = jnp.linalg.cholesky(
            mhe._r_mat + 1e-32 * jnp.eye(mhe.Nm, dtype=dtype))
        noise_v = (jax.random.normal(kv, (n_steps, mhe.Nm), dtype)
                   @ chol_v.T) if noise else \
            jnp.zeros((n_steps, mhe.Nm), dtype)
    else:
        noise_v = jnp.asarray(noise_v, dtype)

    # estimator starts at the prior with the first measurement (the scan
    # re-feeds y_0 with u_prev = 0 — MHE.run's fill-in semantics)
    est_state = mhe.init_filter(x_bar, mhe.h(x0) + noise_v[0])
    warm = mpc._init_warm(
        mpc._augment_x0(x_bar, jnp.zeros(mpc.Nu, dtype)), ref_windows[0])

    cache = getattr(mpc, "_ofb_cache", None)
    if cache is None or cache[0] is not mhe:
        runner = jax.jit(mpc._precision_scope(_make_runner(mpc, mhe)),
                         static_argnames=("n_steps",))
        mpc._ofb_cache = (mhe, runner)
    runner = mpc._ofb_cache[1]
    res = runner(x0, est_state, warm, ref_windows, con_pars, noise_w,
                 noise_v, n_steps=n_steps)
    res.x_true.block_until_ready()
    return OutputFeedbackResult(*[np.asarray(a) for a in res])
