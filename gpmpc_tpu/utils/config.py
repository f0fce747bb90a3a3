"""Typed, hashable configuration dataclasses.

The reference passes constructor kwargs plus opaque ``solver_opts`` /
``optimizer_opts`` dicts straight through to IPOPT [SURVEY §5 "Config"].
Here every config is a frozen dataclass whose fields are static hashables, so
a config can be closed over by ``jax.jit`` without retracing surprises.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class GPConfig:
    """Hyperparameter-training configuration.

    Mirrors the option surface of the reference trainer
    (``gp_mpc/optimize.py::train_gp`` [SURVEY C4]): mean-function choice,
    multistart count, optimizer budget.  The optimizer is on-device L-BFGS
    (optax) over *log* hyperparameters instead of IPOPT over bounded ones —
    unconstrained log-space is the idiomatic JAX equivalent of IPOPT's
    positivity bounds.
    """

    mean_func: str = "zero"  # zero | const | linear | poly
    # Kernel family (beyond-reference — upstream is SE-ARD only [SURVEY
    # C3a]): 'se' | 'matern52' | 'matern32'.  Matérn supports ME/TA/UT
    # propagation and the full MPC/MHE embedding (mean/variance are
    # autodiff-generic); EM keeps its SE-only PILCO closed forms, and the
    # sparse VFE / online-conditioning paths stay SE-only (guarded at
    # construction).
    kernel: str = "se"
    multistart: int = 2
    max_iters: int = 250            # L-BFGS iteration cap per start
    grad_tol: float = 1e-7          # stop when ||grad||_inf below this
    jitter: float = 1e-8            # Cholesky jitter, scaled by sf2
    min_noise: float = 1e-6         # floor on noise variance (scaled by var(y))
    normalize: bool = True          # z-score inputs/outputs before training
    predict_includes_noise: bool = False  # add sn2 to predictive variance
    # Lognormal calibration priors on the signal variance and the
    # lengthscales: + sf2_prior * log(sf2/var(y))^2 + ell_prior *
    # sum log(ell/std(x))^2 in the NLL (inputs/outputs are normalized, so
    # both centers are 0 in log space).  The SE-ARD marginal likelihood
    # has a near-flat ridge ell, sf2 -> infinity at fixed sf2/ell^2 (the
    # linear-kernel limit) for smooth targets; an optimizer that descends
    # the NLL accurately lands there (measured on v5e f32 at full matmul
    # precision: sf2 ~ 13-47 on unit-variance outputs, ell ~ 1e4-1e6 on
    # unit-std inputs, train SMSE 3e-5).  On that ridge the MEAN
    # interpolates beautifully but the Gram is numerically singular
    # (every point kernel-close to every other), so the predictive
    # VARIANCE — a cancellation of two ~sf2-sized quadratic forms through
    # a regularized near-rank-deficient solve — comes out as garbage of
    # order sf2 even at well-sampled points, per-dim fragile.  Any
    # uncertainty consumer downstream then breaks: chance tightening
    # inflated until the setpoint leaves the feasible box (four-tank
    # closed-loop cost 383k vs 2.3k), EM/TA covariances meaningless.
    # 0.5 (a lognormal with sigma ~ 1) keeps ell/sf2 within a couple of
    # e-folds of the data scale: measured on the four-tank residual task
    # (N=100, D=6, f32), held-out SMSE moves 4.1e-5 -> 5.7e-5 while
    # closed-loop TA+tightening goes from broken (cost 75k, setpoint
    # outside the collapsed box) to healthy (2.2k); weaker weights
    # (0.05-0.2) leave the ridge reachable and the loop fragile, stronger
    # (1.0) starts to pay real conservatism (cost 2.9k).  The reference's
    # IPOPT hyperparameter bounds play the same role [SURVEY C4, tag L].
    # Opt out with optimizer_opts=dict(ell_prior=1e-4, sf2_prior=1e-4).
    sf2_prior: float = 0.5
    ell_prior: float = 0.5


@dataclasses.dataclass(frozen=True)
class SQPConfig:
    """Augmented-Lagrangian SQP solver configuration.

    Replaces the reference's ``casadi.nlpsol('ipopt', ...)`` [SURVEY C6].
    The NLP is solved by Gauss-Newton SQP on the multiple-shooting
    transcription; each QP subproblem's block-banded KKT system is factored
    by a Riccati backward sweep; inequality constraints enter through an
    augmented Lagrangian so every iteration has fixed structure (jit/scan
    friendly, bounded iteration semantics).
    """

    max_iters: int = 30             # inner GN/SQP iterations per AL round
    al_iters: int = 6               # outer multiplier/penalty updates
    penalty_init: float = 10.0
    penalty_mult: float = 10.0
    penalty_max: float = 1e8
    reg_init: float = 1e-6          # Levenberg regularization on Riccati
    reg_mult: float = 10.0
    reg_max: float = 1e8
    tol_stat: float = 1e-8          # inner stop: step norm <= tol_stat*scale
    tol_con: float = 1e-7           # converged: defect & viol <= tol_con*scale
    tol_kkt: float = 1e-5           # converged: relative KKT dual infeas.
    ls_steps: int = 8               # backtracking line-search trials
    ls_beta: float = 0.5
    ls_c1: float = 1e-4
    merit_viol: float = 0.0         # L1 exact-penalty weight on inequality
    #                                 violations in the line-search merit
    #                                 (0 = off: the AL terms alone price
    #                                 violations, at the current-mu scale)
    parallel_kkt: bool = False      # associative-scan Riccati (O(log Nt)
    #                                 depth; worthwhile at long horizons)
    fused_kkt: bool = False         # single-launch Pallas Riccati sweep
    #                                 (fastest at MPC sizes on TPU; runs via
    #                                 the Pallas interpreter off-TPU).  Takes
    #                                 precedence over parallel_kkt.


# Named solver budgets — the measured operating points from the round-5
# benchmark studies (benchmarks/RESULTS.md), accepted anywhere a
# ``solver_opts`` dict is (MPC, MHE, BatchedStudy):
#
# * ``"rti"`` — real-time-iteration class latency: 2 AL rounds x 12 inner
#   steps with the aggressive obstacle-multiplier schedule and the
#   violation-aware line-search merit (2.65 ms/solve on the v5e car
#   benchmark at clearance 1.001).  Fastest point that clears the pinned
#   car benchmark; validate closed-loop quality on YOUR model before
#   deploying (RESULTS "car feasibility by mechanism").
# * ``"robust"`` — 3 AL rounds x 15 inner steps with the DEFAULT gentle
#   penalty schedule: the only budget that cleared every from-scratch
#   model refit in the cross-seed screen (5/5 at min clearance 0.996,
#   4.43 ms on the car; RESULTS "car operating point across FRESH model
#   fits").  Use this when the model is retrained/unvalidated.
# * ``"converged"`` — the surface's own full-convergence defaults
#   (al6 x mi30 for MPC).
SOLVER_PRESETS = {
    "rti": dict(al_iters=2, max_iters=12, penalty_init=100.0,
                penalty_mult=30.0, merit_viol=10.0, fused_kkt=True),
    "robust": dict(al_iters=3, max_iters=15, fused_kkt=True),
    "converged": {},
}


def resolve_solver_opts(solver_opts, dtype=None) -> dict:
    """Resolve ``solver_opts`` (None | dict | preset name) to a kwargs
    dict for :class:`SQPConfig`.  Unknown preset names fail loudly.

    A preset means "the best measured config for my setup", so with
    ``dtype`` float64 a preset drops ``fused_kkt`` (the fused sweep runs
    f32; the x64 parity path keeps its deterministic sequential Riccati).
    An EXPLICIT ``fused_kkt=True`` in a user dict still errors loudly on
    f64 downstream — only the named presets adapt."""
    if solver_opts is None:
        return {}
    if isinstance(solver_opts, str):
        if solver_opts not in SOLVER_PRESETS:
            raise ValueError(
                f"unknown solver preset {solver_opts!r}; available: "
                f"{sorted(SOLVER_PRESETS)}")
        opts = dict(SOLVER_PRESETS[solver_opts])
        import numpy as _np
        if dtype is not None and _np.dtype(dtype) == _np.float64:
            opts.pop("fused_kkt", None)
        return opts
    return dict(solver_opts)


@dataclasses.dataclass(frozen=True)
class MPCOptions:
    """Static MPC options (the non-array part of ``MPC.__init__``).

    Mirrors the reference option set
    (``gp_mpc/mpc_class.py::MPC.__init__`` [SURVEY C6]).
    """

    gp_method: str = "TA"           # ME | TA | EM
    discrete_method: str = "gp"     # gp | rk4 | exact | hybrid
    cost_func: str = "quad"         # quad | sat
    feedback: bool = True
    percentile: Optional[float] = 0.95
    terminal_constraint: Optional[float] = None
    cov_updates: int = 2            # zero-order covariance refresh passes/solve
    num_con_par: int = 0            # runtime params for user constraints
    solver: SQPConfig = SQPConfig()
    solve_precision: Optional[str] = None  # matmul precision scope for the
    #                                 solve program (None = package default;
    #                                 'default'|'high'|'highest')
