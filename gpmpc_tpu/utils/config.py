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
    multistart: int = 2
    max_iters: int = 250            # L-BFGS iteration cap per start
    grad_tol: float = 1e-7          # stop when ||grad||_inf below this
    jitter: float = 1e-8            # Cholesky jitter, scaled by sf2
    min_noise: float = 1e-6         # floor on noise variance (scaled by var(y))
    normalize: bool = True          # z-score inputs/outputs before training
    predict_includes_noise: bool = False  # add sn2 to predictive variance


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
    parallel_kkt: bool = False      # associative-scan Riccati (O(log Nt)
    #                                 depth; worthwhile at long horizons)
    fused_kkt: bool = False         # single-launch Pallas Riccati sweep
    #                                 (fastest at MPC sizes on TPU; runs via
    #                                 the Pallas interpreter off-TPU).  Takes
    #                                 precedence over parallel_kkt.


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
