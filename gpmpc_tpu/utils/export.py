"""AOT deployment artifacts for the controller (serving path).

The reference has no deployment story — every control step re-enters
Python and re-evaluates CasADi callbacks [SURVEY §3.4].  Here the entire
MPC solve step is one jitted XLA program, so it can be **exported once as
a serialized StableHLO artifact** (via ``jax.export``) and executed later
— in a different process, without the controller object, its Python
construction code, or retracing — which is the TPU-native serving shape:
build offline, ship bytes, run on the fleet.

The artifact is self-contained: the exported callable closes over nothing;
all tensors (warm-start state, setpoint, GP posterior, weights) ride the
argument list, exactly like the live ``MPC._solve_step`` (captured
constants are a measured pathology on this backend — see
``mpc/controller.py``).

Usage::

    art = export_solve_step(mpc)            # bytes
    step = load_solve_step(art)             # callable
    u0, warm, obj = step(warm, x0, x_sp, u_prev, sigma0, con_par, consts)
    # feed `warm` back into the next call (RTI warm start); the predicted
    # state trajectory is warm.x

``warm``/``consts`` pytrees for the first call come from the live MPC
(``mpc._init_warm(...)``, ``mpc.consts``) or from any persisted copies of
those arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..mpc.controller import MPCConsts, StepInfo
from ..models.gp_core import GPHypers, GPPosterior
from ..models.propagate import Normalization
from ..solvers.al_sqp import SolverState, SolveResult


def _register_pytrees():
    """jax.export serializes pytree *structure* alongside the program; our
    NamedTuple containers must be registered once with stable names."""
    for cls in (MPCConsts, StepInfo, GPHypers, GPPosterior, Normalization,
                SolverState, SolveResult):
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=f"gpmpc_tpu.{cls.__name__}")
        except ValueError:
            pass  # already registered (idempotent across reimports)


_register_pytrees()


def _example_args(mpc, x0=None, x_sp=None):
    dtype = mpc.dtype
    x0 = jnp.zeros(mpc.Nx, dtype) if x0 is None else jnp.asarray(x0, dtype)
    x_sp = mpc._ref_window(jnp.zeros(mpc.Nx, dtype) if x_sp is None
                           else jnp.asarray(x_sp, dtype))
    u_prev = jnp.zeros(mpc.Nu, dtype)
    sigma0 = jnp.zeros((mpc.Nx, mpc.Nx), dtype)
    con_par = jnp.zeros(mpc.num_con_par, dtype)
    warm = mpc._init_warm(mpc._augment_x0(x0, u_prev), x_sp)
    return warm, x0, x_sp, u_prev, sigma0, con_par, mpc.consts


def export_solve_step(mpc, path: str | None = None,
                      platforms: tuple[str, ...] | None = None) -> bytes:
    """Serialize one full MPC solve step (AL-SQP + covariance refresh) as a
    portable StableHLO artifact.  Returns the bytes; writes them to ``path``
    if given.  The exported signature is
    ``(warm, x0, x_sp, u_prev, sigma0, con_par, consts) ->
    (u0, warm_next, obj)`` with the same pytree structures as the live MPC.
    ``warm_next`` is the updated solver state (shifted trajectory + AL
    multipliers): a deployed receding loop MUST feed it back as the next
    call's ``warm`` — the RTI budgets the controller is tuned for
    (single-Newton tracking, warm-carried multipliers) assume it.  The
    predicted state trajectory is ``warm_next.x``.

    ``platforms`` enables cross-platform lowering — e.g.
    ``platforms=("cpu", "tpu")`` builds the controller offline on a CPU host
    and serves the same artifact on the TPU fleet (the reference cannot do
    this at all: its controller is a live CasADi/IPOPT object [SURVEY §3.4]).
    """

    def step(warm, x0, x_sp, u_prev, sigma0, con_par, consts):
        state, u0, _sigmas, info = mpc._solve_step(
            warm, x0, x_sp, u_prev, sigma0, con_par, consts)
        u0 = jnp.clip(u0, consts.ulb, consts.uub)
        return u0, state, info.obj

    exported = jax_export.export(
        jax.jit(step), platforms=platforms)(*_example_args(mpc))
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob


def load_solve_step(blob_or_path):
    """Rehydrate an exported solve step into a callable.  Accepts the bytes
    returned by :func:`export_solve_step`, or a filesystem path (str or
    os.PathLike)."""
    import os
    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as fh:
            blob = fh.read()
    else:
        blob = blob_or_path
    exported = jax_export.deserialize(blob)
    return exported.call
