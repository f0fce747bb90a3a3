"""gpmpc_tpu — a TPU-native learning-based control framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``helgeanl/GP-MPC`` (see SURVEY.md): Gaussian-process dynamics models (SE-ARD
kernel, Cholesky-factorized log-marginal-likelihood hyperparameter training,
predictive mean/variance), uncertainty propagation over an MPC horizon
(mean-equivalent / first-order Taylor / exact moment matching), and a
receding-horizon MPC with expected costs, chance-constraint tightening, linear
state feedback, and pluggable inequality constraints — all fused into
jit-compiled on-device programs (no CasADi/IPOPT; a from-scratch augmented-
Lagrangian SQP with a Riccati sweep over the block-banded KKT system replaces
the interior-point solver).

Public surface (mirrors the reference package exports,
``gp_mpc/__init__.py`` re-exporting ``Model``, ``GP``, ``MPC`` [SURVEY C1]):

    from gpmpc_tpu import Model, GP, MPC
"""

import os as _os

import jax as _jax

# Control-grade matmul precision.  XLA's DEFAULT f32 matmul on TPU is a
# single bf16-multiply pass (~4e-3 relative noise).  Two measured failure
# modes in this framework: (1) the kernel Gram via the
# ||x||^2+||z||^2-2x.z expansion is cancellation-amplified, which corrupted
# f32 GP training end-to-end on v5e (held-out SMSE 5e-5 on CPU f32 vs 19
# on TPU, same seeds/config); (2) iterate-to-tolerance fixed points
# (Riccati) oscillate above their convergence floor.  Everything here is
# small-matrix and dispatch-overhead-bound, so full-fidelity f32 (3-pass
# on the MXU) costs ~nothing — set it once for every op in the package.
# Opt out (or into bf16 studies) with GPMPC_TPU_MATMUL_PRECISION.
_jax.config.update("jax_default_matmul_precision",
                   _os.environ.get("GPMPC_TPU_MATMUL_PRECISION", "highest"))

from gpmpc_tpu.models.dynamics import Model
from gpmpc_tpu.models.gp import GP
from gpmpc_tpu.mpc.controller import MPC
from gpmpc_tpu.mpc.mhe import MHE
from gpmpc_tpu.mpc.output_feedback import (OutputFeedbackResult,
                                           simulate_output_feedback)

__version__ = "0.4.0"

__all__ = ["Model", "GP", "MPC", "MHE", "simulate_output_feedback",
           "OutputFeedbackResult", "__version__"]
