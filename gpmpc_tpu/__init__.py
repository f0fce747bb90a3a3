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

from gpmpc_tpu.models.dynamics import Model
from gpmpc_tpu.models.gp import GP
from gpmpc_tpu.mpc.controller import MPC

__version__ = "0.1.0"

__all__ = ["Model", "GP", "MPC", "__version__"]
