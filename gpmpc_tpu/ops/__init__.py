from gpmpc_tpu.ops.kernels import (
    se_ard,
    se_ard_cross,
    se_ard_gram,
    sq_maha,
)
from gpmpc_tpu.ops.chol import cholesky_psd, chol_solve, tri_solve, cholupdate
from gpmpc_tpu.ops.dispatch import (
    PallasPolicy,
    cholesky_auto,
    se_ard_gram_auto,
    set_policy,
)

__all__ = [
    "se_ard",
    "se_ard_cross",
    "se_ard_gram",
    "sq_maha",
    "cholesky_psd",
    "chol_solve",
    "tri_solve",
    "cholupdate",
    "PallasPolicy",
    "cholesky_auto",
    "se_ard_gram_auto",
    "set_policy",
]
