from gpmpc_tpu.ops.kernels import (
    KERNELS,
    kernel_cross,
    kernel_gram,
    se_ard,
    se_ard_cross,
    se_ard_gram,
    sq_maha,
)
from gpmpc_tpu.ops.chol import cholesky_psd, chol_solve, tri_solve, cholupdate
from gpmpc_tpu.ops.dispatch import (
    PallasPolicy,
    cholesky_auto,
    kernel_gram_auto,
    se_ard_gram_auto,
    set_policy,
)

__all__ = [
    "KERNELS",
    "kernel_cross",
    "kernel_gram",
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
    "kernel_gram_auto",
    "se_ard_gram_auto",
    "set_policy",
]
