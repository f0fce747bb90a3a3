"""SE-ARD covariance kernels — the GP compute core.

TPU-native equivalent of the reference's symbolic kernel
(``gp_mpc/gp_functions.py::covSEard`` [SURVEY C3a]):

    k(x, z) = sf2 * exp(-0.5 * sum_i (x_i - z_i)^2 / ell_i^2)

The reference builds these as CasADi SX expressions evaluated point-by-point
inside IPOPT callbacks; here they are batched array programs: the Gram matrix
is one fused scaled-matmul + elementwise-exp, which XLA maps onto the MXU/VPU
directly.  A Pallas tiled variant lives in ``gpmpc_tpu.ops.pallas_kernels``
and is dispatched for large N on TPU backends; these jnp forms are the
reference semantics and the small-N / CPU path.

Shapes use: N, M = numbers of points, D = input dim, Ny = output dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sq_maha(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances, (N, D) x (M, D) -> (N, M).

    Computed via the expansion ||x||^2 + ||z||^2 - 2 x.z so the inner term is
    a single matmul (MXU) instead of an O(N*M*D) broadcast subtraction
    (HBM-bound).  Clamped at zero against cancellation.

    The cross matmul is PINNED to full f32 fidelity regardless of the
    global matmul-precision setting: the expansion is cancellation-
    amplified (the result is a small difference of large norms), and a
    single-pass bf16 matmul here corrupts the Gram enough to break GP
    training end-to-end on TPU (held-out SMSE 5e-5 -> 19, measured on
    v5e — see RESULTS.md round 3b).  Pinning locally keeps the kernel
    math safe even when the package runs the fast global default.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # (N, 1)
    z2 = jnp.sum(z * z, axis=-1, keepdims=True).T        # (1, M)
    cross = jnp.matmul(x, z.T,
                       precision=jax.lax.Precision.HIGHEST)  # (N, M) MXU
    return jnp.maximum(x2 + z2 - 2.0 * cross, 0.0)


def se_ard(x: jnp.ndarray, z: jnp.ndarray, ell: jnp.ndarray,
           sf2: jnp.ndarray) -> jnp.ndarray:
    """Single-pair SE-ARD kernel value k(x, z); x, z: (D,).

    Parity target: ``gp_mpc/gp_functions.py::covSEard`` [SURVEY C3a].
    """
    d = (x - z) / ell
    return sf2 * jnp.exp(-0.5 * jnp.sum(d * d))


def se_ard_cross(x: jnp.ndarray, z: jnp.ndarray, ell: jnp.ndarray,
                 sf2: jnp.ndarray) -> jnp.ndarray:
    """Cross-covariance matrix K(x, z): (N, D), (M, D) -> (N, M)."""
    xs = x / ell
    zs = z / ell
    return sf2 * jnp.exp(-0.5 * sq_maha(xs, zs))


def se_ard_gram(x: jnp.ndarray, ell: jnp.ndarray, sf2: jnp.ndarray,
                sn2: jnp.ndarray | float = 0.0,
                jitter: float = 0.0) -> jnp.ndarray:
    """Gram matrix K(X, X) + (sn2 + jitter * sf2) * I; (N, D) -> (N, N).

    The diagonal is written exactly (sf2 + sn2) rather than through exp(0) so
    the factorization path sees a clean SPD matrix.
    """
    n = x.shape[0]
    k = se_ard_cross(x, x, ell, sf2)
    eye = jnp.eye(n, dtype=k.dtype)
    return k * (1.0 - eye) + (sf2 + sn2 + jitter * sf2) * eye
