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

    Single-query fast path (f32 only): when either side is one point (the
    embedded predict/propagate path — one kernel row per NLP stage), the
    O(M*D) broadcast subtraction is used instead.  It is EXACT in f32
    (squares of differences — no cancellation, so no pin needed), it is
    fewer ops than the norm expansion (the solve program is launch-bound
    at MPC sizes, and the HIGHEST pin expands the matmul into multiple
    bf16 passes), and at M~100, D~6 the materialized diff is trivially
    small.  The f64 parity path keeps the expansion unconditionally: its
    accuracy is identical there, and the x64 golden trajectories pin the
    historical op order (the car obstacle loop amplifies last-ulp
    differences chaotically — measured 0.33 state divergence from this
    reordering alone).  Large Grams (training) always use the MXU
    expansion.
    """
    if ((x.shape[0] == 1 or z.shape[0] == 1)
            and x.dtype != jnp.float64):
        d = x[:, None, :] - z[None, :, :]                # (N, M, D)
        return jnp.sum(d * d, axis=-1)
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


def _matern_cross(x: jnp.ndarray, z: jnp.ndarray, ell: jnp.ndarray,
                  sf2: jnp.ndarray, nu: float) -> jnp.ndarray:
    """Matérn-ARD cross-covariance, nu in {1.5, 2.5} (half-integer closed
    forms).  Beyond-reference: the upstream supports SE-ARD only [SURVEY
    C3a]; Matérn's finite smoothness (C^1 / C^2 sample paths) is the usual
    better prior for mechanical/process dynamics with sharp valve or
    contact transitions.

    Same MXU-friendly structure as the SE path: one pinned ``sq_maha``
    matmul, then an elementwise polynomial*exp epilogue XLA fuses.  The
    distance sqrt carries a tiny floor (1e-36) so the kernel is
    differentiable at r=0 (TA propagation takes ``jacfwd`` through this):
    the closed forms' odd-power r terms have bounded derivative, but a
    bare sqrt(0) produces NaN tangents.
    """
    r2 = sq_maha(x / ell, z / ell)
    r = jnp.sqrt(r2 + 1e-36)
    if nu == 1.5:
        c = 1.7320508075688772  # sqrt(3)
        poly = 1.0 + c * r
    elif nu == 2.5:
        c = 2.23606797749979    # sqrt(5)
        poly = 1.0 + c * r + (5.0 / 3.0) * r2
    else:  # pragma: no cover - guarded by kernel_cross
        raise ValueError(f"unsupported Matérn nu={nu}")
    return sf2 * poly * jnp.exp(-c * r)


#: supported kernel families (GPConfig.kernel)
KERNELS = ("se", "matern52", "matern32")


def kernel_cross(name: str, x: jnp.ndarray, z: jnp.ndarray,
                 ell: jnp.ndarray, sf2: jnp.ndarray) -> jnp.ndarray:
    """Cross-covariance for the named kernel family: (N, D), (M, D) -> (N, M)."""
    if name == "se":
        return se_ard_cross(x, z, ell, sf2)
    if name == "matern52":
        return _matern_cross(x, z, ell, sf2, 2.5)
    if name == "matern32":
        return _matern_cross(x, z, ell, sf2, 1.5)
    raise ValueError(f"unknown kernel {name!r}; supported: {KERNELS}")


def kernel_gram(name: str, x: jnp.ndarray, ell: jnp.ndarray,
                sf2: jnp.ndarray, sn2: jnp.ndarray | float = 0.0,
                jitter: float = 0.0) -> jnp.ndarray:
    """Gram for the named kernel family, diagonal written exactly
    (every stationary kernel here has k(x,x) = sf2)."""
    if name == "se":
        return se_ard_gram(x, ell, sf2, sn2, jitter)
    k = kernel_cross(name, x, x, ell, sf2)
    eye = jnp.eye(x.shape[0], dtype=k.dtype)
    return k * (1.0 - eye) + (sf2 + sn2 + jitter * sf2) * eye
