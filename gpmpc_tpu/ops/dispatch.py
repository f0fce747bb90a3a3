"""Size/platform dispatch between XLA and Pallas backends for the GP ops.

The GP compute path calls :func:`se_ard_gram_auto` / :func:`cholesky_auto`
instead of a fixed backend; the policy below decides per call site from the
static problem size and the active platform.  The reference has no analog —
its BLAS/LAPACK choice is whatever numpy linked [SURVEY §2.2]; here the
choice is explicit and measurement-driven.

Measured crossover (v5e, f32, fori-loop-amortized K-slope with forced D2H
sync — see benchmarks/RESULTS.md "Pallas vs XLA crossover"):

    SE-ARD Gram (D=6)         N=512   1024   2048   4096
      XLA (fused matmul+exp)  8 us    17 us  41 us  109 us   (1.3-2x HBM roofline)
      Pallas (tiled)          13 us   35 us  108 us 364 us

    Cholesky                  N=512   1024   2048   4096
      XLA (native TPU)        13 us   193 us 538 us 2.1 ms
      Pallas (blocked VMEM)   514 us  1.5 ms 4.3 ms VMEM-OOM

Conclusion: on this hardware generation XLA is at or near the memory floor
for the Gram at EVERY size (the op is output-write-bound and XLA fuses the
exp epilogue into the matmul), and its native Cholesky wins at all sizes,
so the default policy keeps XLA everywhere — there is no crossover to
exploit on a v5e.  The Pallas kernels remain verified alternates
(tests/test_pallas.py): the dispatch exists so other hardware (or a future
fused-consumer kernel that skips the HBM round trip entirely) is a one-line
policy change, not a refactor.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gpmpc_tpu.ops import kernels as _k
from gpmpc_tpu.ops import chol as _c


@dataclasses.dataclass(frozen=True)
class PallasPolicy:
    """Minimum N at which each op dispatches to its Pallas kernel on TPU;
    ``None`` disables the Pallas route for that op."""

    gram_min_n: Optional[int] = None   # measured: XLA at the floor; never
    chol_min_n: Optional[int] = None   # measured: XLA wins all sizes; never
    predict_min_b: Optional[int] = None  # batched k*/mean kernel; default XLA


#: Active policy (module-global; swap with ``set_policy`` for other
#: hardware or experiments).
_POLICY = PallasPolicy()


def set_policy(policy: PallasPolicy) -> None:
    global _POLICY
    _POLICY = policy


def get_policy() -> PallasPolicy:
    return _POLICY


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def se_ard_gram_auto(x: jnp.ndarray, ell: jnp.ndarray, sf2,
                     sn2=0.0, jitter: float = 0.0) -> jnp.ndarray:
    """SE-ARD Gram with backend dispatch (semantics of
    :func:`gpmpc_tpu.ops.kernels.se_ard_gram`)."""
    n = x.shape[0]
    p = _POLICY
    if p.gram_min_n is not None and n >= p.gram_min_n and _on_tpu():
        from gpmpc_tpu.ops.pallas_kernels import se_ard_gram_pallas
        return se_ard_gram_pallas(x, ell, sf2, sn2, jitter)
    return _k.se_ard_gram(x, ell, sf2, sn2, jitter)


def cholesky_auto(a: jnp.ndarray) -> jnp.ndarray:
    """SPD Cholesky with backend dispatch (semantics of
    :func:`gpmpc_tpu.ops.chol.cholesky_psd`)."""
    n = a.shape[-1]
    p = _POLICY
    if p.chol_min_n is not None and n >= p.chol_min_n and _on_tpu():
        from gpmpc_tpu.ops.pallas_kernels import cholesky_pallas
        return cholesky_pallas(a)
    return _c.cholesky_psd(a)


def kernel_gram_auto(name: str, x: jnp.ndarray, ell: jnp.ndarray, sf2,
                     sn2=0.0, jitter: float = 0.0) -> jnp.ndarray:
    """Gram for the named kernel family with backend dispatch: the SE
    family keeps the measured Pallas policy; Matérn runs the XLA form
    (same fused matmul + elementwise-epilogue shape — no Pallas variant
    exists or is warranted per the header table's no-crossover finding)."""
    if name == "se":
        return se_ard_gram_auto(x, ell, sf2, sn2, jitter)
    return _k.kernel_gram(name, x, ell, sf2, sn2, jitter)


def gp_predict_batch_auto(z: jnp.ndarray, x: jnp.ndarray, ell: jnp.ndarray,
                          sf2, alpha: jnp.ndarray):
    """Batched single-dim GP cross-kernel + mean with backend dispatch:
    z (B, D), x (N, D) -> (mu (B,), ks (B, N)).

    XLA route: ``ks = se_ard_cross(z, x, ell, sf2); mu = ks @ alpha`` —
    a fused matmul+exp epilogue, at the HBM floor like the Gram (header
    table).  Pallas route (``predict_min_b``):
    :func:`gpmpc_tpu.ops.pallas_kernels.gp_predict_batch_pallas`, one launch
    for the O(B N D) work; kept as a verified alternate for hardware where
    a fused-consumer kernel can skip the ks HBM round trip.
    """
    b = z.shape[0]
    p = _POLICY
    if p.predict_min_b is not None and b >= p.predict_min_b and _on_tpu():
        from gpmpc_tpu.ops.pallas_kernels import gp_predict_batch_pallas
        return gp_predict_batch_pallas(z, x, ell, sf2, alpha)
    ks = _k.se_ard_cross(z, x, ell, sf2)
    return ks @ alpha, ks
