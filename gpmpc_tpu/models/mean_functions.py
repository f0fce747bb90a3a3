"""GP prior mean functions.

Parity target: the reference's mean-function options (zero / constant /
linear / polynomial), ``gp_mpc/gp_functions.py::get_mean_function``
[SURVEY C3e, confidence M on the exact set].

Every mean function is expressed as a *linear* map over a fixed feature
vector, m(x; w) = w . phi(x), so the mean parameters are trained jointly with
the kernel hyperparameters by the same L-BFGS pass and the whole thing stays
a dense batched matmul under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

_KINDS = ("zero", "const", "linear", "poly")


def num_mean_params(kind: str, d: int) -> int:
    """Number of mean parameters per output dimension."""
    if kind == "zero":
        return 0
    if kind == "const":
        return 1
    if kind == "linear":
        return d + 1
    if kind == "poly":
        return 2 * d + 1
    raise ValueError(f"unknown mean function {kind!r}; expected one of {_KINDS}")


def mean_features(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Feature vector phi(x) for a batch of inputs; (..., D) -> (..., F)."""
    if kind == "zero":
        return jnp.zeros(x.shape[:-1] + (0,), dtype=x.dtype)
    ones = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
    if kind == "const":
        return ones
    if kind == "linear":
        return jnp.concatenate([x, ones], axis=-1)
    if kind == "poly":
        return jnp.concatenate([x * x, x, ones], axis=-1)
    raise ValueError(f"unknown mean function {kind!r}; expected one of {_KINDS}")


def mean_value(x: jnp.ndarray, w: jnp.ndarray, kind: str) -> jnp.ndarray:
    """m(x; w) = w . phi(x); x: (..., D), w: (F,) -> (...)."""
    if kind == "zero":
        return jnp.zeros(x.shape[:-1], dtype=x.dtype)
    return mean_features(x, kind) @ w
