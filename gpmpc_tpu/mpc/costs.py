"""Expected stage costs under state uncertainty.

Parity targets [SURVEY C6 'costs']:

* expected quadratic: (x - x_sp)' Q (x - x_sp) + tr(Q Sigma) + u' R u
  (+ delta-u penalty S, + terminal P + tr(P Sigma_N))
* saturating (PILCO-style) cost in expectation, ``costFunc='sat'``:
  E[1 - exp(-0.5 ||x - x_sp||^2_W)] under x ~ N(mu, Sigma) has the closed
  form 1 - |I + Sigma W|^{-1/2} exp(-0.5 e' W (I + Sigma W)^{-1} e).
"""

from __future__ import annotations

import jax.numpy as jnp


def expected_quadratic(mu: jnp.ndarray, sigma: jnp.ndarray,
                       x_sp: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    e = mu - x_sp
    return e @ q @ e + jnp.sum(q * sigma)


def expected_saturating(mu: jnp.ndarray, sigma: jnp.ndarray,
                        x_sp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    d = mu.shape[0]
    e = mu - x_sp
    m = jnp.eye(d, dtype=mu.dtype) + sigma @ w
    # e' W (I + Sigma W)^{-1} e  and  |I + Sigma W|^{-1/2}
    sol = jnp.linalg.solve(m, e)
    quad = e @ w @ sol
    sign, logdet = jnp.linalg.slogdet(m)
    return 1.0 - jnp.exp(-0.5 * quad - 0.5 * logdet)
