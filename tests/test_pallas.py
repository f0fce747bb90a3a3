"""Pallas kernel parity vs the jnp reference semantics (interpret mode on
CPU; the same code compiles for TPU — SURVEY §4 'device parity')."""

import numpy as np
import jax.numpy as jnp

from gpmpc_tpu.ops.kernels import se_ard_gram, se_ard_cross
from gpmpc_tpu.ops.pallas_kernels import (
    se_ard_gram_pallas, cholesky_pallas, gp_predict_batch_pallas)

RNG = np.random.default_rng(3)


def test_gram_pallas_matches_reference():
    for n, d in [(40, 6), (100, 6), (200, 12), (130, 3)]:
        x = RNG.uniform(-2, 2, size=(n, d))
        ell = np.exp(RNG.standard_normal(d) * 0.3)
        sf2, sn2 = 1.7, 0.03
        ref = np.asarray(se_ard_gram(jnp.asarray(x, jnp.float32),
                                     jnp.asarray(ell, jnp.float32),
                                     jnp.float32(sf2), jnp.float32(sn2),
                                     jitter=1e-6))
        got = np.asarray(se_ard_gram_pallas(
            jnp.asarray(x, jnp.float32), jnp.asarray(ell, jnp.float32),
            sf2, sn2, jitter=1e-6, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_cholesky_pallas_matches_reference():
    for n in [16, 100, 128, 200]:
        a = RNG.standard_normal((n, n))
        spd = (a @ a.T + n * np.eye(n)).astype(np.float32)
        ref = np.linalg.cholesky(spd.astype(np.float64))
        got = np.asarray(cholesky_pallas(jnp.asarray(spd), interpret=True))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-4 * scale)


def test_predict_batch_pallas_matches_reference():
    n, d, b = 90, 6, 33
    x = RNG.uniform(-2, 2, size=(n, d)).astype(np.float32)
    z = RNG.uniform(-2, 2, size=(b, d)).astype(np.float32)
    ell = np.exp(RNG.standard_normal(d) * 0.2).astype(np.float32)
    sf2 = np.float32(1.3)
    alpha = RNG.standard_normal(n).astype(np.float32)

    ks_ref = np.asarray(se_ard_cross(jnp.asarray(z), jnp.asarray(x),
                                     jnp.asarray(ell), sf2))
    mu_ref = ks_ref @ alpha
    mu, ks = gp_predict_batch_pallas(jnp.asarray(z), jnp.asarray(x),
                                     jnp.asarray(ell), sf2,
                                     jnp.asarray(alpha), interpret=True)
    np.testing.assert_allclose(np.asarray(ks), ks_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=2e-4, atol=2e-4)
