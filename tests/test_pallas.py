"""Pallas kernel parity vs the jnp reference semantics (interpret mode on
CPU; the same code compiles for TPU — SURVEY §4 'device parity')."""

import numpy as np
import pytest
import jax.numpy as jnp

from gpmpc_tpu.ops.kernels import se_ard_gram, se_ard_cross
from gpmpc_tpu.ops.pallas_kernels import (
    se_ard_gram_pallas, cholesky_pallas, gp_predict_batch_pallas)

RNG = np.random.default_rng(3)


@pytest.mark.slow
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


def test_fused_integrator_matches_scan():
    """Model(fused_integrator=True) reproduces the lax.scan substep chain
    exactly (same math, one kernel launch), incl. under vmap (data gen)."""
    import jax
    from gpmpc_tpu.models.dynamics import Model
    from gpmpc_tpu.systems import four_tank_ode

    kw = dict(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=0.5,
              dtype=jnp.float32, integrator_substeps=10)
    m0 = Model(**kw)
    m1 = Model(**kw, fused_integrator=True)
    x = jnp.asarray([8.0, 10.0, 1.0, 1.5], jnp.float32)
    u = jnp.asarray([3.0, 3.0], jnp.float32)
    np.testing.assert_allclose(np.asarray(m1.integrate(x, u)),
                               np.asarray(m0.integrate(x, u)),
                               rtol=1e-6, atol=1e-7)
    xs = jnp.abs(jnp.asarray(RNG.standard_normal((8, 4)), jnp.float32)) + 1.0
    us = jnp.abs(jnp.asarray(RNG.standard_normal((8, 2)), jnp.float32))
    np.testing.assert_allclose(np.asarray(jax.vmap(m1.integrate)(xs, us)),
                               np.asarray(jax.vmap(m0.integrate)(xs, us)),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_fused_riccati_matches_sequential_sweep():
    """The single-launch Pallas Riccati sweep reproduces riccati.solve on
    random stage QPs (incl. cross terms, defects, nonzero dx0) and reports
    NaN-driven failure for an indefinite H_uu like the reference sweep."""
    import jax
    from gpmpc_tpu.solvers import riccati

    for nt, nx, nu, seed in [(20, 4, 2, 0), (13, 5, 3, 1), (8, 2, 1, 2)]:
        rng = np.random.default_rng(seed)
        dtype = jnp.float32
        a = (0.9 * np.eye(nx)[None]
             + 0.05 * rng.standard_normal((nt, nx, nx)))
        b = 0.3 * rng.standard_normal((nt, nx, nu))
        c = 0.02 * rng.standard_normal((nt, nx))
        m = rng.standard_normal((nt, nx, nx))
        q_xx = 0.5 * (m @ np.swapaxes(m, 1, 2)) + 2.0 * np.eye(nx)[None]
        q_uu = np.tile(0.5 * np.eye(nu)[None], (nt, 1, 1))
        q_xu = 0.1 * rng.standard_normal((nt, nx, nu))
        qp = riccati.StageQP(
            a=jnp.asarray(a, dtype), b=jnp.asarray(b, dtype),
            c=jnp.asarray(c, dtype),
            q_xx=jnp.asarray(q_xx, dtype), q_uu=jnp.asarray(q_uu, dtype),
            q_xu=jnp.asarray(q_xu, dtype),
            q_x=jnp.asarray(0.1 * rng.standard_normal((nt, nx)), dtype),
            q_u=jnp.asarray(0.1 * rng.standard_normal((nt, nu)), dtype),
            qf_xx=jnp.asarray(5.0 * np.eye(nx), dtype),
            qf_x=jnp.asarray(0.1 * rng.standard_normal(nx), dtype))
        dx0 = jnp.asarray(0.3 * rng.standard_normal(nx), dtype)
        ref = riccati.solve(qp, dx0, 1e-6)
        got = riccati.solve_fused(qp, dx0, 1e-6)
        scale = float(jnp.max(jnp.abs(ref.dx))) + 1.0
        np.testing.assert_allclose(np.asarray(got.dx), np.asarray(ref.dx),
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(got.du), np.asarray(ref.du),
                                   atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(got.gain_k),
                                   np.asarray(ref.gain_k), atol=2e-5)
        np.testing.assert_allclose(float(got.exp_dec), float(ref.exp_dec),
                                   rtol=1e-4, atol=1e-6)
        assert bool(got.ok)

    # indefinite H_uu (negative q_uu, no reg) -> NaN -> ok=False
    bad = qp._replace(q_uu=-jnp.asarray(q_uu, dtype))
    got = riccati.solve_fused(bad, dx0, 0.0)
    assert not bool(got.ok)


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
