"""ME/TA/EM uncertainty propagation vs. the NumPy oracle and Monte Carlo.

EM is additionally cross-checked by sampling (the hard part — SURVEY §7
'Hard parts' #2: verify the cross-covariance algebra before fusing)."""

import numpy as np
import jax.numpy as jnp

from gpmpc_tpu.models import gp_core
from gpmpc_tpu.models.propagate import (
    Normalization, propagate_me, propagate_ta, propagate_em)
from gpmpc_tpu.utils.config import GPConfig

import oracle

RNG = np.random.default_rng(42)


def _setup(n=25, d=3, ny=2, normalize=False):
    x = RNG.uniform(-2, 2, size=(n, d))
    y = np.stack([np.sin(x @ np.array([1.0, 0.5, -0.3])),
                  np.cos(x @ np.array([-0.4, 1.1, 0.2]))], axis=1)[:, :ny]
    ells = np.exp(RNG.standard_normal((ny, d)) * 0.2 + 0.3)
    sf2s = np.array([1.2, 0.8])[:ny]
    sn2s = np.array([0.02, 0.05])[:ny]
    cfg = GPConfig(min_noise=0.0, jitter=0.0)
    hyp = gp_core.GPHypers(jnp.log(jnp.array(ells)), jnp.log(jnp.array(sf2s)),
                           jnp.log(jnp.array(sn2s)), jnp.zeros((ny, 0)))
    post = gp_core.posterior(jnp.array(x), jnp.array(y), hyp, cfg)
    norm = Normalization.identity(d, ny, jnp.array(x).dtype)
    m = RNG.uniform(-1, 1, size=d)
    a = RNG.standard_normal((d, d)) * 0.15
    s = a @ a.T + 0.01 * np.eye(d)
    return x, y, ells, sf2s, sn2s, cfg, post, norm, m, s


def test_me_matches_deterministic_predict():
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup()
    mu, sig, c = propagate_me(post, norm, cfg, jnp.array(m), jnp.array(s))
    want_mu, want_var = oracle.predict_multi(x, y, ells, sf2s, sn2s, m)
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig), np.diag(want_var), atol=1e-9)
    assert np.all(np.asarray(c) == 0.0)


def test_ta_matches_oracle():
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup()
    mu, sig, c = propagate_ta(post, norm, cfg, jnp.array(m), jnp.array(s))
    want_mu, want_sig, jac = oracle.taylor_propagation(
        x, y, ells, sf2s, sn2s, m, s)
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sig), want_sig, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), s @ jac.T, atol=1e-6)


def test_em_matches_oracle():
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup()
    mu, sig, c = propagate_em(post, norm, cfg, jnp.array(m), jnp.array(s))
    want_mu, want_sig, want_c = oracle.exact_moment_matching(
        x, y, ells, sf2s, sn2s, m, s)
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig), want_sig, atol=1e-8)
    np.testing.assert_allclose(np.asarray(c), want_c, atol=1e-9)


def test_em_against_monte_carlo():
    """EM is *exact* for SE kernels under Gaussian inputs: the MC estimate of
    the predictive moments must converge to it."""
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup(ny=2)
    mu, sig, c = propagate_em(post, norm, cfg, jnp.array(m), jnp.array(s))

    n_mc = 200_000
    zs = RNG.multivariate_normal(m, s, size=n_mc)
    mus = np.empty((n_mc, 2))
    vars_ = np.empty((n_mc, 2))
    # vectorized oracle-free MC using the jax predict path
    import jax
    from gpmpc_tpu.models import gp_core as gc

    def one(z):
        return gc.predict(post, z, cfg)

    mu_s, var_s = jax.vmap(one)(jnp.array(zs))
    mus, vars_ = np.asarray(mu_s), np.asarray(var_s)

    mc_mean = mus.mean(axis=0)
    # law of total (co)variance: cov = E[var] diag + cov(mu)
    mc_cov = np.diag(vars_.mean(axis=0)) + np.cov(mus.T)
    mc_cross = np.stack([
        [np.cov(zs[:, i], mus[:, a])[0, 1] for a in range(2)]
        for i in range(zs.shape[1])])

    np.testing.assert_allclose(np.asarray(mu), mc_mean, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sig), mc_cov, atol=8e-3)
    np.testing.assert_allclose(np.asarray(c), mc_cross, atol=5e-3)


def test_em_with_normalization_consistency():
    """EM through normalized stats must equal EM on pre-normalized data."""
    x, y, ells, sf2s, sn2s, cfg, post, _, m, s = _setup()
    d, ny = x.shape[1], y.shape[1]
    z_mean = RNG.standard_normal(d) * 0.1
    z_std = np.exp(RNG.standard_normal(d) * 0.2)
    y_mean = RNG.standard_normal(ny) * 0.1
    y_std = np.exp(RNG.standard_normal(ny) * 0.2)
    norm = Normalization(jnp.array(z_mean), jnp.array(z_std),
                         jnp.array(y_mean), jnp.array(y_std))
    # posterior built on normalized data
    xn = (x - z_mean) / z_std
    yn = (y - y_mean) / y_std
    hyp = gp_core.GPHypers(jnp.log(jnp.array(ells)), jnp.log(jnp.array(sf2s)),
                           jnp.log(jnp.array(sn2s)), jnp.zeros((ny, 0)))
    post_n = gp_core.posterior(jnp.array(xn), jnp.array(yn), hyp, cfg)
    mu, sig, c = propagate_em(post_n, norm, cfg, jnp.array(m), jnp.array(s))
    # oracle on normalized data, then denormalize by hand
    mn = (m - z_mean) / z_std
    sn = s / np.outer(z_std, z_std)
    want_mu, want_sig, want_c = oracle.exact_moment_matching(
        xn, yn, ells, sf2s, sn2s, mn, sn)
    np.testing.assert_allclose(np.asarray(mu), y_mean + y_std * want_mu,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig),
                               want_sig * np.outer(y_std, y_std), atol=1e-9)
    np.testing.assert_allclose(np.asarray(c),
                               want_c * np.outer(z_std, y_std), atol=1e-9)


# ------------------------------------------------------------------ UT

def test_ut_reduces_to_me_at_zero_input_cov():
    """With Sigma_z = 0 every sigma point collapses onto the mean: UT must
    reproduce the deterministic predict (up to the jitter floor)."""
    from gpmpc_tpu.models.propagate import propagate_ut
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup()
    d = len(m)
    mu_me, sig_me, _ = propagate_me(post, norm, cfg, jnp.array(m),
                                    jnp.zeros((d, d)))
    mu, sig, c = propagate_ut(post, norm, cfg, jnp.array(m),
                              jnp.zeros((d, d)))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_me), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_me), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-6)


def test_ut_against_monte_carlo():
    """UT is a third-order-accurate deterministic quadrature: on a smooth GP
    posterior with a moderate input Gaussian its moments must land close to
    the MC ground truth (looser bars than EM's — UT is approximate)."""
    from gpmpc_tpu.models.propagate import propagate_ut
    import jax
    from gpmpc_tpu.models import gp_core as gc

    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup(ny=2)
    mu, sig, c = propagate_ut(post, norm, cfg, jnp.array(m), jnp.array(s))

    zs = RNG.multivariate_normal(m, s, size=200_000)
    mu_s, var_s = jax.vmap(lambda z: gc.predict(post, z, cfg))(jnp.array(zs))
    mus, vars_ = np.asarray(mu_s), np.asarray(var_s)
    mc_mean = mus.mean(axis=0)
    mc_cov = np.diag(vars_.mean(axis=0)) + np.cov(mus.T)
    mc_cross = np.stack([
        [np.cov(zs[:, i], mus[:, a])[0, 1] for a in range(2)]
        for i in range(zs.shape[1])])

    scale = np.sqrt(np.diag(mc_cov))
    np.testing.assert_allclose(np.asarray(mu), mc_mean, atol=0.15 * scale.max())
    np.testing.assert_allclose(np.asarray(sig), mc_cov,
                               atol=0.25 * float(mc_cov.max()))
    np.testing.assert_allclose(np.asarray(c), mc_cross,
                               atol=0.25 * float(np.abs(mc_cross).max()))
    # and it must be strictly tighter than pretending the input is exact (ME)
    mu_me, sig_me, _ = propagate_me(post, norm, cfg, jnp.array(m),
                                    jnp.array(s))
    err_ut = np.abs(np.asarray(sig) - mc_cov).max()
    err_me = np.abs(np.asarray(sig_me) - mc_cov).max()
    assert err_ut < err_me


def test_ut_sigma_psd_and_matches_ta_on_near_linear_mean():
    """All default UT covariance weights are nonnegative -> Sigma_y PSD; and
    on a nearly-linear posterior mean (long lengthscales) UT and TA must
    agree (both reduce to the exact linear-Gaussian push-through)."""
    from gpmpc_tpu.models.propagate import propagate_ut
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup()
    # long lengthscales => near-linear mean over the input Gaussian's support
    ny, d = ells.shape
    ells_long = np.full((ny, d), 25.0)
    hyp = gp_core.GPHypers(jnp.log(jnp.array(ells_long)),
                           jnp.log(jnp.array(sf2s)),
                           jnp.log(jnp.array(sn2s)), jnp.zeros((ny, 0)))
    post_l = gp_core.posterior(jnp.array(x), jnp.array(y), hyp, cfg)

    mu_ut, sig_ut, c_ut = propagate_ut(post_l, norm, cfg, jnp.array(m),
                                       jnp.array(s))
    mu_ta, sig_ta, c_ta = propagate_ta(post_l, norm, cfg, jnp.array(m),
                                       jnp.array(s))
    # UT's mean carries a second-order curvature correction TA's lacks;
    # with ell=25 that term is ~1e-4 relative, not zero
    np.testing.assert_allclose(np.asarray(mu_ut), np.asarray(mu_ta),
                               rtol=1e-3, atol=1e-7)
    # sigma: the J Sigma J^T part coincides; the additive GP-variance term
    # is E[var] under UT vs var(mean) under TA — an O(1e-4) absolute gap
    # here (UT's is the law-of-total-variance estimate)
    np.testing.assert_allclose(np.asarray(sig_ut), np.asarray(sig_ta),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_ut), np.asarray(c_ta),
                               rtol=2e-3, atol=1e-7)
    evals = np.linalg.eigvalsh(np.asarray(sig_ut))
    assert evals.min() > -1e-10


def test_gh_converges_to_em_on_se():
    """EM is exact for SE kernels under Gaussian input, so GH quadrature
    must converge to it as the order grows — the correctness anchor for
    the kernel-generic scheme."""
    from gpmpc_tpu.models.propagate import propagate_gh
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup(ny=2)
    mu_e, sig_e, c_e = propagate_em(post, norm, cfg, jnp.array(m),
                                    jnp.array(s))

    errs = {}
    for order in (2, 6):
        mu, sig, c = propagate_gh(post, norm, cfg, jnp.array(m),
                                  jnp.array(s), order=order)
        errs[order] = max(np.abs(np.asarray(mu) - np.asarray(mu_e)).max(),
                          np.abs(np.asarray(sig) - np.asarray(sig_e)).max(),
                          np.abs(np.asarray(c) - np.asarray(c_e)).max())
    assert errs[6] < 0.3 * errs[2] + 1e-12, errs
    np.testing.assert_allclose(errs[6], 0.0, atol=2e-3)
    # the GP-variance term is only quadrature-approximated (EM integrates
    # it exactly), so exact agreement is not expected — but order 6 must
    # already sit well inside the MC noise floor of the UT test's bars
    assert errs[6] < 5e-3


def test_gh_matern_against_monte_carlo_beats_ut():
    """On a Matérn-5/2 posterior (no EM closed forms exist) GH is the
    high-accuracy full-covariance scheme: closer to the MC ground truth
    than UT on every moment block."""
    import jax
    from gpmpc_tpu.models import gp_core as gc
    from gpmpc_tpu.models.propagate import propagate_gh, propagate_ut

    x, y, ells, sf2s, sn2s, _, _, norm, m, s = _setup(ny=2)
    cfg = GPConfig(min_noise=0.0, jitter=0.0, kernel="matern52")
    hyp = gp_core.GPHypers(jnp.log(jnp.array(ells)),
                           jnp.log(jnp.array(sf2s)),
                           jnp.log(jnp.array(sn2s)), jnp.zeros((2, 0)))
    post = gc.posterior(jnp.array(x), jnp.array(y), hyp, cfg)

    mu_g, sig_g, c_g = propagate_gh(post, norm, cfg, jnp.array(m),
                                    jnp.array(s), order=5)
    mu_u, sig_u, c_u = propagate_ut(post, norm, cfg, jnp.array(m),
                                    jnp.array(s))

    zs = RNG.multivariate_normal(m, s, size=400_000)
    mu_s, var_s = jax.vmap(lambda z: gc.predict(post, z, cfg))(jnp.array(zs))
    mus, vars_ = np.asarray(mu_s), np.asarray(var_s)
    mc_mean = mus.mean(axis=0)
    mc_cov = np.diag(vars_.mean(axis=0)) + np.cov(mus.T)

    np.testing.assert_allclose(np.asarray(mu_g), mc_mean, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sig_g), mc_cov,
                               atol=0.02 * float(mc_cov.max()))
    err_gh = np.abs(np.asarray(sig_g) - mc_cov).max()
    err_ut = np.abs(np.asarray(sig_u) - mc_cov).max()
    assert err_gh <= err_ut + 1e-9, (err_gh, err_ut)
    # PSD by construction (positive GH weights)
    assert np.min(np.linalg.eigvalsh(
        0.5 * (np.asarray(sig_g) + np.asarray(sig_g).T))) > -1e-10


def test_gh_point_cap_guard():
    from gpmpc_tpu.models.propagate import propagate_gh, _tensor_gh_rule
    x, y, ells, sf2s, sn2s, cfg, post, norm, m, s = _setup(d=3)
    import pytest
    # auto does NOT silently downgrade an explicitly high order to the
    # degree-5 sparse rule — it goes tensor and hits the cap
    with pytest.raises(ValueError, match="cap"):
        propagate_gh(post, norm, cfg, jnp.zeros(3), jnp.eye(3), order=30)
    # the tensor rule itself is capped (order 3 at D=10 is 59049 points)
    with pytest.raises(ValueError, match="cap"):
        _tensor_gh_rule(10, 3)
    with pytest.raises(ValueError, match="gh_grid"):
        propagate_gh(post, norm, cfg, jnp.zeros(3), jnp.eye(3),
                     grid="smolyak")


# ------------------------------------------------- GH at high D (round 5)

def test_cubature5_rule_is_degree5_exact_at_d8():
    """The sparse rule for D>=7: 2 D^2 + 1 points, exact for every monomial
    of total degree <= 5 under N(0, I) — the same degree the order-3
    tensor grid achieves per dim, at 129 points instead of 6561."""
    from gpmpc_tpu.models.propagate import _cubature5_rule
    d = 8
    pts, w = _cubature5_rule(d)
    assert pts.shape == (2 * d * d + 1, d)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
    # E[x_i] = 0, E[x_i x_j] = delta_ij, E[x_i^3] = 0, E[x_i^4] = 3,
    # E[x_i^2 x_j^2] = 1 (i != j), E[x_i^3 x_j] = 0
    np.testing.assert_allclose(w @ pts, 0.0, atol=1e-12)
    np.testing.assert_allclose((pts.T * w) @ pts, np.eye(d), atol=1e-12)
    np.testing.assert_allclose(w @ pts ** 3, 0.0, atol=1e-11)
    np.testing.assert_allclose(w @ pts ** 4, 3.0, atol=1e-11)
    np.testing.assert_allclose(
        (pts.T ** 2 * w) @ pts ** 2,
        np.eye(d) * 2.0 + 1.0, atol=1e-11)
    np.testing.assert_allclose(w @ (pts[:, 0] ** 3 * pts[:, 1]), 0.0,
                               atol=1e-11)
    # degree-5 mixed: E[x_i^4 x_j] = 0, E[x_i^2 x_j^2 x_k] = 0
    np.testing.assert_allclose(w @ (pts[:, 0] ** 4 * pts[:, 1]), 0.0,
                               atol=1e-11)
    np.testing.assert_allclose(
        w @ (pts[:, 0] ** 2 * pts[:, 1] ** 2 * pts[:, 2]), 0.0, atol=1e-11)


def _setup_d8(n=30, ny=3):
    rng = np.random.default_rng(11)
    d = 8
    x = rng.uniform(-2, 2, size=(n, d))
    w = rng.standard_normal((d, ny)) * 0.4
    y = np.sin(x @ w)
    ells = np.exp(rng.standard_normal((ny, d)) * 0.15 + 0.6)
    sf2s = np.full(ny, 1.1)
    sn2s = np.full(ny, 0.03)
    cfg = GPConfig(min_noise=0.0, jitter=0.0)
    hyp = gp_core.GPHypers(jnp.log(jnp.array(ells)), jnp.log(jnp.array(sf2s)),
                           jnp.log(jnp.array(sn2s)), jnp.zeros((ny, 0)))
    post = gp_core.posterior(jnp.array(x), jnp.array(y), hyp, cfg)
    norm = Normalization.identity(d, ny, jnp.array(x).dtype)
    m = rng.uniform(-1, 1, size=d)
    a = rng.standard_normal((d, d)) * 0.1
    s = a @ a.T + 0.01 * np.eye(d)
    return cfg, post, norm, m, s


def test_gh_auto_switches_to_cubature_at_d8():
    """At D=8 (the quadrotor hybrid's input dim) the default order-3 tensor
    grid would be 6561 points; 'auto' must route to the 129-point degree-5
    cubature, agree with EM's exact SE answer, and stay PSD (the negative
    cubature weights are eigenvalue-floored)."""
    from gpmpc_tpu.models.propagate import propagate_gh
    cfg, post, norm, m, s = _setup_d8()
    mu_e, sig_e, c_e = propagate_em(post, norm, cfg, jnp.array(m),
                                    jnp.array(s))

    mu_a, sig_a, c_a = propagate_gh(post, norm, cfg, jnp.array(m),
                                    jnp.array(s))          # auto, order 3
    mu_c, sig_c, c_c = propagate_gh(post, norm, cfg, jnp.array(m),
                                    jnp.array(s), grid="cubature5")
    # auto == explicit cubature, bitwise (same rule selected)
    np.testing.assert_array_equal(np.asarray(mu_a), np.asarray(mu_c))
    np.testing.assert_array_equal(np.asarray(sig_a), np.asarray(sig_c))
    np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_c))
    # vs the exact SE closed forms
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_e),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_e),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_e), atol=5e-3)
    # PSD restored by the eigenvalue floor
    assert np.min(np.linalg.eigvalsh(
        0.5 * (np.asarray(sig_a) + np.asarray(sig_a).T))) >= -1e-12


def test_gh_order2_tensor_still_available_at_d8():
    """order=2 at D=8 is 256 points (<= the auto threshold): the tensor
    path with all-positive weights remains selectable as the
    PSD-by-construction fallback."""
    from gpmpc_tpu.models.propagate import propagate_gh
    cfg, post, norm, m, s = _setup_d8()
    mu_e, sig_e, _ = propagate_em(post, norm, cfg, jnp.array(m),
                                  jnp.array(s))
    mu, sig, c = propagate_gh(post, norm, cfg, jnp.array(m), jnp.array(s),
                              order=2)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_e), atol=5e-3)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_e),
                               atol=2e-2)
    assert np.min(np.linalg.eigvalsh(
        0.5 * (np.asarray(sig) + np.asarray(sig).T))) > -1e-12
    # cubature5 (degree 5) beats the degree-3 tensor grid on the covariance
    from gpmpc_tpu.models.propagate import propagate_gh as _gh
    _, sig_c, _ = _gh(post, norm, cfg, jnp.array(m), jnp.array(s),
                      grid="cubature5")
    err_c = np.abs(np.asarray(sig_c) - np.asarray(sig_e)).max()
    err_2 = np.abs(np.asarray(sig) - np.asarray(sig_e)).max()
    assert err_c <= err_2 + 1e-9, (err_c, err_2)
