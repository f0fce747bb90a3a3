"""GP core vs. the NumPy oracle: kernel, NLL, training, prediction.

Test strategy per SURVEY.md §4: unit math tests against a naive oracle
(the reference itself ships no tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu.ops.kernels import se_ard, se_ard_cross, se_ard_gram
from gpmpc_tpu.ops.chol import cholesky_psd, cholupdate
from gpmpc_tpu.models import gp_core
from gpmpc_tpu.utils.config import GPConfig

import oracle

RNG = np.random.default_rng(0)


def _toy_data(n=30, d=3, ny=2):
    x = RNG.uniform(-2, 2, size=(n, d))
    y = np.stack([np.sin(x @ RNG.uniform(0.5, 1.5, d)),
                  np.cos(x @ RNG.uniform(0.5, 1.5, d))], axis=1)[:, :ny]
    y += 0.01 * RNG.standard_normal(y.shape)
    return x, y


def test_kernel_matches_oracle():
    d = 4
    x = RNG.standard_normal(d)
    z = RNG.standard_normal(d)
    ell = np.exp(RNG.standard_normal(d) * 0.3)
    sf2 = 1.7
    got = se_ard(jnp.array(x), jnp.array(z), jnp.array(ell), sf2)
    want = oracle.cov_se_ard(x, z, ell, sf2)
    assert abs(float(got) - want) < 1e-12


def test_gram_matches_oracle():
    x, _ = _toy_data()
    ell = np.exp(RNG.standard_normal(x.shape[1]) * 0.3)
    sf2, sn2 = 1.3, 0.01
    got = np.asarray(se_ard_gram(jnp.array(x), jnp.array(ell), sf2, sn2))
    want = oracle.gram(x, ell, sf2, sn2)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_cross_matches_oracle():
    x, _ = _toy_data(n=10)
    z = RNG.standard_normal((5, x.shape[1]))
    ell = np.exp(RNG.standard_normal(x.shape[1]) * 0.3)
    got = np.asarray(se_ard_cross(jnp.array(x), jnp.array(z), jnp.array(ell), 2.0))
    want = np.array([[oracle.cov_se_ard(xi, zj, ell, 2.0) for zj in z]
                     for xi in x])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_nll_matches_oracle():
    x, y = _toy_data()
    ell = np.exp(RNG.standard_normal(x.shape[1]) * 0.2)
    sf2, sn2 = 1.1, 0.05
    cfg = GPConfig(min_noise=0.0, jitter=0.0)
    got = gp_core.nll_single(jnp.log(jnp.array(ell)), jnp.log(sf2),
                             jnp.log(sn2), jnp.zeros(0), jnp.array(x),
                             jnp.array(y[:, 0]), cfg, "zero")
    want = oracle.nll(x, y[:, 0], ell, sf2, sn2)
    # implementation adds log-space priors (weak overflow guard on sn2,
    # calibration priors on ell/sf2 — GPConfig.{ell,sf2}_prior); subtract
    prior = (cfg.ell_prior * np.sum(np.log(ell) ** 2)
             + 1e-4 * np.log(sn2) ** 2
             + cfg.sf2_prior * np.log(sf2) ** 2)
    assert abs(float(got) - (want + prior)) < 1e-8


def test_predict_matches_oracle():
    x, y = _toy_data()
    ny, d = y.shape[1], x.shape[1]
    ells = np.exp(RNG.standard_normal((ny, d)) * 0.2)
    sf2s = np.array([1.0, 1.5])
    sn2s = np.array([0.01, 0.02])
    cfg = GPConfig(min_noise=0.0, jitter=0.0)
    hyp = gp_core.GPHypers(jnp.log(jnp.array(ells)), jnp.log(jnp.array(sf2s)),
                           jnp.log(jnp.array(sn2s)), jnp.zeros((ny, 0)))
    post = gp_core.posterior(jnp.array(x), jnp.array(y), hyp, cfg)
    z = RNG.standard_normal(d)
    mu, var = gp_core.predict(post, jnp.array(z), cfg)
    want_mu, want_var = oracle.predict_multi(x, y, ells, sf2s, sn2s, z)
    np.testing.assert_allclose(np.asarray(mu), want_mu, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), want_var, atol=1e-9)


@pytest.mark.slow
def test_training_recovers_good_fit():
    """L-BFGS multistart training reaches a good NLL and predicts held-out
    data well (the reference quality bar: SMSE validation [SURVEY §4])."""
    n, d = 80, 2
    x = RNG.uniform(-3, 3, size=(n, d))
    f = np.sin(x[:, 0]) * np.cos(0.5 * x[:, 1])
    y = (f + 0.05 * RNG.standard_normal(n))[:, None]
    cfg = GPConfig(multistart=3, max_iters=200)
    hyp, nlls = gp_core.fit(jnp.array(x), jnp.array(y), cfg,
                            jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(nlls)))
    post = gp_core.posterior(jnp.array(x), jnp.array(y), hyp, cfg)
    xt = RNG.uniform(-3, 3, size=(200, d))
    ft = np.sin(xt[:, 0]) * np.cos(0.5 * xt[:, 1])
    mus = np.array([np.asarray(gp_core.predict(post, jnp.array(z), cfg)[0])[0]
                    for z in xt])
    smse = np.mean((mus - ft) ** 2) / np.var(ft)
    assert smse < 0.05, f"SMSE {smse} too large"


def test_f32_training_variance_calibration():
    """Regression test for the round-3b failure class: on SMOOTH targets,
    unregularized accurate-f32 NLL descent walks the SE-ARD linear-kernel
    ridge (sf2 13-47x var(y), ell 1e4-1e6x std(x)) whose numerically
    singular Gram makes the predictive VARIANCE garbage of order sf2 even
    at the training inputs — every downstream uncertainty consumer
    (chance tightening, EM covariances) then breaks while the mean (and
    any SMSE-only test) still looks perfect.  The GPConfig ell/sf2 priors
    must keep the fit calibrated: hypers near the data scale and
    in-distribution predictive sigma a small fraction of std(y)."""
    rng = np.random.default_rng(42)   # own stream: position-independent
    n, d = 100, 4
    x = rng.uniform(-1.7, 1.7, size=(n, d)).astype(np.float32)
    # near-linear smooth target + tiny noise: the ridge-attracting case
    f = (0.9 * x[:, 0] + 0.4 * x[:, 1] - 0.2 * x[:, 2]
         + 0.05 * np.sin(x[:, 3]))
    y = (f + 1e-3 * rng.standard_normal(n)).astype(np.float32)
    y = ((y - y.mean()) / y.std())[:, None]
    cfg = GPConfig(multistart=2, max_iters=150, jitter=1e-5, min_noise=1e-5)
    hyp, _ = gp_core.fit(jnp.asarray(x), jnp.asarray(y), cfg,
                         jax.random.PRNGKey(3))
    assert hyp.log_sf2.dtype == jnp.float32
    # hypers within a few e-folds of the (unit) data scale
    assert float(jnp.max(hyp.log_sf2)) < 3.0, "sf2 escaped to the ridge"
    assert float(jnp.max(hyp.log_ell)) < 6.0, "ell escaped to the ridge"
    post = gp_core.posterior(jnp.asarray(x), jnp.asarray(y), hyp, cfg)
    var = np.array([np.asarray(gp_core.predict(post, jnp.asarray(z), cfg)[1])
                    for z in x])                     # (N, 1) at train inputs
    # Miscalibration has two measured polarities, per dataset/dim:
    #  * EXPLOSION — in-distribution variance of order sf2 (four-tank:
    #    one-step sigma 3.2 level units at a data-dense point); caught by
    #    the in-distribution bound (honest value here 0.09, ridge 0.8-10)
    assert float(np.median(var)) < 0.3, (
        f"median in-distribution predictive var {np.median(var):.3f} — "
        "variance decoupled from data density (ridge explosion)")
    #  * COLLAPSE — overconfident extrapolation: with ridge lengthscales
    #    (~90x data scale here) no reachable point is ever kernel-far, so
    #    variance never returns to the prior (measured far-point
    #    var/sf2 = 0.32 unregularized vs 0.94 with priors, 12 std out)
    far = jnp.asarray(np.full(d, 12.0, np.float32))
    vfar = float(gp_core.predict(post, far, cfg)[1][0])
    sf2 = float(jnp.exp(hyp.log_sf2)[0])
    assert vfar >= 0.6 * sf2, (
        f"far-point variance {vfar:.3f} vs sf2 {sf2:.3f} — overconfident "
        "extrapolation (ridge collapse)")


def test_cholupdate():
    n = 12
    a = RNG.standard_normal((n, n))
    spd = a @ a.T + n * np.eye(n)
    v = RNG.standard_normal(n)
    l = np.asarray(cholesky_psd(jnp.array(spd)))
    l_up = np.asarray(cholupdate(jnp.array(l), jnp.array(v)))
    np.testing.assert_allclose(l_up @ l_up.T, spd + np.outer(v, v), atol=1e-9)
    l_down = np.asarray(cholupdate(jnp.array(l_up), jnp.array(v),
                                   downdate=True))
    np.testing.assert_allclose(l_down @ l_down.T, spd, atol=1e-8)


def test_predict_jit_and_vmap_consistency():
    """vmap-of-1 == unbatched (device-parity strategy, SURVEY §4)."""
    x, y = _toy_data()
    cfg = GPConfig(min_noise=0.0, jitter=0.0)
    ny, d = y.shape[1], x.shape[1]
    hyp = gp_core.GPHypers(jnp.zeros((ny, d)), jnp.zeros(ny),
                           jnp.full(ny, -3.0), jnp.zeros((ny, 0)))
    post = gp_core.posterior(jnp.array(x), jnp.array(y), hyp, cfg)
    z = jnp.array(RNG.standard_normal((4, d)))
    single = jnp.stack([gp_core.predict(post, zi, cfg)[0] for zi in z])
    batched = jax.vmap(lambda zi: gp_core.predict(post, zi, cfg)[0])(z)
    np.testing.assert_allclose(np.asarray(single), np.asarray(batched),
                               atol=1e-12)


def test_f32_data_keeps_f32_posterior_under_x64():
    """An f32 GP trained while jax_enable_x64 is on must stay f32 end to
    end: the multistart perturbations silently promoted the fit (and the
    posterior) to f64, which then failed scan carry-type checks when an
    f32 MPC embedded the GP (found round 3 via the car bench on CPU)."""
    from gpmpc_tpu import GP

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (20, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (20, 2)), jnp.float32)
    gp = GP(x, y, mean_func="zero", multistart=2, max_iters=20, seed=0)
    assert gp.hyper.log_ell.dtype == jnp.float32
    assert gp.post.chol.dtype == jnp.float32
    assert gp.post.alpha.dtype == jnp.float32
    mu, var = gp.predict(jnp.zeros(3, jnp.float32))
    assert mu.dtype == jnp.float32 and var.dtype == jnp.float32


@pytest.mark.slow
def test_mesh_sharded_fit_matches_local():
    """fit(mesh=...) shards the multistart x Ny grid over devices and must
    return exactly the local fit's hypers/NLLs (DP over independent
    problems, incl. a grid size that needs padding) [SURVEY §2.3]."""
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs[:8]), axis_names=("dp",))

    key = jax.random.PRNGKey(0)
    kx, kf = jax.random.split(key)
    x = jax.random.uniform(kx, (24, 3))
    w = jnp.asarray([[1.0, -0.5, 0.2], [0.3, 0.8, -1.1], [0.0, 0.5, 0.5]])
    y = jnp.sin(x @ w.T) + 0.01 * jax.random.normal(kf, (24, 3))

    # multistart=3, Ny=3 -> 9 problems over 8 devices (pad of 7)
    cfg = GPConfig(multistart=3, max_iters=40)
    h_local, v_local = gp_core.fit(x, y, cfg, jax.random.PRNGKey(1))
    h_mesh, v_mesh = gp_core.fit(x, y, cfg, jax.random.PRNGKey(1), mesh=mesh)
    for a, b in zip(h_local, h_mesh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_local), np.asarray(v_mesh),
                               rtol=0, atol=1e-10)
