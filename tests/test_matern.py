"""Matérn kernel family (round 4, beyond-reference — SURVEY C3a is SE-only).

Coverage: closed forms vs a naive NumPy oracle, GP fit/predict quality on a
C^1-rough target where Matérn is the right prior, TA propagation
differentiability at/near r=0, a closed-loop MPC smoke, and the guards that
keep the SE-only paths (EM, sparse VFE, online conditioning) honest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.ops.kernels import kernel_cross, kernel_gram
from gpmpc_tpu.systems import four_tank_ode

RNG = np.random.default_rng(5)


def _oracle_matern(x, z, ell, sf2, nu):
    r = np.sqrt(((x[:, None, :] - z[None, :, :]) ** 2
                 / ell[None, None, :] ** 2).sum(-1))
    if nu == 1.5:
        c = np.sqrt(3.0)
        poly = 1.0 + c * r
    else:
        c = np.sqrt(5.0)
        poly = 1.0 + c * r + (5.0 / 3.0) * r ** 2
    return sf2 * poly * np.exp(-c * r)


@pytest.mark.parametrize("name,nu", [("matern32", 1.5), ("matern52", 2.5)])
def test_matern_cross_matches_oracle(name, nu):
    x = RNG.standard_normal((7, 3))
    z = RNG.standard_normal((5, 3))
    ell = np.exp(RNG.standard_normal(3) * 0.3)
    sf2 = 1.7
    got = np.asarray(kernel_cross(name, jnp.asarray(x), jnp.asarray(z),
                                  jnp.asarray(ell), sf2))
    np.testing.assert_allclose(got, _oracle_matern(x, z, ell, sf2, nu),
                               rtol=1e-10, atol=1e-12)


def test_matern_gram_diag_exact_and_spd():
    x = RNG.standard_normal((20, 4))
    ell = np.ones(4)
    k = np.asarray(kernel_gram("matern52", jnp.asarray(x), jnp.asarray(ell),
                               2.0, sn2=0.1, jitter=0.0))
    np.testing.assert_allclose(np.diag(k), 2.1, rtol=1e-12)
    assert np.min(np.linalg.eigvalsh(0.5 * (k + k.T))) > 0.0


def test_matern_gp_fit_beats_se_on_rough_target():
    """|x|-type kinks are C^0/C^1 — the Matérn prior should fit them at
    least as well as SE on held-out data (and the fit must be sane)."""
    n = 120
    x = RNG.uniform(-2.0, 2.0, (n, 2))
    y = (np.abs(x[:, :1]) + 0.3 * np.sin(3.0 * x[:, 1:])
         + 0.01 * RNG.standard_normal((n, 1)))
    xt = RNG.uniform(-2.0, 2.0, (60, 2))
    yt = np.abs(xt[:, :1]) + 0.3 * np.sin(3.0 * xt[:, 1:])

    res = {}
    for kern in ("se", "matern52"):
        gp = GP(x, y, mean_func="zero", gp_method="TA", multistart=2,
                max_iters=150, seed=2, kernel=kern)
        smse, _, _ = gp.validate(xt, yt, verbose=False)
        res[kern] = float(np.mean(np.asarray(smse)))
    assert res["matern52"] < 0.05, f"matern52 SMSE {res['matern52']}"
    assert res["matern52"] < 3.0 * res["se"] + 1e-6


def test_matern_ta_propagation_differentiable_at_zero_distance():
    """TA takes jacfwd of the GP mean; the Matérn sqrt must carry finite
    tangents even when the query coincides with a training point."""
    x = RNG.standard_normal((15, 3))
    y = np.sin(x[:, :1])
    gp = GP(x, y, gp_method="TA", multistart=1, max_iters=50, seed=0,
            kernel="matern52")
    z0 = jnp.asarray(x[3], jnp.float64)  # exactly on a training input

    from gpmpc_tpu.models import gp_core

    def mean_at(z):
        zn = (z - gp.norm.z_mean) / gp.norm.z_std
        return gp_core.predict(gp.post, zn, gp.cfg)[0].sum()

    g = jax.jacfwd(mean_at)(z0)
    assert np.all(np.isfinite(np.asarray(g)))
    # and the moment map itself stays finite with a nonzero input cov
    mu, cov, _ = gp.moment_map()(z0, 0.01 * jnp.eye(3, dtype=z0.dtype))
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.isfinite(np.asarray(cov)))


@pytest.mark.slow
def test_matern_closed_loop_mpc():
    """Four-tank TA + tightening closed loop with a Matérn-5/2 dynamics GP:
    the whole embedding (predict + jacfwd TA inside the NLP) is
    kernel-generic."""
    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=10)
    X, Y = model.generate_training_data(
        50, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(7))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=2,
            max_iters=150, seed=5, kernel="matern52")
    mpc = MPC(horizon=5 * dt, model=model, gp=gp, gp_method="TA",
              discrete_method="gp",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.5, 0.5, 0.1, 0.1], xub=[14.0, 25.0, 8.0, 8.0],
              percentile=0.95, feedback=True, cov_updates=2)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    xs, us = mpc.solve(x0=x0, sim_time=8 * dt, x_sp=x_sp, noise=False)
    xs = np.asarray(xs)
    assert np.all(np.isfinite(xs))
    # the loop must actually track: final state near the setpoint
    assert np.linalg.norm(xs[-1][:2] - x_sp[:2]) < 1.0


def test_matern_guards():
    x = RNG.standard_normal((30, 3))
    y = np.sin(x[:, :1])
    with pytest.raises(ValueError, match="EM"):
        GP(x, y, gp_method="EM", kernel="matern52", multistart=1,
           max_iters=10)
    with pytest.raises(ValueError, match="unknown kernel"):
        GP(x, y, kernel="rbf", multistart=1, max_iters=10)
    gp = GP(x, y, gp_method="TA", kernel="matern52", multistart=1,
            max_iters=10)
    with pytest.raises(ValueError, match="EM"):
        gp.set_method("EM")


def test_matern_sparse_vfe_exact_at_full_inducing():
    """The Titsias bound and the drop-in posterior are kernel-family
    generic: with kernel='matern52' and Z = X the bound is tight and the
    sparse GPPosterior reproduces the exact predictions."""
    import jax.numpy as jnp
    from gpmpc_tpu.models import gp_core, sparse
    from gpmpc_tpu.utils.config import GPConfig

    cfg = GPConfig(multistart=1, max_iters=100, kernel="matern52")
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-2, 2, (80, 3)))
    # observation noise keeps the trained sn2 away from the floor — the
    # Z=X bound gap scales like jitter/sn2, so a noiseless fit would turn
    # this tightness check into a jitter measurement
    y = (jnp.stack([jnp.abs(x[:, 0]), jnp.cos(x[:, 2])], axis=-1)
         + 0.05 * jnp.asarray(rng.normal(size=(80, 2))))
    hyp, _ = gp_core.fit(x, y, cfg, jax.random.PRNGKey(0))
    for d in range(2):
        ex = gp_core.nll_single(hyp.log_ell[d], hyp.log_sf2[d],
                                hyp.log_sn2[d], hyp.mean_w[d],
                                x, y[:, d], cfg, "zero")
        vf = sparse.vfe_nll_single(hyp.log_ell[d], hyp.log_sf2[d],
                                   hyp.log_sn2[d], hyp.mean_w[d],
                                   x, x, y[:, d], cfg, "zero")
        assert abs(float(vf - ex)) < 1e-4 * (1.0 + abs(float(ex)))
        # strict subset keeps the upper-bound property too
        z = x[sparse.select_inducing(x, 16)]
        vf_sub = sparse.vfe_nll_single(hyp.log_ell[d], hyp.log_sf2[d],
                                       hyp.log_sn2[d], hyp.mean_w[d],
                                       z, x, y[:, d], cfg, "zero")
        assert float(vf_sub) >= float(ex) - 1e-8
    post = gp_core.posterior(x, y, hyp, cfg)
    sp = sparse.sparse_posterior(x, y, x, hyp, cfg)
    zt = jnp.asarray(rng.uniform(-2, 2, (25, 3)))
    mu_e, var_e = jax.vmap(lambda z: gp_core.predict(post, z, cfg))(zt)
    mu_s, var_s = jax.vmap(lambda z: gp_core.predict(sp, z, cfg))(zt)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e), atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_e),
                               atol=1e-4)


def test_matern_sparse_gp_class_fit():
    """GP(kernel='matern52', inducing=M) trains through the VFE bound and
    predicts the held-out kinked target well."""
    n = 240
    x = RNG.uniform(-2.0, 2.0, (n, 2))
    y = (np.abs(x[:, :1]) + 0.3 * np.sin(3.0 * x[:, 1:])
         + 0.01 * RNG.standard_normal((n, 1)))
    xt = RNG.uniform(-1.8, 1.8, (60, 2))
    yt = np.abs(xt[:, :1]) + 0.3 * np.sin(3.0 * xt[:, 1:])
    gp = GP(x, y, mean_func="zero", gp_method="TA", multistart=2,
            max_iters=150, seed=3, kernel="matern52", inducing=48)
    smse, _, _ = gp.validate(xt, yt, verbose=False)
    assert float(np.mean(np.asarray(smse))) < 0.05


def test_matern_online_condition_matches_batch_retrain():
    """The Schur-complement streaming update is kernel-family generic:
    conditioning a Matérn-3/2 posterior on new points equals rebuilding
    the posterior from scratch on the union data."""
    import jax.numpy as jnp
    from gpmpc_tpu.models import gp_core
    from gpmpc_tpu.parallel import online_gp
    from gpmpc_tpu.utils.config import GPConfig

    rng = np.random.default_rng(9)
    d, ny = 3, 2
    x = rng.uniform(-2, 2, size=(15, d))
    y = np.stack([np.sin(x @ np.ones(d)), np.cos(x @ np.ones(d))], axis=1)
    hyper = gp_core.GPHypers(
        log_ell=jnp.zeros((ny, d)), log_sf2=jnp.zeros(ny),
        log_sn2=jnp.full(ny, -4.0), mean_w=jnp.zeros((ny, 0)))
    gp = GP(x, y, hyper=hyper, normalize=True, kernel="matern32",
            optimizer_opts=dict(min_noise=0.0, jitter=0.0))
    post, norm = online_gp.from_gp(gp, capacity=32)

    new_z = rng.uniform(-2, 2, size=(3, d))
    new_y = np.stack([np.sin(new_z @ np.ones(d)),
                      np.cos(new_z @ np.ones(d))], axis=1)
    for z, yv in zip(new_z, new_y):
        post = online_gp.condition(post, norm, jnp.asarray(z),
                                   jnp.asarray(yv), kernel="matern32")
    assert int(post.count) == 18

    x_all = np.concatenate([x, new_z])
    y_all = np.concatenate([y, new_y])
    xn = (x_all - np.asarray(norm.z_mean)) / np.asarray(norm.z_std)
    yn = (y_all - np.asarray(norm.y_mean)) / np.asarray(norm.y_std)
    cfg = GPConfig(min_noise=0.0, jitter=0.0, kernel="matern32")
    ref_post = gp_core.posterior(jnp.asarray(xn), jnp.asarray(yn),
                                 gp.hyper, cfg)
    zq = rng.standard_normal(d)
    mu, var = online_gp.predict(post, norm, jnp.asarray(zq),
                                kernel="matern32")
    zqn = (zq - np.asarray(norm.z_mean)) / np.asarray(norm.z_std)
    mu_n, var_n = gp_core.predict(ref_post, jnp.asarray(zqn), cfg)
    mu_ref = (np.asarray(norm.y_mean)
              + np.asarray(norm.y_std) * np.asarray(mu_n))
    var_ref = np.asarray(norm.y_std) ** 2 * np.asarray(var_n)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=1e-8)


def test_matern_save_load_preserves_kernel(tmp_path):
    """A persisted Matérn GP must reload as Matérn (round-4 fix: the
    kernel field was not serialized, silently degrading to SE)."""
    x = RNG.uniform(-2, 2, (40, 3))
    y = np.sin(x[:, :1])
    gp = GP(x, y, gp_method="TA", kernel="matern52", multistart=1,
            max_iters=60, seed=1)
    path = str(tmp_path / "m52.npz")
    gp.save_model(path)
    gp2 = GP.load_model(path)
    assert gp2.cfg.kernel == "matern52"
    z = np.array([0.3, -0.5, 1.1])
    mu1, var1 = gp.predict(z)
    mu2, var2 = gp2.predict(z)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2),
                               atol=1e-10)


@pytest.mark.slow
def test_matern_gh_closed_loop_mpc():
    """Flagship beyond-reference combination: Matérn-5/2 dynamics GP with
    Gauss-Hermite full-covariance propagation (the EM analog that exists
    for non-SE kernels) inside the chance-tightened closed loop."""
    import jax.numpy as jnp
    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=10)
    X, Y = model.generate_training_data(
        50, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(7))
    gp = GP(X, Y, mean_func="zero", gp_method="GH", multistart=2,
            max_iters=150, seed=5, kernel="matern52")
    # moment-map smoke through the GP surface first
    mu, cov = gp.predict(np.full(4, 8.0), np.full(2, 2.0),
                         cov=0.01 * np.eye(6))
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.min(np.linalg.eigvalsh(np.asarray(cov))) > -1e-10

    mpc = MPC(horizon=5 * dt, model=model, gp=gp, gp_method="GH",
              discrete_method="gp",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              xlb=[0.5, 0.5, 0.1, 0.1], xub=[14.0, 25.0, 8.0, 8.0],
              percentile=0.95, feedback=True, cov_updates=2)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    xs, us = mpc.solve(x0=x0, sim_time=6 * dt, x_sp=x_sp, noise=False)
    xs = np.asarray(xs)
    assert np.all(np.isfinite(xs))
    assert np.linalg.norm(xs[-1][:2] - x_sp[:2]) < 1.5
