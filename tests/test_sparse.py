"""Sparse (inducing-point) variational GP — beyond-reference capability.

Validates the Titsias-VFE implementation against the exact GP it
generalizes (``gp_core``): the bound property, exactness at Z = X, the
drop-in GPPosterior contract (predict + EM propagation), the GP-class
surface (train/validate/save/load), and the MPC embedding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.models import gp_core, sparse
from gpmpc_tpu.models.propagate import Normalization, propagate_em
from gpmpc_tpu.systems import four_tank_ode
from gpmpc_tpu.utils.config import GPConfig

CFG = GPConfig(multistart=1, max_iters=150)


@pytest.fixture(scope="module")
def toy():
    """Smooth 2-output regression problem, N=160, D=3."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-2, 2, (160, 3)))

    def f(x):
        return jnp.stack([jnp.sin(x[..., 0]) * x[..., 1],
                          jnp.cos(x[..., 2])], axis=-1)

    y = f(x) + 0.05 * jnp.asarray(rng.normal(size=(160, 2)))
    hyp, _ = gp_core.fit(x, y, CFG, jax.random.PRNGKey(0))
    return x, y, f, hyp


def test_select_inducing_deterministic_spread(toy):
    x, _, _, _ = toy
    idx = sparse.select_inducing(x, 24)
    idx2 = sparse.select_inducing(x, 24)
    assert np.array_equal(np.asarray(idx), np.asarray(idx2))
    assert len(np.unique(np.asarray(idx))) == 24      # no duplicates
    # k-center covers: every point within a modest radius of the set
    d2 = np.min(np.sum((np.asarray(x)[:, None] -
                        np.asarray(x[idx])[None]) ** 2, -1), 1)
    assert d2.max() < np.sum((x.max(0) - x.min(0)) ** 2) / 4


def test_vfe_matches_exact_nll_at_full_inducing(toy):
    """Z = X makes the variational bound tight (up to jitter scale)."""
    x, y, _, hyp = toy
    for d in range(2):
        ex = gp_core.nll_single(hyp.log_ell[d], hyp.log_sf2[d],
                                hyp.log_sn2[d], hyp.mean_w[d],
                                x, y[:, d], CFG, "zero")
        vf = sparse.vfe_nll_single(hyp.log_ell[d], hyp.log_sf2[d],
                                   hyp.log_sn2[d], hyp.mean_w[d],
                                   x, x, y[:, d], CFG, "zero")
        assert abs(float(vf - ex)) < 1e-4 * (1.0 + abs(float(ex)))


def test_vfe_is_an_upper_bound(toy):
    """F(Z) >= exact NLL for any inducing subset (Titsias 2009)."""
    x, y, _, hyp = toy
    z = x[sparse.select_inducing(x, 20)]
    for d in range(2):
        ex = gp_core.nll_single(hyp.log_ell[d], hyp.log_sf2[d],
                                hyp.log_sn2[d], hyp.mean_w[d],
                                x, y[:, d], CFG, "zero")
        vf = sparse.vfe_nll_single(hyp.log_ell[d], hyp.log_sf2[d],
                                   hyp.log_sn2[d], hyp.mean_w[d],
                                   z, x, y[:, d], CFG, "zero")
        assert float(vf) >= float(ex) - 1e-8


def test_sparse_posterior_drop_in(toy):
    """With Z = X the sparse GPPosterior reproduces the exact one through
    the UNCHANGED ``gp_core.predict`` — the drop-in contract."""
    x, y, _, hyp = toy
    post = gp_core.posterior(x, y, hyp, CFG)
    sp = sparse.sparse_posterior(x, y, x, hyp, CFG)
    zt = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, (40, 3)))
    mu_e, var_e = jax.vmap(lambda z: gp_core.predict(post, z, CFG))(zt)
    mu_s, var_s = jax.vmap(lambda z: gp_core.predict(sp, z, CFG))(zt)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e), atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_e),
                               atol=1e-4)


def test_sparse_em_propagation_psd_and_consistent(toy):
    """EM moment matching through the sparse posterior: PSD output
    covariance, and (at M close to N) moments near the exact-GP EM."""
    x, y, _, hyp = toy
    post = gp_core.posterior(x, y, hyp, CFG)
    sp = sparse.sparse_posterior(x, y, x[sparse.select_inducing(x, 120)],
                                 hyp, CFG)
    norm = Normalization.identity(3, 2, x.dtype)
    mu_z = jnp.asarray([0.3, -0.5, 1.0])
    cov_z = 0.01 * jnp.eye(3, dtype=x.dtype)
    mu_e, sig_e, _ = propagate_em(post, norm, CFG, mu_z, cov_z)
    mu_s, sig_s, _ = propagate_em(sp, norm, CFG, mu_z, cov_z)
    ev = np.linalg.eigvalsh(np.asarray(sig_s))
    assert ev.min() > -1e-9, f"sparse EM covariance not PSD: {ev}"
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e), atol=5e-2)
    np.testing.assert_allclose(np.asarray(sig_s), np.asarray(sig_e),
                               atol=5e-2)


def test_sparse_gp_class_end_to_end(toy):
    """GP(inducing=M): trains on the bound, validates, predicts with and
    without input covariance, and reports sane hyperparameters."""
    x, y, f, _ = toy
    gp = GP(np.asarray(x), np.asarray(y), multistart=1, max_iters=150,
            inducing=32, seed=0)
    assert gp.post.x.shape == (32, 3)
    rng = np.random.default_rng(5)
    xt = rng.uniform(-2, 2, (200, 3))
    smse, mnlp, rmse = gp.validate(xt, np.asarray(f(jnp.asarray(xt))),
                                   verbose=False)
    assert np.all(smse < 0.05), f"sparse SMSE too high: {smse}"
    mu, sig = gp.predict(np.array([0.1, 0.2, -0.3]),
                         cov=0.01 * np.eye(3))
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.linalg.eigvalsh(np.asarray(sig)) > -1e-9)


def test_sparse_guards():
    x = np.random.default_rng(0).uniform(size=(20, 2))
    y = x[:, :1] * 2.0
    with pytest.raises(ValueError, match="inducing"):
        GP(x, y, inducing=20, train=False)       # M must be < N
    with pytest.raises(ValueError, match="inducing"):
        GP(x, y, inducing=0, train=False)


def test_optimize_inducing_improves_bound_and_roundtrips(toy, tmp_path):
    """Stage-2 Z optimization: the summed VFE bound at the optimized set
    is no worse than at the k-center set (guarded fallback), persistence
    stores the MOVED set, and the loaded model reproduces predictions."""
    x, y, _, _ = toy
    gp0 = GP(np.asarray(x), np.asarray(y), multistart=1, max_iters=150,
             inducing=12, seed=0)
    gp1 = GP(np.asarray(x), np.asarray(y), multistart=1, max_iters=150,
             inducing=12, seed=0, optimize_inducing=True)
    assert float(jnp.sum(gp1.nll)) <= float(jnp.sum(gp0.nll)) + 1e-6
    # Z actually moved off the k-center subset
    assert not np.allclose(np.asarray(gp1.Zn), np.asarray(gp0.Zn))
    path = str(tmp_path / "szopt.npz")
    gp1.save_model(path)
    gp2 = GP.load_model(path)
    np.testing.assert_allclose(np.asarray(gp2.Zn), np.asarray(gp1.Zn))
    z = np.array([0.4, -0.2, 0.9])
    np.testing.assert_allclose(np.asarray(gp2.predict(z)[0]),
                               np.asarray(gp1.predict(z)[0]), atol=1e-12)


def test_optimize_inducing_requires_sparse():
    x = np.random.default_rng(0).uniform(size=(20, 2))
    with pytest.raises(ValueError, match="optimize_inducing"):
        GP(x, x[:, :1], optimize_inducing=True, train=False)


def test_online_conditioning_rejects_sparse(toy):
    from gpmpc_tpu.parallel import online_gp
    x, y, _, _ = toy
    gp = GP(np.asarray(x), np.asarray(y), multistart=1, max_iters=60,
            inducing=16, seed=0)
    with pytest.raises(ValueError, match="non-sparse"):
        online_gp.from_gp(gp, capacity=200)


def test_sparse_save_load_roundtrip(toy, tmp_path):
    """Persistence: the k-center set is deterministic given (X, M), so the
    reloaded model rebuilds the identical sparse posterior."""
    x, y, _, _ = toy
    gp = GP(np.asarray(x), np.asarray(y), multistart=1, max_iters=100,
            inducing=24, seed=0)
    path = str(tmp_path / "sparse_gp.npz")
    gp.save_model(path)
    gp2 = GP.load_model(path)
    assert gp2.inducing == 24
    z = np.array([0.4, -0.2, 0.9])
    mu1, v1 = gp.predict(z)
    mu2, v2 = gp2.predict(z)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-10)


@pytest.mark.slow
def test_sparse_gp_mpc_closed_loop():
    """The sparse posterior embedded in the MPC NLP: four-tank GP-MPC with
    inducing=24 out of N=120 regulates to the setpoint — the production
    path for large training sets [BASELINE config 2 shape]."""
    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=10)
    X, Y = model.generate_training_data(
        120, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=2,
            max_iters=150, seed=1, inducing=24)
    x_ss = np.array([12.4, 12.7, 1.8, 1.4])
    mpc = MPC(horizon=5 * dt, model=model, gp=gp, gp_method="TA",
              discrete_method="gp",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    xs, us = mpc.solve(x0=np.array([8.0, 9.0, 1.0, 1.0]),
                       sim_time=12 * dt, x_sp=x_ss, noise=False)
    xs = np.asarray(xs)
    err = np.abs(xs[-1, :2] - x_ss[:2])
    assert np.all(np.isfinite(xs))
    assert np.all(err < 1.0), f"sparse GP-MPC final level error {err}"


@pytest.mark.slow
def test_sparse_mesh_fit_matches_local(toy):
    """fit_sparse(mesh=...) shards the VFE multistart grid and must equal
    the local sparse fit exactly."""
    from jax.sharding import Mesh
    from gpmpc_tpu.models import sparse

    x, y = toy[0], toy[1]
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), axis_names=("dp",))
    z = x[sparse.select_inducing(x, 12)]
    cfg = GPConfig(multistart=2, max_iters=30)
    h_l, v_l = sparse.fit_sparse(x, y, z, cfg, jax.random.PRNGKey(5))
    h_m, v_m = sparse.fit_sparse(x, y, z, cfg, jax.random.PRNGKey(5),
                                 mesh=mesh)
    for a, b in zip(h_l, h_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_l), np.asarray(v_m),
                               rtol=0, atol=1e-10)
