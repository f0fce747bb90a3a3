"""Backend-dispatch policy tests (ops/dispatch.py): the GP core routes its
Gram/Cholesky calls through the policy, and the Pallas route engages exactly
when the policy + platform say so."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpmpc_tpu.ops import chol, dispatch, kernels


@pytest.fixture(autouse=True)
def restore_policy():
    saved = dispatch.get_policy()
    yield
    dispatch.set_policy(saved)


def test_default_policy_is_xla_everywhere():
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (64, 4)))
    ell = jnp.ones(4, x.dtype)
    g = dispatch.se_ard_gram_auto(x, ell, 1.0, 1e-3)
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(kernels.se_ard_gram(x, ell, 1.0,
                                                              1e-3)))
    l = dispatch.cholesky_auto(g + 0.1 * jnp.eye(64, dtype=x.dtype))
    np.testing.assert_allclose(
        np.asarray(l),
        np.asarray(chol.cholesky_psd(g + 0.1 * jnp.eye(64, dtype=x.dtype))))


def test_policy_thresholds_route_to_pallas(monkeypatch):
    """With a policy set and the platform reporting TPU, calls at/above the
    threshold go to the Pallas kernels; below stays on XLA."""
    calls = []

    def fake_gram(x, ell, sf2, sn2=0.0, jitter=0.0):
        calls.append(("gram", x.shape[0]))
        return kernels.se_ard_gram(x, ell, sf2, sn2, jitter)

    def fake_chol(a):
        calls.append(("chol", a.shape[-1]))
        return chol.cholesky_psd(a)

    import gpmpc_tpu.ops.pallas_kernels as pk
    monkeypatch.setattr(pk, "se_ard_gram_pallas", fake_gram)
    monkeypatch.setattr(pk, "cholesky_pallas", fake_chol)
    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    dispatch.set_policy(dispatch.PallasPolicy(gram_min_n=64, chol_min_n=64))

    x_small = jnp.zeros((32, 4))
    x_big = jnp.zeros((64, 4))
    ell = jnp.ones(4)
    dispatch.se_ard_gram_auto(x_small, ell, 1.0)
    dispatch.se_ard_gram_auto(x_big, ell, 1.0)
    dispatch.cholesky_auto(jnp.eye(32))
    dispatch.cholesky_auto(jnp.eye(64))
    assert calls == [("gram", 64), ("chol", 64)]


def test_gp_core_routes_through_dispatch(monkeypatch):
    """gp_core.posterior must consume the dispatched ops (the policy is a
    one-line hardware swap for the whole GP layer)."""
    from gpmpc_tpu.models import gp_core

    hits = []
    real = dispatch.kernel_gram_auto

    def spy(name, x, *a, **kw):
        hits.append(x.shape[0])
        return real(name, x, *a, **kw)

    monkeypatch.setattr(gp_core, "kernel_gram_auto", spy)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (16, 3)))
    y = jnp.asarray(rng.standard_normal((16, 2)))
    hyper = gp_core.GPHypers(log_ell=jnp.zeros((2, 3)),
                             log_sf2=jnp.zeros(2),
                             log_sn2=jnp.full(2, -3.0),
                             mean_w=jnp.zeros((2, 0)))
    from gpmpc_tpu.utils.config import GPConfig
    gp_core.posterior(x, y, hyper, GPConfig())
    assert hits and all(h == 16 for h in hits)
