"""The committed pinned bench model (benchmarks/bench_fixture.npz) must
stay loadable and healthy — every round-4 determinism claim rides on it,
and a blanket .gitignore rule silently dropped it once already."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_fixture_exists_and_serves():
    import bench as B

    assert os.path.exists(B._FIXTURE), (
        "benchmarks/bench_fixture.npz missing — regenerate with "
        "python benchmarks/make_bench_fixture.py ONLY if the bench spec "
        "changed (it is the pinned model; see RESULTS.md round 4)")
    f = np.load(B._FIXTURE)
    for prefix in ("tank", "car"):
        for field in ("X", "Y", "log_ell", "log_sf2", "log_sn2"):
            assert f"{prefix}_{field}" in f, f"{prefix}_{field} missing"

    gp = B._fixture_gp("tank", jnp.float32, gp_method="TA",
                       optimizer_opts=dict(jitter=1e-5, min_noise=1e-4))
    assert gp is not None
    z = jnp.asarray(np.concatenate([f["tank_X"][0]]), jnp.float32)
    mu, var = gp.predict(z[:4], z[4:])
    assert np.all(np.isfinite(np.asarray(mu)))
    var = np.asarray(var)
    assert np.all(np.isfinite(var)) and np.all(var >= 0.0)
    # the tank fit must sit ABOVE the f32 conditioning cliff: effective
    # noise >= the 1e-4 floor it was trained with
    eff_sn2 = np.exp(np.asarray(f["tank_log_sn2"])) + 1e-4
    assert np.all(eff_sn2 >= 1e-4)
