"""AOT export/serve path: serialized solve step == live solve step."""

import numpy as np
import jax
import jax.numpy as jnp

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.models.gp_core import GPHypers
from gpmpc_tpu.systems import four_tank_ode
import pytest

# AOT export round-trips compile twice per test (~1-2 min).
pytestmark = pytest.mark.slow
from gpmpc_tpu.utils.export import (export_solve_step, load_solve_step,
                                    _example_args)


def _small_mpc(dtype=jnp.float64):
    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
                  integrator_substeps=5)
    X, Y = model.generate_training_data(
        24, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    d, ny = X.shape[1], Y.shape[1]
    hyper = GPHypers(log_ell=jnp.zeros((ny, d), dtype),
                     log_sf2=jnp.zeros((ny,), dtype),
                     log_sn2=jnp.full((ny,), -4.0, dtype),
                     mean_w=jnp.zeros((ny, 0), dtype))
    gp = GP(X, Y, mean_func="zero", gp_method="TA", hyper=hyper,
            optimizer_opts=dict(jitter=1e-5, min_noise=1e-5))
    return MPC(horizon=5 * dt, model=model, gp=gp, gp_method="TA",
               discrete_method="gp", Q=np.diag([20.0, 20.0, 0.1, 0.1]),
               R=0.05 * np.eye(2), ulb=[0.0, 0.0], uub=[8.0, 8.0],
               xlb=[0.5, 0.5, 0.1, 0.1], xub=[16.0, 16.0, 8.0, 8.0],
               percentile=0.95, feedback=True, cov_updates=1, dtype=dtype)


def test_exported_step_matches_live(tmp_path):
    mpc = _small_mpc()
    path = str(tmp_path / "solve_step.bin")
    export_solve_step(mpc, path)

    step = load_solve_step(path)
    args = _example_args(mpc,
                         x0=jnp.asarray([8.0, 10.0, 1.0, 1.5]),
                         x_sp=jnp.asarray([14.0, 14.0, 1.8, 1.4]))
    u0_a, warm_a, obj_a = step(*args)

    # live reference
    warm, x0, x_sp, u_prev, sigma0, con_par, consts = args
    state, u0_b, _s, info = mpc._solve_step(
        warm, x0, x_sp, u_prev, sigma0, con_par, consts)
    u0_b = jnp.clip(u0_b, consts.ulb, consts.uub)

    np.testing.assert_allclose(np.asarray(u0_a), np.asarray(u0_b),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(warm_a.x), np.asarray(state.x),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(warm_a.lam), np.asarray(state.lam),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(obj_a), float(info.obj), rtol=1e-10)

    # the artifact is self-contained AND warm-startable: drives a receding
    # loop threading the returned solver state, never touching the MPC again
    x, w = x0, warm
    for _ in range(3):
        u0, w, _ = step(w, x, x_sp, u_prev, sigma0, con_par, consts)
        x = mpc.model.integrate(x, u0)
        u_prev = u0
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(np.asarray(w.x)).all()


def test_cross_platform_export_runs_on_cpu():
    """An artifact lowered for BOTH cpu and tpu (the build-offline /
    serve-on-fleet shape) still executes correctly on the cpu host."""
    mpc = _small_mpc(dtype=jnp.float32)
    blob = export_solve_step(mpc, platforms=("cpu", "tpu"))
    step = load_solve_step(blob)
    args = _example_args(mpc, x0=jnp.asarray([8.0, 10.0, 1.0, 1.5]),
                         x_sp=jnp.asarray([14.0, 14.0, 1.8, 1.4]))
    u0_a, _w, _ = step(*args)

    warm, x0, x_sp, u_prev, sigma0, con_par, consts = args
    _, u0_b, _, _ = mpc._solve_step(warm, x0, x_sp, u_prev, sigma0,
                                    con_par, consts)
    u0_b = jnp.clip(u0_b, consts.ulb, consts.uub)
    np.testing.assert_allclose(np.asarray(u0_a), np.asarray(u0_b),
                               rtol=2e-5, atol=1e-6)
