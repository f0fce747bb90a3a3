"""Multi-host mesh surface [SURVEY §5 'distributed comm backend'].

Real multi-host hardware is unavailable here (single process, one chip);
what IS testable single-process is the whole code path below bring-up:
the 2-D ``("dcn", "dp")`` topology mesh that multi-host running produces,
exercised on the 8 virtual CPU devices, must give results identical to
the 1-D mesh and to the local (unsharded) program on every data-parallel
surface (BatchedStudy, GP training, MPC.solve_mc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.models import gp_core
from gpmpc_tpu.models.gp_core import GPConfig
from gpmpc_tpu.parallel import (batch_sharding, batch_spec,
                                initialize_multihost, make_study_mesh)
from gpmpc_tpu.systems import four_tank_ode

RNG = np.random.default_rng(7)
DT = 3.0
X_SS = np.array([12.4, 12.7, 1.8, 1.4])


def test_initialize_multihost_is_noop_single_process(monkeypatch):
    """Single-process launch with no cluster env must not try to reach a
    coordinator (it would hang) — the gate returns False untouched.
    (The REAL delegation path runs unstubbed in
    tests/test_multihost_bringup.py.)"""
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "JAX_COORDINATOR_IP", "MEGASCALE_COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES",
              "SLURM_NTASKS", "SLURM_NPROCS", "OMPI_COMM_WORLD_SIZE",
              "PMI_SIZE"):
        monkeypatch.delenv(k, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert initialize_multihost() is False
    assert called == []
    # single-task Slurm allocation is NOT a cluster launch
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert initialize_multihost() is False
    assert called == []
    # managed-pod env vars the real launchers plant DO delegate
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert initialize_multihost() is True
    monkeypatch.delenv("SLURM_NTASKS")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    assert initialize_multihost() is True
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    # metadata-server-only pods: explicit opt-in skips the env gate
    assert initialize_multihost(auto=True) is True
    # explicit cluster spec DOES delegate (stubbed — no real coordinator)
    assert initialize_multihost(coordinator_address="localhost:1234",
                                num_processes=2, process_id=0) is True
    assert called and called[-1]["num_processes"] == 2


def test_make_study_mesh_shapes():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    m1 = make_study_mesh(devs[:8])
    assert m1.axis_names == ("dp",) and m1.devices.shape == (8,)
    m2 = make_study_mesh(devs[:8], n_hosts=2)
    assert m2.axis_names == ("dcn", "dp") and m2.devices.shape == (2, 4)
    # batch annotation covers every axis, whatever the rank
    assert batch_spec(m2) == jax.sharding.PartitionSpec(("dcn", "dp"))
    x = jax.device_put(jnp.arange(16.0).reshape(16, 1), batch_sharding(m2))
    assert x.sharding.num_devices == 8
    with pytest.raises(ValueError):
        make_study_mesh(devs[:8], n_hosts=3)


def _tank_setup():
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=DT,
                  R=np.diag([1e-3] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=5)
    X, Y = model.generate_training_data(
        30, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, multistart=1, max_iters=80, seed=1)
    return model, gp


@pytest.mark.slow
def test_study_2d_mesh_matches_1d_and_local():
    """The multi-host topology mesh is a pure layout change: same study,
    same numbers on 2-D ("dcn","dp"), 1-D ("dp",), and no mesh."""
    from gpmpc_tpu.parallel import BatchedStudy

    devs = jax.devices()
    assert len(devs) >= 8
    model, gp = _tank_setup()

    def study(mesh):
        return BatchedStudy(
            model, gp, horizon=3 * DT,
            Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
            ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=48, mesh=mesh)

    b = 8
    x0s = np.tile(np.array([8.0, 9.0, 1.0, 1.0]), (b, 1))
    x0s = np.clip(x0s + 0.2 * RNG.standard_normal((b, 4)), 1.0, None)
    r_2d = study(make_study_mesh(devs[:8], n_hosts=2)).run(
        x0s, X_SS, n_steps=3, noise=False)
    r_1d = study(make_study_mesh(devs[:8])).run(
        x0s, X_SS, n_steps=3, noise=False)
    r_local = study(None).run(x0s, X_SS, n_steps=3, noise=False)
    # 2-D vs 1-D is the same per-device program (8 shards either way)
    np.testing.assert_allclose(np.asarray(r_2d.x_traj),
                               np.asarray(r_1d.x_traj), rtol=0, atol=1e-10)
    # vs local: sharded lowering reassociates reductions; the iterative
    # solver amplifies last-bit differences (same tolerance as the
    # existing 1-D test)
    np.testing.assert_allclose(np.asarray(r_2d.x_traj),
                               np.asarray(r_local.x_traj), atol=1e-5)
    np.testing.assert_allclose(float(r_2d.mean_cost),
                               float(r_local.mean_cost), rtol=1e-6)


@pytest.mark.slow
def test_fit_2d_mesh_matches_local():
    """GP training grid sharded over the 2-D topology mesh == local fit
    (bitwise, as for the 1-D mesh: each problem runs the same per-problem
    program, just on a different device)."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = make_study_mesh(devs[:8], n_hosts=2)
    key = jax.random.PRNGKey(0)
    kx, kf = jax.random.split(key)
    x = jax.random.uniform(kx, (24, 3))
    w = jnp.asarray([[1.0, -0.5, 0.2], [0.3, 0.8, -1.1], [0.0, 0.5, 0.5]])
    y = jnp.sin(x @ w.T) + 0.01 * jax.random.normal(kf, (24, 3))
    cfg = GPConfig(multistart=3, max_iters=40)   # 9 problems, pad 7
    h_local, v_local = gp_core.fit(x, y, cfg, jax.random.PRNGKey(1))
    h_mesh, v_mesh = gp_core.fit(x, y, cfg, jax.random.PRNGKey(1),
                                 mesh=mesh)
    for a, b in zip(h_local, h_mesh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_local), np.asarray(v_mesh),
                               rtol=0, atol=1e-10)


@pytest.mark.slow
def test_solve_mc_2d_mesh_matches_local():
    devs = jax.devices()
    assert len(devs) >= 8
    model, _ = _tank_setup()
    mpc = MPC(horizon=4 * DT, model=model, gp=None,
              discrete_method="rk4", gp_method="ME",
              Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
              ulb=[0.0, 0.0], uub=[8.0, 8.0],
              feedback=False, percentile=None, cov_updates=1)
    x0 = np.array([8.0, 9.0, 1.0, 1.0])
    key = jax.random.PRNGKey(3)
    xs_local, us_local = mpc.solve_mc(x0, 6 * DT, X_SS, 8, key=key)
    mesh = make_study_mesh(devs[:8], n_hosts=2)
    xs_mesh, us_mesh = mpc.solve_mc(x0, 6 * DT, X_SS, 8, key=key, mesh=mesh)
    # the 2-D lowering reassociates reductions differently from 1-D
    # (measured 1.3e-8 max over 6 x64 steps vs 4e-11 for the 1-D mesh);
    # the closed loop amplifies last-ulp differences
    np.testing.assert_allclose(np.asarray(xs_mesh), np.asarray(xs_local),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(us_mesh), np.asarray(us_local),
                               rtol=0, atol=1e-7)
