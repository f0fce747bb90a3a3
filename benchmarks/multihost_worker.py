"""Real multi-controller bring-up worker [SURVEY §5 'distributed comm
backend'].

Launched N times (one OS process per worker) by
``tests/test_multihost_bringup.py`` — or by hand:

    python benchmarks/multihost_worker.py --coordinator 127.0.0.1:9345 \
        --num-processes 2 --process-id 0 --out /tmp/mh.json &
    python benchmarks/multihost_worker.py --coordinator 127.0.0.1:9345 \
        --num-processes 2 --process-id 1 --out /tmp/mh.json

Each worker REALLY calls ``jax.distributed.initialize`` (through
:func:`gpmpc_tpu.parallel.initialize_multihost` — no monkeypatch), joins
the 2-process CPU cluster over localhost, builds the 2-D ("dcn", "dp")
topology mesh from REAL ``process_index`` values, runs a small
:class:`~gpmpc_tpu.parallel.BatchedStudy` sharded over the global mesh,
and asserts the psum'd batch-mean cost equals the single-process
(mesh=None) run of the same study.  This executes the one line the
virtual-mesh tests cannot: the actual coordinator handshake and the
cross-process SPMD launch.
"""

# Platform must be pinned BEFORE first backend use: each worker
# contributes 4 virtual CPU devices (2 workers -> 8 global devices,
# matching the test suite's virtual mesh), x64 for the parity-grade dtype
# used in tests.  NOTE (same caveat as tests/conftest.py): this image
# pre-imports jax in sitecustomize with JAX_PLATFORMS=axon, so env vars
# are read too late — jax.config.update works after import as long as no
# backend has been initialized, and XLA_FLAGS is read at backend-init
# time.
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import argparse
import json
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from gpmpc_tpu.parallel import (BatchedStudy, initialize_multihost,
                                    make_study_mesh)

    # THE line under test: real delegation to jax.distributed.initialize.
    assert initialize_multihost(coordinator_address=args.coordinator,
                                num_processes=args.num_processes,
                                process_id=args.process_id) is True

    n_proc = jax.process_count()
    assert n_proc == args.num_processes, (n_proc, args.num_processes)
    assert jax.process_index() == args.process_id
    assert len(jax.local_devices()) == 4
    assert jax.device_count() == 4 * args.num_processes

    # Topology mesh from REAL process indices: row i must hold exactly the
    # devices owned by process i (intra-row = intra-host).
    mesh = make_study_mesh()
    assert mesh.axis_names == ("dcn", "dp")
    assert mesh.devices.shape == (args.num_processes, 4)
    for i in range(args.num_processes):
        assert all(d.process_index == i for d in mesh.devices[i])

    # Same tiny tank study as tests/test_distributed.py (deterministic
    # seeds -> every process builds the identical model/GP locally).
    import jax.numpy as jnp

    from gpmpc_tpu import GP, Model
    from gpmpc_tpu.systems import four_tank_ode

    dt = 3.0
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
                  R=np.diag([1e-3] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=5)
    X, Y = model.generate_training_data(
        30, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, multistart=1, max_iters=80, seed=1)

    def study(m):
        return BatchedStudy(
            model, gp, horizon=3 * dt,
            Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
            ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=48, mesh=m)

    rng = np.random.default_rng(7)
    b = 8
    x0s = np.tile(np.array([8.0, 9.0, 1.0, 1.0]), (b, 1))
    x0s = np.clip(x0s + 0.2 * rng.standard_normal((b, 4)), 1.0, None)
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])

    # Sharded run: batch over the global (2, 4) mesh; mean_cost is the
    # psum'd cross-process metric (replicated, so float() is legal here).
    r_global = study(mesh).run(x0s, x_sp, n_steps=3, noise=False)
    mean_sharded = float(r_global.mean_cost)

    # Single-process reference: the same study with no mesh runs entirely
    # on this controller's local devices.
    r_local = study(None).run(x0s, x_sp, n_steps=3, noise=False)
    mean_local = float(r_local.mean_cost)

    rel = abs(mean_sharded - mean_local) / abs(mean_local)
    ok = rel < 1e-6

    out = {
        "ok": bool(ok),
        "process_index": int(jax.process_index()),
        "process_count": int(n_proc),
        "device_count": int(jax.device_count()),
        "local_device_count": int(len(jax.local_devices())),
        "mesh_shape": list(mesh.devices.shape),
        "mesh_axis_names": list(mesh.axis_names),
        "mean_cost_sharded": mean_sharded,
        "mean_cost_local": mean_local,
        "rel_err": rel,
    }
    with open(f"{args.out}.p{args.process_id}", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))

    jax.distributed.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
