"""REAL multi-host bring-up [SURVEY §5 'distributed comm backend'].

Unlike tests/test_distributed.py (virtual 8-device mesh, single process,
``jax.distributed.initialize`` stub-tested), this launches TWO actual OS
processes on localhost CPU, each of which REALLY calls
``jax.distributed.initialize`` through
:func:`gpmpc_tpu.parallel.initialize_multihost` (no monkeypatch), joins
the coordinator, builds the 2-D ("dcn", "dp") topology mesh from real
``process_index`` values, runs a BatchedStudy sharded over the global
8-device mesh (Gloo cross-process collectives), and checks the psum'd
batch-mean cost against the single-process run.  This is the environment
maximum for multi-host coverage short of real pod hardware.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_bringup(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh.json")
    env = dict(os.environ)
    # share the suite's persistent compile cache with the workers
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", "2", "--process-id", str(i), "--out", out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out (coordinator hang?)")
        logs.append(log)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    reports = []
    for i in range(2):
        with open(f"{out}.p{i}") as f:
            reports.append(json.load(f))
    for i, r in enumerate(reports):
        assert r["ok"], r
        assert r["process_index"] == i
        assert r["process_count"] == 2
        assert r["device_count"] == 8
        assert r["local_device_count"] == 4
        assert r["mesh_shape"] == [2, 4]
        assert r["mesh_axis_names"] == ["dcn", "dp"]
        # psum'd global metric == this process's local single-process run
        assert r["rel_err"] < 1e-6
    # both controllers computed the SAME global metric (true SPMD)
    assert reports[0]["mean_cost_sharded"] == reports[1]["mean_cost_sharded"]
