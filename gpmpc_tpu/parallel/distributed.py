"""Multi-host runtime + device-mesh construction for the data-parallel
surfaces [SURVEY §5 'distributed comm backend'].

The reference is a single-process CasADi script; its notion of scale is
"run the script again" [SURVEY §2.3 'DP: absent'].  Here every batched
surface (:class:`~gpmpc_tpu.parallel.batched.BatchedStudy`,
:meth:`MPC.solve_mc <gpmpc_tpu.mpc.controller.MPC.solve_mc>`, and
``GP(mesh=)`` hyperparameter training) scales by sharding its batch axis
over a ``jax.sharding.Mesh`` and letting XLA insert the collectives — so
"multi-host" is not a new execution path, it is the SAME mesh recipe with
two refinements this module owns:

* **process bring-up** — on a TPU pod each host runs one copy of the same
  program and must join a coordinator before first backend use
  (:func:`initialize_multihost`, a thin gate over
  ``jax.distributed.initialize``);
* **topology-aware mesh shape** — chips within a host/slice talk over ICI
  (fast, torus), hosts talk over DCN (slow, ethernet).  A batch axis
  sharded over a 2-D ``("dcn", "dp")`` mesh keeps each host's lanes on
  its own chips; the only cross-DCN traffic is the final psum of the
  scalar metrics (:func:`make_study_mesh`).

Single-host, this module degrades to the 1-D ``("dp",)`` mesh the rest of
the package has always used.  The consumers accept ANY mesh and shard
their batch over ALL of its axes (``PartitionSpec(mesh.axis_names)``), so
1-D vs 2-D is a layout choice, not an API switch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_multihost", "make_study_mesh", "batch_sharding",
           "batch_spec"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         **kwargs) -> bool:
    """Join (or skip) JAX's multi-controller runtime; returns True if the
    distributed runtime was initialized.

    Call once per process, BEFORE first backend use.  Three launch modes:

    * managed TPU pod (GKE / TPU VM): call with NO arguments — the cluster
      environment carries coordinator/process info and
      ``jax.distributed.initialize`` autodetects it;
    * bare-metal / manual: pass ``coordinator_address`` ("host:port" of
      process 0), ``num_processes``, and this process's ``process_id``;
    * single-process (this environment, and every test/bench here): with
      no arguments and no cluster environment the call is a NO-OP — the
      single-process mesh path needs no coordination.

    The gate exists so library code and examples can call this
    unconditionally: single-host nothing happens, multi-host the same
    line brings the process into the pod.
    """
    if coordinator_address is None and num_processes in (None, 1):
        # No explicit cluster spec: autodetect only when a launcher has
        # planted one (TPU pods set cloud metadata; GKE sets JAX_* /
        # MEGASCALE env vars).  A plain single-process launch must not
        # try to reach a coordinator.
        import os
        has_cluster_env = any(
            os.environ.get(k) for k in
            ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
             "MEGASCALE_COORDINATOR_ADDRESS"))
        if not has_cluster_env:
            return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def make_study_mesh(devices: Optional[Sequence] = None,
                    n_hosts: Optional[int] = None) -> Mesh:
    """Build the batch-sharding mesh for the data-parallel surfaces.

    Single host (``n_hosts`` in {None on one process, 1}): the familiar
    1-D ``("dp",)`` mesh over all devices.  Multi-host (``n_hosts > 1``,
    defaulting to ``jax.process_count()``): a 2-D ``("dcn", "dp")`` mesh
    of shape ``(n_hosts, chips_per_host)`` whose rows group each host's
    own devices — batch shards over both axes, but any collective that
    XLA can phase per-axis reduces over ICI within the host first and
    crosses DCN once per host, not once per chip.

    ``n_hosts`` may be passed explicitly with CPU/virtual devices to
    exercise the 2-D layout single-process (the tests run a ``(2, 4)``
    mesh on 8 virtual CPU devices; the driver dryrun does the same).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    if n_hosts is None:
        n_hosts = max(int(jax.process_count()), 1)
    if n_hosts <= 1:
        return Mesh(np.array(devices), axis_names=("dp",))
    if n % n_hosts:
        raise ValueError(f"{n} devices do not split over {n_hosts} hosts")
    # Row i = host i's devices: sort by (owning process, local id) so the
    # inner "dp" axis is always intra-host ICI.  With virtual/CPU devices
    # every process_index is 0 and the reshape is a plain row split, which
    # is exactly what the single-process 2-D tests want.
    devices.sort(key=lambda d: (d.process_index, d.id))
    grid = np.array(devices).reshape(n_hosts, n // n_hosts)
    return Mesh(grid, axis_names=("dcn", "dp"))


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding a leading batch axis over ALL mesh axes."""
    return P(tuple(mesh.axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NamedSharding placing a batch-leading array across the whole mesh."""
    return NamedSharding(mesh, batch_spec(mesh))
