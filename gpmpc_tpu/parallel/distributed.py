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

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_multihost", "make_study_mesh", "batch_sharding",
           "batch_spec", "mesh_is_multiprocess", "global_put",
           "tree_global_put"]


def _cluster_env_present() -> bool:
    """True when a recognized multi-process launcher planted cluster info.

    Mirrors the launch modes ``jax.distributed.initialize`` can actually
    autodetect (jax._src.clusters): explicit coordinator env vars, GKE /
    TPU-VM pod env (``TPU_WORKER_HOSTNAMES`` / ``TPU_PROCESS_ADDRESSES``),
    Slurm steps with more than one task, and Open MPI / PMI world sizes
    above one.  GCE TPU pods launched without any of these advertise
    themselves only through the instance metadata server, which cannot be
    sniffed cheaply here — pass ``auto=True`` (or an explicit coordinator
    spec) on such pods.
    """
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "JAX_COORDINATOR_IP", "MEGASCALE_COORDINATOR_ADDRESS",
              "TPU_WORKER_HOSTNAMES", "TPU_PROCESS_ADDRESSES"):
        if os.environ.get(k):
            return True
    for size_key in ("SLURM_NTASKS", "SLURM_NPROCS",
                     "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        try:
            if int(os.environ.get(size_key, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         auto: bool = False,
                         **kwargs) -> bool:
    """Join (or skip) JAX's multi-controller runtime; returns True if the
    distributed runtime was initialized.

    Call once per process, BEFORE first backend use.  Launch modes:

    * bare-metal / manual: pass ``coordinator_address`` ("host:port" of
      process 0), ``num_processes``, and this process's ``process_id``;
    * managed pod with a recognized launcher (GKE TPU env vars, Slurm,
      Open MPI): call with NO arguments — the environment carries
      coordinator/process info and ``jax.distributed.initialize``
      autodetects it;
    * managed pod whose only advertisement is the GCE metadata server
      (plain TPU-VM pods): pass ``auto=True`` to delegate unconditionally
      and let JAX's own cluster detection run;
    * single-process (this environment, and every test/bench here): with
      no arguments and no cluster environment the call is a NO-OP — the
      single-process mesh path needs no coordination.

    The gate exists so library code and examples can call this
    unconditionally: single-host nothing happens, multi-host the same
    line brings the process into the pod.  A plain no-arg call only
    initializes when a launcher is detectable from the environment
    (see :func:`_cluster_env_present`); ``auto=True`` skips the gate.
    """
    if (not auto and coordinator_address is None
            and num_processes in (None, 1)):
        # No explicit cluster spec: autodetect only when a launcher has
        # planted one.  A plain single-process launch must not try to
        # reach a coordinator (it would hang or error).
        if not _cluster_env_present():
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


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by more than one process —
    the case where plain ``jax.device_put`` cannot place host arrays (a
    process can only write its own addressable shards)."""
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def global_put(x, mesh: Mesh, spec: P):
    """Place a host array onto a (possibly multi-process) mesh as a global
    array.

    Every process must call this with the SAME full host copy (the SPMD
    "same program, same inputs" contract); each contributes only the
    shards it can address.  Single-process this is equivalent to
    ``jax.device_put(x, NamedSharding(mesh, spec))``.
    """
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def tree_global_put(tree, mesh: Mesh, spec: P):
    """:func:`global_put` over every array leaf of a pytree (one spec)."""
    return jax.tree.map(lambda a: global_put(a, mesh, spec), tree)


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding a leading batch axis over ALL mesh axes."""
    return P(tuple(mesh.axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NamedSharding placing a batch-leading array across the whole mesh."""
    return NamedSharding(mesh, batch_spec(mesh))
