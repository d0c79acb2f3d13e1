"""Multi-host distribution layer: process-group init + global array placement.

The reference has no distributed capability at all (SURVEY.md §2.4 — a
single-machine ROS system); this layer is the framework's new capability
axis. Design (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert the collectives):

* **Odometry stays host-local.** The scan-to-scan fast path is
  latency-critical (<50 ms budget) — it never crosses DCN. Each host runs
  the fused odometry chunk on its own chips.
* **Mapping and window BA shard over the GLOBAL mesh.** The local submap's
  capacity axis and the BA point budget are the natural data axes; per
  outer iteration the only cross-host traffic is one `all_gather` of (Q, k)
  candidate distances+coords (mapping, ≈1 MB) or one `psum` of the 6K×6K
  window system (BA, ≈14 KB) — both far under a DCN frame budget.
* Collectives ride ICI within a slice and DCN across hosts automatically —
  the mesh orders devices so consecutive mesh positions are intra-host.

``initialize`` wraps ``jax.distributed.initialize`` (coordinator handshake;
on CPU test fleets each process contributes ``jax_num_cpu_devices`` virtual
devices). ``host_local`` converts per-process numpy shards into a global
``jax.Array`` — the only placement API the sharded stages need on top of
single-process ``device_put``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    *,
    cpu_devices_per_process: int | None = None,
) -> None:
    """Join the process group. Call before any other JAX operation.

    cpu_devices_per_process: for multi-process CPU testing (each process
    brings N virtual CPU devices — the multi-host simulation recommended by
    SURVEY.md §4); on real TPU hosts leave None (devices are discovered).
    """
    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over every device in the job (all hosts). jax.devices()
    orders devices process-major, so a shard_map collective ring crosses
    DCN only at process boundaries."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local(mesh: Mesh, spec: P, local: np.ndarray) -> jax.Array:
    """Assemble a global array from this process's shard.

    ``local`` is the slice this host owns along the sharded axes (for a
    replicated spec, every host passes identical data). The result is a
    global ``jax.Array`` usable as a shard_map/pjit input across hosts.
    """
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local)
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree of host-identical arrays onto the global mesh."""
    return jax.tree.map(
        lambda x: host_local(mesh, P(), np.asarray(x)), tree
    )


def shard_batch(mesh: Mesh, tree, axis: int = 0):
    """Shard a pytree of FULL (host-identical) arrays along ``axis`` over the
    global mesh: each process carves out its own slice and contributes it.
    Convenience for tests/benchmarks where every host holds the full input.
    """
    n = mesh.devices.size
    pidx = jax.process_index()
    nproc = jax.process_count()

    def place(x):
        x = np.asarray(x)
        assert x.shape[axis] % n == 0, (x.shape, n)
        per_proc = x.shape[axis] // nproc
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(pidx * per_proc, (pidx + 1) * per_proc)
        spec = P(*([None] * axis + [DATA_AXIS]))
        return host_local(mesh, spec, x[tuple(sl)])

    return jax.tree.map(place, tree)
