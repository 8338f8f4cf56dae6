"""Device-mesh construction and sharding helpers.

The reference has no distributed runtime (SURVEY.md section 2.2): its
"multi-GPU" story is a shell PID queue over independent jobs. Here scaling
is SPMD: one ``jax.sharding.Mesh`` over all chips, batches sharded along
the 'dp' axis, parameters replicated, and XLA GSPMD inserting the
collectives (gradient psum, global BatchNorm statistics, the embedding
all-gather that hardest-negative mining needs). The eval/similarity path
shards the gallery axis the same way (see laff_tpu.parallel.sim_engine).
"""

from __future__ import annotations

from typing import Dict, Optional

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Join a multi-host (DCN) JAX run. No-op when the environment already
    describes a single process. On TPU pods the standard env variables
    (``COORDINATOR_ADDRESS`` etc. or the TPU metadata server) are enough:
    call with no arguments in each host process before building a mesh —
    ``jax.devices()`` then spans every chip in the slice and the same
    shard_map/GSPMD programs run unchanged, with XLA routing in-slice
    collectives over ICI and cross-slice ones over DCN.

    Returns the number of processes in the run."""
    want_init = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    # NB: jax.process_count() would initialise the XLA backend, after which
    # jax.distributed.initialize refuses to run — check the distributed
    # service state instead of the backend
    if want_init and not jax.distributed.is_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count()


def data_parallel_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """Mesh over all addressable-or-global devices. In a multi-host run
    ``jax.devices()`` already lists the global device set, so the same
    mesh spans the pod slice."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def seed_data_mesh(n_seed: int, n_dp: int) -> Mesh:
    """2-D ('seed', 'dp') mesh for fused sweeps with data parallelism
    inside each seed (engine/sweep.py): seed slices stay independent
    (no cross-seed collectives) while each seed's batch shards n_dp-way."""
    devices = jax.devices()[: n_seed * n_dp]
    if len(devices) < n_seed * n_dp:
        raise ValueError(
            f"need {n_seed * n_dp} devices, have {len(jax.devices())}")
    return Mesh(np.asarray(devices).reshape(n_seed, n_dp), ("seed", "dp"))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "dp",
                axis_index: int = 0, from_global: bool = False) -> Dict:
    """Shard every array along its batch axis (``axis_index``; default the
    leading axis — multi-step scan stacks shard axis 1, the per-step batch).

    Single-host: a plain device_put. Multi-host: each process feeds its
    LOCAL slice of the global batch (the feed is per-process) and
    ``jax.make_array_from_process_local_data`` assembles the global
    array — no cross-host data movement. ``from_global=True`` instead
    declares the arrays as identical GLOBAL batches on every process
    (the trainer's feeds are seeded identically per process) and slices
    out this process's rows first; mesh device order is process-major
    (``jax.devices()``), so the slice is contiguous."""
    sharding = NamedSharding(mesh, P(*([None] * axis_index), axis))
    nproc = jax.process_count()
    if nproc > 1:
        pid = jax.process_index()

        def put(x):
            x = np.asarray(x)
            if from_global:
                b = x.shape[axis_index]
                if b % nproc:
                    raise ValueError(
                        f"global batch axis {b} must divide by "
                        f"{nproc} processes")
                per = b // nproc
                idx = [slice(None)] * x.ndim
                idx[axis_index] = slice(pid * per, (pid + 1) * per)
                x = x[tuple(idx)]
            return jax.make_array_from_process_local_data(sharding, x)
    else:
        def put(x):
            return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated over the mesh. Works in
    multi-process runs too (each process must hold the identical full
    array — true for seeded-identical caches and host-built states)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, tree)
