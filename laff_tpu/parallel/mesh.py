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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "dp") -> Dict:
    """Shard every array along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
