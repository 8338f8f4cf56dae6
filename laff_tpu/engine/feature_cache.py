"""Device-resident visual feature cache.

The training set's video features are static across epochs, yet the
reference-style feed re-reads and re-transfers them for every batch —
on bandwidth-starved host links (tunnels, loaded PCIe, DCN-fed hosts)
that transfer IS the training bottleneck. TPU-native fix: upload every
train video's features to HBM once; batches then carry only (B,) int32
row indices and the jitted train step gathers rows device-side.

At LAFF scale the whole cache is small (MSR-VTT 10k train videos x
5,376 dims f32 = 215 MB; half in bf16), far under a v5e's 16 GB HBM.
Frame-level features cache as the same globally-padded (V, max_frame, D)
arrays (+ masks) the feed produces per batch, so gathered batches are
bit-identical to fed batches.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from ..data import host_cast_bf16
from ..utils import get_logger

logger = get_logger(__name__)


class DeviceVisCache:
    """All train video features resident on device; lookup by vis_id.

    With a mesh the cache is replicated across it (a few hundred MB at
    LAFF scale) and the per-batch row indices shard over dp like the rest
    of the batch, so the device-side gather yields dp-sharded features."""

    def __init__(self, vis_batcher, bf16: bool = False, chunk: int = 512,
                 mesh=None):
        source = vis_batcher.source
        vids = list(source.vis_ids)
        self.row = {v: i for i, v in enumerate(vids)}
        parts = []
        for s in range(0, len(vids), chunk):
            parts.append(vis_batcher(vids[s : s + chunk]))
        names = list(parts[0].keys())
        arrays = {n: np.concatenate([p[n] for p in parts]) for n in names}
        if bf16:
            arrays = host_cast_bf16(arrays)
        if mesh is not None:
            from ..parallel import replicate

            self.arrays: Dict[str, jnp.ndarray] = replicate(arrays, mesh)
        else:
            self.arrays = {n: jnp.asarray(a) for n, a in arrays.items()}
        self.nbytes = sum(
            int(a.size) * a.dtype.itemsize for a in self.arrays.values()
        )
        logger.info(
            "device feature cache: %d videos, %d arrays, %.1f MB in HBM",
            len(vids), len(self.arrays), self.nbytes / 1e6,
        )

    def indices(self, vis_ids: Sequence[str]) -> np.ndarray:
        return np.fromiter(
            (self.row[v] for v in vis_ids), np.int32, count=len(vis_ids)
        )
