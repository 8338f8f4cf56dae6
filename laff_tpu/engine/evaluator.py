"""Inference: embed galleries/queries, similarity matrices, rank metrics.

The TPU-native replacement for the reference predict loop
(``model/model.py:1019-1128``): visual embeddings are computed once and
kept on device; text batches stream through a jitted encode; similarities
are blockwise MXU matmuls with the H-head mean fused in; ranks come from
the device-side counting kernel (laff_tpu.eval) so no full argsort ever
runs on the host for validation.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import weakref

import jax
import jax.numpy as jnp
import numpy as np

from ..data import EvalFeed, Prefetcher
from ..eval import ranks_from_scores_device
from ..eval.metrics import metrics_from_ranks
from ..ops import multi_head_cosine_sim
from ..ops.norms import l2norm
from ..utils import get_logger

logger = get_logger(__name__)


# jitted tower appliers cached per model instance: a fresh Embedder is
# built every validation epoch, and re-jitting the closures there forced
# a full XLA recompile of both towers per epoch (~20 s/epoch through the
# remote tunnel — 4x the actual train time at flagship dims). Variables
# are arguments, so one compiled applier serves every epoch.
_APPLIER_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _appliers(model):
    try:
        return _APPLIER_CACHE[model]
    except KeyError:
        pass

    def _txt(variables, batch):
        return model.apply(variables, batch, method=model.encode_txt)

    def _vis(variables, batch):
        return model.apply(variables, batch, method=model.encode_vis)

    fns = (jax.jit(_txt), jax.jit(_vis))
    try:
        _APPLIER_CACHE[model] = fns
    except TypeError:  # unexpected non-weakrefable model
        pass
    return fns


class Embedder:
    """Jitted tower application with static batch shapes.

    ``prefetch_depth`` (reference num_workers analog) bounds how many
    batches the background featurizer keeps in flight. With ``mesh``, each
    eval batch shards over the mesh's 'dp' axis and GSPMD splits the tower
    across devices (batch size must divide the dp axis)."""

    def __init__(self, model, variables, prefetch_depth: int = 2, mesh=None):
        self.model = model
        self.variables = variables
        self.prefetch_depth = max(1, prefetch_depth)
        self.mesh = mesh
        spec = getattr(model, "spec", None)
        self._txt_bf16 = bool(spec) and spec.txt.compute_dtype == "bfloat16"
        self._vis_bf16 = bool(spec) and spec.vis.compute_dtype == "bfloat16"
        self._txt, self._vis = _appliers(model)

    def _embed(self, fn, feed: EvalFeed, bf16: bool) -> Tuple[jnp.ndarray, List[str]]:
        from ..data import host_cast_bf16

        chunks, ids = [], []
        for item in Prefetcher(iter(feed), depth=self.prefetch_depth):
            data = host_cast_bf16(item["data"]) if bf16 else item["data"]
            if self.mesh is not None:
                from ..parallel import shard_batch

                dev = shard_batch(data, self.mesh)
            else:
                dev = {k: jnp.asarray(v) for k, v in data.items()}
            emb = fn(self.variables, dev)
            chunks.append(emb[: item["valid"]] if item["valid"] < emb.shape[0] else emb)
            ids.extend(item["ids"])
        return jnp.concatenate(chunks, axis=0), ids

    def embed_txt(self, feed: EvalFeed):
        return self._embed(self._txt, feed, self._txt_bf16)

    def embed_vis(self, feed: EvalFeed):
        return self._embed(self._vis, feed, self._vis_bf16)


@jax.jit
def _scores_block(txt_embs: jnp.ndarray, vis_embs: jnp.ndarray) -> jnp.ndarray:
    if txt_embs.ndim == 3:
        return multi_head_cosine_sim(txt_embs, vis_embs)
    t = l2norm(txt_embs)
    v = l2norm(vis_embs)
    return jnp.dot(t, v.T, preferred_element_type=jnp.float32)


@jax.jit
def _hist_scores_block(txt_embs: jnp.ndarray, vis_embs: jnp.ndarray) -> jnp.ndarray:
    """Jaccard ('hist') measure (reference get_txt2vis_matrix with
    measure='hist'); per-head mean for multi-space embeddings."""
    from ..ops import hist_sim

    if txt_embs.ndim == 3:
        sims = jax.vmap(hist_sim, in_axes=(1, 1))(txt_embs, vis_embs)
        return jnp.mean(sims, axis=0)
    return hist_sim(txt_embs, vis_embs)


@jax.jit
def _flat_scores_block(tn: jnp.ndarray, vn: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Pre-normalized flattened embeddings -> mean-of-cosines scores."""
    return jnp.dot(tn, vn.T, preferred_element_type=jnp.float32) / heads


def score_matrix(
    txt_embs: jnp.ndarray,
    vis_embs: jnp.ndarray,
    block: int = 8192,
    measure: str = "cosine",
) -> np.ndarray:
    """Full (T, V) similarity matrix, computed in device blocks over the
    text axis to bound HBM."""
    fn = _hist_scores_block if measure == "hist" else _scores_block
    if measure == "hist":
        block = min(block, 512)  # hist materializes (B, V, D) intermediates
    n = txt_embs.shape[0]
    if n <= block:
        return np.asarray(fn(txt_embs, vis_embs))
    out = np.empty((n, vis_embs.shape[0]), dtype=np.float32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        out[start:stop] = np.asarray(fn(txt_embs[start:stop], vis_embs))
    return out


def t2v_ranks(
    txt_embs: jnp.ndarray,
    vis_embs: jnp.ndarray,
    txt_ids: List[str],
    vis_ids: List[str],
    block: int = 8192,
    measure: str = "cosine",
) -> np.ndarray:
    """1-based ranks of the ground-truth video per caption, computed fully
    on device (scores + counting), never materializing host-side argsorts.

    Embeddings are per-head normalized + flattened ONCE (the H-head mean of
    cosines equals a single flat dot / H), so the gallery is never
    renormalized per text block."""
    from ..ops.pallas_kernels import flatten_heads

    vid_index = {v: i for i, v in enumerate(vis_ids)}
    gt = np.asarray([vid_index[t.split("#")[0]] for t in txt_ids], dtype=np.int32)
    if measure == "hist":
        block = min(block, 512)
        n = txt_embs.shape[0]
        ranks = np.empty((n,), dtype=np.int32)
        for start in range(0, n, block):
            stop = min(start + block, n)
            scores = _hist_scores_block(txt_embs[start:stop], vis_embs)
            ranks[start:stop] = np.asarray(
                ranks_from_scores_device(scores, jnp.asarray(gt[start:stop]))
            )
        return ranks
    heads = txt_embs.shape[1] if txt_embs.ndim == 3 else 1
    tn = flatten_heads(txt_embs)
    vn = flatten_heads(vis_embs)
    n = tn.shape[0]
    ranks = np.empty((n,), dtype=np.int32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        scores = _flat_scores_block(tn[start:stop], vn, heads)
        ranks[start:stop] = np.asarray(
            ranks_from_scores_device(scores, jnp.asarray(gt[start:stop]))
        )
    return ranks


def score_matrix_streaming(
    embedder: Embedder,
    txt_embs: jnp.ndarray,
    vis_feed: EvalFeed,
) -> Tuple[np.ndarray, List[str]]:
    """Gallery-streaming similarity: embed gallery blocks on the fly and
    score them against all queries, never holding the full gallery
    embeddings in HBM (reference ``predict_batch`` for >5e4 galleries,
    model/model.py:1081-1128). Returns host (T, V) scores + vis ids."""
    from ..ops.pallas_kernels import flatten_heads

    heads = txt_embs.shape[1] if txt_embs.ndim == 3 else 1
    tn = flatten_heads(txt_embs)
    blocks = []
    vis_ids: List[str] = []
    for item in Prefetcher(iter(vis_feed), depth=2):
        emb = embedder._vis(
            embedder.variables,
            {k: jnp.asarray(v) for k, v in item["data"].items()},
        )
        emb = emb[: item["valid"]]
        vn = flatten_heads(emb)
        blocks.append(np.asarray(_flat_scores_block(tn, vn, heads)))
        vis_ids.extend(item["ids"])
    return np.concatenate(blocks, axis=1), vis_ids


# galleries above this stream through score_matrix_streaming instead of
# caching embeddings (reference threshold 5e4, model/model.py:1020);
# overridable for testing and small-HBM deployments
LARGE_GALLERY = int(os.environ.get("LAFF_TPU_LARGE_GALLERY", 50_000))


def validate(
    embedder: Embedder,
    txt_feed: EvalFeed,
    vis_feed: EvalFeed,
    txt_ids_all: Optional[List[str]] = None,
    measure: str = "cosine",
) -> Dict[str, float]:
    """Text->video metrics over a validation split. Returns the reference
    metric dict (r1/r5/r10/medr/meanr/mir/mAP)."""
    vis_embs, vis_ids = embedder.embed_vis(vis_feed)
    txt_embs, txt_ids = embedder.embed_txt(txt_feed)
    ranks = t2v_ranks(txt_embs, vis_embs, txt_ids, vis_ids, measure=measure)
    r1, r5, r10, medr, meanr, mir, mAP = metrics_from_ranks(ranks)
    return {
        "r1": r1, "r5": r5, "r10": r10, "medr": medr,
        "meanr": meanr, "mir": mir, "mAP": mAP,
        "ranks": ranks, "txt_ids": txt_ids, "vis_ids": vis_ids,
    }
