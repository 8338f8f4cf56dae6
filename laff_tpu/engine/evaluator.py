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
from functools import partial
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


# Device-staged validation batches, keyed by the feed object. Validation
# FEATURES are epoch-invariant (only the params change between epochs),
# yet the plain path re-featurizes and re-uploads them every epoch — at
# MV-test3k val scale that is ~0.25-0.5 GB per epoch of dense bow rows
# riding a bandwidth-starved host link for identical bytes. Feeds that
# set ``feed.stage_on_device = True`` (the trainer/sweep val feeds) get
# their featurized batches uploaded ONCE and replayed from HBM on every
# later pass. Weak-keyed: entries die with their feed (end of the run).
_STAGED_FEEDS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_STAGE_BUDGET_ENV = "LAFF_TPU_EVAL_STAGE_BUDGET"
_STAGE_BUDGET_DEFAULT = 4 * 1024**3  # bytes of HBM per staged feed
# Sentinel for "staged with mesh=None": distinct from a DEAD weakref's
# None so an entry whose mesh was collected can never replay for a
# later mesh=None run (the arrays were placed for the dead mesh).
_NO_MESH = object()


def _device_batches(feed, bf16: bool, prefetch_depth: int, mesh):
    """Yield ``(device_data, ids, valid)`` per batch, staging in HBM when
    the feed opts in and the total fits the byte budget. Replayed batches
    are the exact arrays the first pass computed on (same host cast, same
    shard placement), so metrics are bit-identical to the unstaged path."""
    from ..data import host_cast_bf16

    def upload(data):
        data = host_cast_bf16(data) if bf16 else data
        if mesh is not None:
            from ..parallel import shard_batch

            return shard_batch(data, mesh)
        return {k: jnp.asarray(v) for k, v in data.items()}

    stage = bool(getattr(feed, "stage_on_device", False))
    if stage:
        entry = _STAGED_FEEDS.get(feed)
        # bf16/mesh are fixed per run in practice; restage if they differ.
        # The mesh is compared by LIVE object identity through a weakref —
        # never by id(): a garbage-collected mesh's id can be reused by a
        # new mesh object, which would silently replay batches placed for
        # the dead mesh. A dead weakref (or a different live mesh) simply
        # falls through to restaging, which overwrites the stale entry.
        if (entry is not None and entry["bf16"] == bf16
                and entry["mesh_ref"]() is (_NO_MESH if mesh is None
                                            else mesh)):
            yield from entry["items"]
            return
    budget = int(os.environ.get(_STAGE_BUDGET_ENV, _STAGE_BUDGET_DEFAULT))
    items, staged_bytes = [], 0
    for item in Prefetcher(iter(feed), depth=prefetch_depth):
        dev = upload(item["data"])
        out = (dev, item["ids"], item["valid"])
        if stage and items is not None:
            staged_bytes += sum(
                getattr(v, "nbytes", 0) for v in dev.values())
            if staged_bytes > budget:
                logger.info(
                    "not staging eval feed on device: %d batches exceed "
                    "the %d-byte budget (%s to raise)",
                    len(items) + 1, budget, _STAGE_BUDGET_ENV)
                items = None
            else:
                items.append(out)
        yield out
    if stage and items is not None:
        if mesh is None:
            mesh_ref = lambda: _NO_MESH  # noqa: E731 — see _NO_MESH above
        else:
            try:
                mesh_ref = weakref.ref(mesh)
            except TypeError:  # non-weakrefable mesh: pin it alive instead
                mesh_ref = (lambda m: lambda: m)(mesh)
        try:
            _STAGED_FEEDS[feed] = {
                "bf16": bf16, "mesh_ref": mesh_ref, "items": items}
            logger.info(
                "staged eval feed on device: %d batches, %.1f MB HBM "
                "(replayed on later passes)", len(items), staged_bytes / 2**20)
        except TypeError:  # non-weakrefable feed
            pass


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
        chunks, ids = [], []
        for dev, batch_ids, valid in _device_batches(
                feed, bf16, self.prefetch_depth, self.mesh):
            emb = fn(self.variables, dev)
            chunks.append(emb[:valid] if valid < emb.shape[0] else emb)
            ids.extend(batch_ids)
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


@partial(jax.jit, static_argnames=("heads",))
def _flat_block_ranks(tn: jnp.ndarray, vn: jnp.ndarray, gt: jnp.ndarray,
                      heads: int) -> jnp.ndarray:
    """One dispatch per text block: scores + rank counting fused, so the
    block's (B, V) score matrix never round-trips HBM between two jits
    (and tunneled deployments pay one RTT per block, not two). The /heads
    mean is kept INSIDE the fusion so tie comparisons see exactly the
    same f32 values as the two-dispatch path."""
    scores = jnp.dot(tn, vn.T, preferred_element_type=jnp.float32) / heads
    return ranks_from_scores_device(scores, gt)


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


# HBM budget for one materialized f32 score block (text block x full
# gallery) on the flat XLA rank path. Above it, ranks dispatch to the
# tiled Pallas fused_sim_rank on TPU (the (T, V) scores then live only in
# VMEM tiles — the measured winner at the 1M-gallery design point, 0.935
# MFU vs 0.69-0.76 blockwise XLA, BENCH_LARGE_r03.json); off-TPU (where
# Pallas runs in interpret mode) the text block shrinks instead.
# Override the policy with LAFF_TPU_RANK_PATH=flat|pallas|blockwise.
_FLAT_SCORE_BUDGET = 2 * 1024**3


def _rank_path(t_block: int, v: int, dtype=None) -> str:
    """Pick the device rank path for a (t_block x v) score regime.

    ``dtype`` is the flattened embedding dtype when known: auto mode only
    selects ``pallas`` for bf16 embeddings — ``fused_sim_rank`` casts its
    operands to bf16 internally, so routing an f32 tower there by size
    alone would change reported metrics discontinuously at the budget
    boundary. A forced ``LAFF_TPU_RANK_PATH=pallas`` is still honored
    (explicit opt-in to the bf16 cast)."""
    mode = os.environ.get("LAFF_TPU_RANK_PATH", "auto")
    if mode not in ("auto", "flat", "pallas", "blockwise"):
        raise ValueError(
            f"LAFF_TPU_RANK_PATH={mode!r} is not one of "
            "auto|flat|pallas|blockwise")
    if mode != "auto":
        return mode
    budget = int(os.environ.get("LAFF_TPU_FLAT_SCORE_BUDGET", _FLAT_SCORE_BUDGET))
    if t_block * v * 4 <= budget:
        return "flat"
    if dtype is not None and dtype != jnp.bfloat16:
        return "blockwise"
    return "pallas" if jax.default_backend() == "tpu" else "blockwise"


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
    renormalized per text block.

    Size-based path selection (see :func:`_rank_path`): galleries whose
    f32 score block fits the HBM budget take the flat XLA matmul+counting
    fusion (fastest at MV-test3k scale); beyond it, the tiled Pallas
    ``fused_sim_rank`` keeps score tiles in VMEM (the reference's
    ``predict_batch`` regime, model/model.py:1081-1128, falls back to
    host-side row batches there). Auto mode only routes bf16 embeddings
    to Pallas (bf16 x bf16 -> f32 scores like the production flat path);
    f32 towers beyond the budget take blockwise XLA at full precision.
    Forcing ``LAFF_TPU_RANK_PATH=pallas`` opts f32 inputs into the
    kernel's internal bf16 cast. Exact-duplicate ties keep the identical
    larger-index-first semantics on every path."""
    from ..ops.pallas_kernels import flatten_heads, fused_sim_rank

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
    v = vn.shape[0]
    path = _rank_path(min(block, n), v, dtype=tn.dtype)
    if path == "pallas":
        return np.asarray(
            fused_sim_rank(tn, vn, jnp.asarray(gt), prenormalized=True)
        )
    budget = int(os.environ.get("LAFF_TPU_FLAT_SCORE_BUDGET",
                                 _FLAT_SCORE_BUDGET))
    if path == "flat":
        # grow the text block up to the score budget: one (n, V) block at
        # val/benchmark scale means ONE compiled rank program instead of a
        # full block + a differently-shaped remainder block — each extra
        # shape is a multi-minute XLA compile through tunneled deployments
        # and the val pass is on the per-epoch path (VERDICT r4 item 2)
        block = min(n, max(block, max(256, (budget // (v * 4)) // 256 * 256)))
    if path == "blockwise":
        block = min(block, max(256, (budget // (v * 4)) // 256 * 256))
    ranks = np.empty((n,), dtype=np.int32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        ranks[start:stop] = np.asarray(_flat_block_ranks(
            tn[start:stop], vn, jnp.asarray(gt[start:stop]), heads
        ))
    return ranks


def _embed_block(embedder: Embedder, data: Dict) -> jnp.ndarray:
    """One gallery block through the vis tower, honoring the embedder's
    bf16 host cast and mesh sharding exactly like the cached path."""
    from ..data import host_cast_bf16

    if getattr(embedder, "_vis_bf16", False):
        data = host_cast_bf16(data)
    if getattr(embedder, "mesh", None) is not None:
        from ..parallel import shard_batch

        dev = shard_batch(data, embedder.mesh)
    else:
        dev = {k: jnp.asarray(v) for k, v in data.items()}
    return embedder._vis(embedder.variables, dev)


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
        emb = _embed_block(embedder, item["data"])
        emb = emb[: item["valid"]]
        vn = flatten_heads(emb)
        blocks.append(np.asarray(_flat_scores_block(tn, vn, heads)))
        vis_ids.extend(item["ids"])
    return np.concatenate(blocks, axis=1), vis_ids


# galleries above this stream through score_matrix_streaming instead of
# caching embeddings (reference threshold 5e4, model/model.py:1020);
# overridable for testing and small-HBM deployments
LARGE_GALLERY = int(os.environ.get("LAFF_TPU_LARGE_GALLERY", 50_000))


# ---------------------------------------------------------------------------
# streaming benchmark metrics (large gallery, both axes big)
# ---------------------------------------------------------------------------

@jax.jit
def _gather_gt_scores(S, gt_cols, col_base, gt_scores):
    """Fold this block's ground-truth entries into the running (T,) gt-score
    vector. ``gt_cols`` are GLOBAL gallery columns; entries outside
    [col_base, col_base + B) keep their previous value."""
    local = gt_cols - col_base
    b = S.shape[1]
    hit = (local >= 0) & (local < b)
    # masked row-reduction, not take_along_axis: the per-row one-element
    # gather over a block-sized score matrix runs far below bandwidth
    # (see laff_tpu.eval.flat_sim_ranks); out-of-block rows match no
    # column and sum to 0, then keep their previous value via ``hit``
    col_ids = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    vals = jnp.sum(jnp.where(col_ids == local[:, None], S, 0.0), axis=1)
    return jnp.where(hit, vals, gt_scores)


@jax.jit
def _count_inc(S, gt_scores, gt_cols, col_base):
    """Per-row greater/tie-after increments of this block vs the gt scores
    (same semantics as ranks_from_scores_device, global column ids)."""
    col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, (1, S.shape[1]), 1)
    greater = jnp.sum((S > gt_scores[:, None]).astype(jnp.int32), axis=1)
    tie = jnp.sum(
        ((S == gt_scores[:, None]) & (col_ids > gt_cols[:, None])).astype(jnp.int32),
        axis=1,
    )
    return greater, tie


@partial(jax.jit, donate_argnums=(0,))
def _cache_append(buf, vb, start):
    """Donated in-place append of a gallery block into the HBM cache."""
    return jax.lax.dynamic_update_slice_in_dim(buf, vb, start, 0)


@partial(jax.jit, static_argnums=(4,))
def _topk_merge(run_vals, run_idx, S, col_base, k):
    """Merge this block's columns into the running per-row top-k
    (values, global indices)."""
    b = S.shape[1]
    blk_idx = col_base + jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    cat_vals = jnp.concatenate([run_vals, S], axis=1)
    cat_idx = jnp.concatenate([run_idx, blk_idx], axis=1)
    vals, pos = jax.lax.top_k(cat_vals, k)
    idx = jnp.take_along_axis(cat_idx, pos, axis=1)
    return vals, idx


@jax.jit
def _v2t_block_ranks(S, pos):
    """Ranks of each block video's positive captions among ALL T captions.

    S: (T, B) block scores (caption axis complete), pos: (B, P) int32
    global caption indices, -1 padding. Returns (B, P) 1-based ranks
    (0 where padded), with the host argsort-reversal tie semantics
    (larger caption index wins ties)."""
    svt = S.T  # (B, T)
    cap_ids = jax.lax.broadcasted_iota(jnp.int32, (1, svt.shape[1]), 1)

    def per_slot(p_col):  # p_col: (B,)
        # masked reduction, not take_along_axis (see _gather_gt_scores);
        # padded slots (-1) match no column, and their rank rows are
        # masked to 0 by the caller anyway
        s_p = jnp.sum(
            jnp.where(cap_ids == p_col[:, None], svt, 0.0), axis=1
        )[:, None]
        greater = jnp.sum((svt > s_p).astype(jnp.int32), axis=1)
        tie = jnp.sum(
            ((svt == s_p) & (cap_ids > p_col[:, None])).astype(jnp.int32), axis=1
        )
        return greater + tie + 1

    ranks = jax.lax.map(per_slot, pos.T)  # (P, B), serialized to bound memory
    return jnp.where(pos >= 0, ranks.T, 0)


def streaming_benchmark_eval(
    embedder: Embedder,
    txt_embs: jnp.ndarray,
    txt_ids: List[str],
    vis_feed: EvalFeed,
    topk: int = 500,
) -> Dict:
    """Exact t2v AND v2t benchmark metrics plus a top-k rank dump over a
    gallery too large to cache, never materializing a host (T, V) matrix
    (VERDICT r2 item 6; reference ``predict_batch`` regime,
    model/model.py:1081-1128, materializes host rows — we keep everything
    as device counting like :func:`t2v_ranks`).

    Two streaming passes over ``vis_feed`` (~2x the matmul FLOPs, but the
    1M-gallery design-point matmul is seconds of device time while the
    host (T, V) it avoids would be hundreds of GB):

    * pass 1 computes each (T, B) score block once on device and uses it
      for (a) gathering each caption's ground-truth score — from the SAME
      matmul that pass 2 compares against, so tie semantics stay
      bit-exact — (b) a running top-k merge for the rank dump, and
      (c) v2t positive-caption ranks (the caption axis is complete per
      block);
    * pass 2 recomputes each block and accumulates greater/tie-after
      counts vs the now-complete gt-score vector on device.

    When the flattened gallery embeddings fit an HBM budget
    (``LAFF_TPU_STREAM_GALLERY_BUDGET`` bytes, default 9 GiB — the
    1M x 4096 bf16 design point is 8 GiB), pass 1 additionally writes
    them into a preallocated device buffer (donated in-place updates, no
    2x transient) and pass 2 skips the entire re-embed — it either
    rescores cache slices with the SAME block shapes/program as pass 1
    (bit-identical counting) or, when :func:`_rank_path` selects it,
    hands the whole problem to the tiled Pallas ``fused_sim_rank``
    (bf16-native caches only, so no extra rounding is introduced; the
    kernel's gt handling is self-consistent by construction).

    Returns dict with t2v/v2t metric tuples, t2v ranks, top-k
    (indices, values) and the streamed gallery ids.
    """
    from ..ops.pallas_kernels import flatten_heads, fused_sim_rank

    heads = txt_embs.shape[1] if txt_embs.ndim == 3 else 1
    tn = flatten_heads(txt_embs)
    T = tn.shape[0]

    vis_ids = list(vis_feed.ids)
    vid_index = {v: i for i, v in enumerate(vis_ids)}
    gt_cols_host = np.asarray(
        [vid_index[t.split("#")[0]] for t in txt_ids], dtype=np.int32
    )
    gt_cols = jnp.asarray(gt_cols_host)

    # per-video positive caption lists (v2t ground truth)
    root_to_caps: Dict[str, List[int]] = {}
    for i, tid in enumerate(txt_ids):
        root_to_caps.setdefault(tid.split("#")[0], []).append(i)
    p_max = max(len(v) for v in root_to_caps.values())

    V = len(vis_ids)
    hd = tn.shape[1]
    cache_budget = int(os.environ.get(
        "LAFF_TPU_STREAM_GALLERY_BUDGET", 9 * 1024**3))
    cache = None  # lazily allocated at the first block (dtype then known)
    block_layout: List[Tuple[int, int]] = []

    def blocks():
        nonlocal cache
        col = 0
        for item in Prefetcher(iter(vis_feed), depth=2):
            emb = _embed_block(embedder, item["data"])
            emb = emb[: item["valid"]]
            vn = flatten_heads(emb)
            if col == 0 and V * hd * vn.dtype.itemsize <= cache_budget:
                cache = jnp.zeros((V, hd), vn.dtype)
            if cache is not None:
                cache = _cache_append(cache, vn, col)
                block_layout.append((col, vn.shape[0]))
            S = _flat_scores_block(tn, vn, heads)
            yield col, item, S
            col += item["valid"]

    # ---- pass 1: gt scores + top-k merge + v2t ranks --------------------
    k = min(topk, len(vis_ids)) if topk else 0
    gt_scores = jnp.full((T,), -np.inf, dtype=jnp.float32)
    run_vals = jnp.full((T, k), -np.inf, dtype=jnp.float32) if k else None
    run_idx = jnp.zeros((T, k), dtype=jnp.int32) if k else None
    v2t_rank_lists: List[np.ndarray] = []
    v2t_counts: List[int] = []
    for col, item, S in blocks():
        gt_scores = _gather_gt_scores(S, gt_cols, col, gt_scores)
        if k:
            run_vals, run_idx = _topk_merge(run_vals, run_idx, S, col, k)
        pos = np.full((item["valid"], p_max), -1, dtype=np.int32)
        for b, vid in enumerate(item["ids"]):
            caps = root_to_caps.get(vid, ())
            pos[b, : len(caps)] = caps
        pranks = np.asarray(_v2t_block_ranks(S, jnp.asarray(pos)))
        for b in range(item["valid"]):
            n_pos = int((pos[b] >= 0).sum())
            if n_pos:
                v2t_rank_lists.append(np.sort(pranks[b, :n_pos]))
                v2t_counts.append(n_pos)

    # ---- pass 2: exact t2v counting vs the complete gt vector -----------
    if cache is not None and cache.dtype == jnp.bfloat16 \
            and tn.dtype == jnp.bfloat16 \
            and _rank_path(T, V, dtype=tn.dtype) == "pallas":
        # 1M design point: cached bf16 gallery, score tiles stay in VMEM
        # (the kernel sees the very same bf16 rows AND bf16 text pass 1
        # scored — fused_sim_rank casts text to bf16 internally, so an
        # f32 text tower must take the bit-identical rescore branch below
        # even under a FORCED pallas override: pass 1's v2t ranks, top-k
        # dump, and gt scores already used f32 text, and one result dict
        # must not mix two text roundings)
        t2v_rank_arr = np.asarray(
            fused_sim_rank(tn, cache, gt_cols, prenormalized=True))
    else:
        if cache is not None:
            # no re-embed: rescore cache slices with the SAME program and
            # block shapes as pass 1 -> bit-identical scores and counting
            pass2 = ((col, _flat_scores_block(tn, cache[col:col + width],
                                              heads))
                     for col, width in block_layout)
        else:
            pass2 = ((col, S) for col, item, S in blocks())
        greater = jnp.zeros((T,), dtype=jnp.int32)
        tie = jnp.zeros((T,), dtype=jnp.int32)
        for col, S in pass2:
            g, t = _count_inc(S, gt_scores, gt_cols, col)
            greater = greater + g
            tie = tie + t
        t2v_rank_arr = np.asarray(greater + tie + 1)

    t2v = metrics_from_ranks(t2v_rank_arr)
    v2t = metrics_from_positive_ranks(v2t_rank_lists)
    out = {
        "t2v": t2v,
        "v2t": v2t,
        "t2v_ranks": t2v_rank_arr,
        "vis_ids": vis_ids,
    }
    if k:
        out["topk_idx"] = np.asarray(run_idx)
        out["topk_vals"] = np.asarray(run_vals)
    return out


def int8_streaming_topk(
    embedder: Embedder,
    txt_embs: jnp.ndarray,
    vis_feed: EvalFeed,
    k: int,
    margin_factor: float = 1.5,
    chunk_t: int = 1024,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Top-k retrieval over a gallery held in HBM as int8 — 2x the shots
    per chip vs bf16 — with EXACT final scores via candidate re-embedding.

    One streaming pass embeds gallery blocks and stores only their int8
    quantization (laff_tpu.ops.quantized; 4 GB for 1M x 4096). Candidates
    are nominated per query on the int8 MXU (top ceil(k * margin_factor)),
    then ONLY the union of nominated videos is re-embedded through the
    tower (BigFile random access makes this a tiny second read) and scored
    in full precision; the returned (values, global indices) are exact for
    every item that the int8 cut nominated — measured overlap with the
    dense exact top-1000 at the 1M design point: 1.0000
    (shell/bench_int8_topk.py).

    Returns (scores (T, k) f32 on the mean-of-cosines scale, indices
    (T, k) int32 into the streamed order, vis_ids)."""
    from ..ops.pallas_kernels import flatten_heads
    from ..ops.quantized import int8_scores, quantize_rows

    heads = txt_embs.shape[1] if txt_embs.ndim == 3 else 1
    tn = flatten_heads(txt_embs)
    tq, ts = quantize_rows(tn)

    q_quantize = jax.jit(quantize_rows)
    # preallocate the int8 gallery and write blocks in place (donated
    # buffers): concatenating per-block arrays at the end would briefly
    # hold blocks + copy = 2x the int8 bytes, eroding exactly the HBM
    # capacity headroom this path exists to provide
    append = jax.jit(
        lambda buf, sbuf, q, s, start: (
            jax.lax.dynamic_update_slice_in_dim(buf, q, start, 0),
            jax.lax.dynamic_update_slice_in_dim(sbuf, s, start, 0),
        ),
        donate_argnums=(0, 1),
    )
    vq = vs = None
    pos = 0
    vis_ids: List[str] = []
    for item in Prefetcher(iter(vis_feed), depth=2):
        emb = _embed_block(embedder, item["data"])[: item["valid"]]
        vn = flatten_heads(emb)
        q, s = q_quantize(vn)
        if vq is None:
            vq = jnp.zeros((len(vis_feed), q.shape[1]), jnp.int8)
            vs = jnp.zeros((len(vis_feed),), jnp.float32)
        vq, vs = append(vq, vs, q, s, pos)
        pos += int(item["valid"])
        vis_ids.extend(item["ids"])

    v = vq.shape[0]
    k = min(k, v)
    c = min(int(np.ceil(k * margin_factor)), v)

    @jax.jit
    def nominate(tq_blk, ts_blk, vq, vs):
        return jax.lax.top_k(int8_scores(tq_blk, ts_blk, vq, vs), c)[1]

    t = tq.shape[0]
    cand = np.empty((t, c), np.int32)
    for start in range(0, t, chunk_t):
        stop = min(start + chunk_t, t)
        cand[start:stop] = np.asarray(
            nominate(tq[start:stop], ts[start:stop], vq, vs)
        )

    union = np.unique(cand)
    refeed = EvalFeed(
        [vis_ids[i] for i in union], vis_feed.batcher,
        batch_size=vis_feed.batch_size,
    )
    cand_embs, _ = embedder.embed_vis(refeed)
    cn = flatten_heads(cand_embs)

    vals = np.empty((t, k), np.float32)
    idx = np.empty((t, k), np.int32)
    union_j = jnp.asarray(union.astype(np.int32))

    @jax.jit
    def exact_topk(tn_blk, cn, union_j):
        exact = _flat_scores_block(tn_blk, cn, heads)
        tv, tp = jax.lax.top_k(exact, min(k, cn.shape[0]))
        return tv, union_j[tp]

    for start in range(0, t, chunk_t):
        stop = min(start + chunk_t, t)
        bv, bi = exact_topk(tn[start:stop], cn, union_j)
        vals[start:stop] = np.asarray(bv)
        idx[start:stop] = np.asarray(bi)
    return vals, idx, vis_ids


def metrics_from_positive_ranks(rank_lists: List[np.ndarray]):
    """(r1, r5, r10, medr, meanr, mir, mAP) from per-query sorted positive
    ranks — the multi-positive analog of eval_label_matrix (reference
    ``evaluation.py:92-109``): positions == sorted ranks of the positives."""
    n = len(rank_lists)
    firsts = np.empty(n)
    aps = np.empty(n)
    for i, pos in enumerate(rank_lists):
        firsts[i] = pos[0]
        aps[i] = np.mean([(j + 1.0) / pos[j] for j in range(len(pos))])
    r1, r5, r10 = [100.0 * np.mean(firsts <= kk) for kk in (1, 5, 10)]
    return (
        r1, r5, r10,
        float(np.floor(np.median(firsts))),
        float(firsts.mean()),
        float((1.0 / firsts).mean()),
        float(aps.mean()),
    )


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
