"""Rank-based retrieval metrics: R@1/5/10, MedR, MeanR, MIR, mAP.

Two paths:

* **Host / parity path** — byte-exact reproduction of the reference metric
  semantics (reference ``evaluation.py:64-109`` + label-matrix construction
  in ``trainer.py:590-594``), including the argsort tie-breaking quirk:
  descending order comes from *reversing a stable ascending argsort*, so
  among tied scores the larger column index ranks first, and ``eval``'s
  MedR is ``floor(median)`` WITHOUT +1 while ``eval_qry2retro`` adds +1.

* **Device path** — ``ranks_from_scores_device`` computes the rank of the
  ground-truth column by *counting* strictly-greater scores plus the exact
  tie-correction, entirely on the TPU: one elementwise pass instead of an
  O(G log G) host argsort, and it fuses with the similarity matmul under
  jit. Produces identical ranks to the host path.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host / parity path
# ---------------------------------------------------------------------------

def label_matrix_from_scores(
    scores: np.ndarray, query_ids: Sequence[str], gallery_ids: Sequence[str]
) -> np.ndarray:
    """Reference label-matrix construction (``trainer.py:584-594``):
    sort each row descending (reversed stable ascending argsort), mark the
    positions whose gallery id equals ``query_id.split('#')[0]``."""
    scores = np.asarray(scores)
    inds = np.argsort(scores, axis=1)
    gallery_ids = np.asarray(gallery_ids)
    label_matrix = np.zeros(scores.shape, dtype=np.int32)
    for i, qid in enumerate(query_ids):
        ind = inds[i][::-1]
        gt = qid.split("#")[0]
        label_matrix[i][np.where(gallery_ids[ind] == gt)[0]] = 1
    return label_matrix


def eval_label_matrix(label_matrix: np.ndarray):
    """(r1, r5, r10, medr, meanr, mir, mAP) from a 0/1 label matrix whose
    columns are already in ranked order (reference ``evaluation.py:92-109``)."""
    label_matrix = np.asarray(label_matrix).astype(int)
    n = label_matrix.shape[0]
    ranks = np.zeros(n)
    aps = np.zeros(n)
    for i in range(n):
        positions = np.where(label_matrix[i] == 1)[0] + 1
        ranks[i] = positions[0]
        aps[i] = np.mean([(k + 1.0) / positions[k] for k in range(len(positions))])

    r1, r5, r10 = [100.0 * np.mean(ranks <= k) for k in (1, 5, 10)]
    medr = np.floor(np.median(ranks))
    meanr = ranks.mean()
    mir = (1.0 / ranks).mean()
    return (r1, r5, r10, medr, meanr, mir, aps.mean())


def eval_qry2retro(qry2retro_sim: np.ndarray, n_qry: int = 1):
    """Legacy block-diagonal protocol (reference ``evaluation.py:64-89``):
    query row i matches gallery column i // n_qry. Note MedR/MeanR are +1
    here, unlike ``eval_label_matrix``."""
    sim = np.asarray(qry2retro_sim)
    assert sim.shape[0] / sim.shape[1] == n_qry, sim.shape
    inds = np.argsort(sim, axis=1)
    ranks = np.zeros(sim.shape[0])
    for i in range(sim.shape[0]):
        ind = inds[i][::-1]
        ranks[i] = np.where(ind == i // n_qry)[0][0]

    r1 = 100.0 * np.mean(ranks < 1)
    r5 = 100.0 * np.mean(ranks < 5)
    r10 = 100.0 * np.mean(ranks < 10)
    medr = np.floor(np.median(ranks)) + 1
    meanr = ranks.mean() + 1
    mir = (1.0 / (ranks + 1)).mean()
    return (r1, r5, r10, medr, meanr, mir)


def eval_t2v(
    scores: np.ndarray, txt_ids: Sequence[str], vis_ids: Sequence[str]
):
    """Text->video metrics straight from a score matrix, matching the
    reference validate() pipeline (label matrix -> eval)."""
    label_matrix = label_matrix_from_scores(scores, txt_ids, vis_ids)
    return eval_label_matrix(label_matrix)


def eval_v2t(
    scores: np.ndarray, txt_ids: Sequence[str], vis_ids: Sequence[str]
):
    """Video->text: transpose, queries become videos; a caption is relevant
    when its ``cap_id.split('#')[0]`` equals the video id (reference
    ``predictor.py:261-276``)."""
    t_scores = np.asarray(scores).T
    inds = np.argsort(t_scores, axis=1)
    txt_roots = np.asarray([t.split("#")[0] for t in txt_ids])
    label_matrix = np.zeros(t_scores.shape, dtype=np.int32)
    for i, vid in enumerate(vis_ids):
        ind = inds[i][::-1]
        label_matrix[i][np.where(txt_roots[ind] == vid)[0]] = 1
    return eval_label_matrix(label_matrix)


# ---------------------------------------------------------------------------
# device path
# ---------------------------------------------------------------------------

@jax.jit
def ranks_from_scores_device(scores: jnp.ndarray, gt_cols: jnp.ndarray) -> jnp.ndarray:
    """1-based rank of ``gt_cols[q]`` in row q under descending order with
    larger-index-first tie breaking — bit-identical to the host argsort
    path, computed as two masked row-reductions on the VPU.

    scores: (Q, G) float32, gt_cols: (Q,) int32 -> (Q,) int32 ranks.
    """
    q = scores.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # masked row-reduction, not take_along_axis: the per-row one-element
    # gather costs ~6 ms over an HBM-sized score block (see flat_sim_ranks)
    at_gt = col_ids == gt_cols[:, None]
    gt_scores = jnp.sum(jnp.where(at_gt, scores, 0.0), axis=1)[:, None]
    greater = jnp.sum((scores > gt_scores).astype(jnp.int32), axis=1)
    tie_after = jnp.sum(
        ((scores == gt_scores) & (col_ids > gt_cols[:, None])).astype(jnp.int32),
        axis=1,
    )
    return greater + tie_after + 1


@functools.partial(jax.jit, static_argnames=("prenormalized",))
def flat_sim_ranks(
    txt: jnp.ndarray,
    vis: jnp.ndarray,
    gt_cols: jnp.ndarray,
    prenormalized: bool = False,
) -> jnp.ndarray:
    """1-based gt ranks for multi-head (or flat) embeddings via a single
    flat bf16 MXU matmul + fused counting.

    Fastest single-chip path whenever the (T, V) f32 score block fits in
    HBM: XLA's matmul pipelining runs at the MXU roofline (measured ~2x
    the tiled Pallas fused_sim_rank end to end at MV-test3k scale, whose
    per-text-tile gallery refetch costs ~10 ms extra), and the counting
    fuses into two passes over the scores. The ground-truth score is
    gathered from the same score matrix, so tie comparison is
    self-consistent with the counted scores. For galleries too large to
    materialize a score block, use fused_sim_rank (scores stay in VMEM)
    or the streaming evaluator.

    Numerics: bf16 x bf16 -> f32 scores, like fused_sim_rank; ranks can
    differ from the f32 host path at near-tie boundaries (last-ulp).
    """
    from ..ops.pallas_kernels import flatten_heads

    if prenormalized:
        tn = txt.reshape(txt.shape[0], -1)
        vn = vis.reshape(vis.shape[0], -1)
    else:
        tn = flatten_heads(txt)
        vn = flatten_heads(vis)
    scores = jnp.dot(
        tn.astype(jnp.bfloat16), vn.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )  # (T, V)
    gt_cols = gt_cols.astype(jnp.int32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # gt score via a masked row-reduction, NOT take_along_axis: the
    # one-element-per-row gather over the HBM score block costs ~6 ms at
    # MV-test3k scale on a v5e, the fused where+sum pass ~0.9 ms
    # (bit-identical ranks, measured 70.2 -> 63.8 ms wall in-process)
    at_gt = col_ids == gt_cols[:, None]
    gt_scores = jnp.sum(jnp.where(at_gt, scores, 0.0), axis=1)[:, None]
    beats = jnp.logical_or(
        scores > gt_scores,
        jnp.logical_and(scores == gt_scores, col_ids > gt_cols[:, None]),
    )
    return 1 + jnp.sum(beats, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_t", "prenormalized"))
def blockwise_flat_ranks(
    txt: jnp.ndarray,
    vis: jnp.ndarray,
    gt_cols: jnp.ndarray,
    block_t: int = 256,
    prenormalized: bool = False,
) -> jnp.ndarray:
    """``flat_sim_ranks`` for galleries too large to materialize the full
    (T, V) score block: lax.map over text blocks, each block's
    (block_t, V) scores live only transiently (reference ``predict_batch``
    regime, model/model.py:1081-1128). T must divide by block_t (pad the
    text side; extra rows rank against the same gallery and are sliced
    off by the caller)."""
    from ..ops.pallas_kernels import flatten_heads

    if prenormalized:
        tn = txt.reshape(txt.shape[0], -1)
        vn = vis.reshape(vis.shape[0], -1)
    else:
        tn = flatten_heads(txt)
        vn = flatten_heads(vis)
    tn = tn.astype(jnp.bfloat16)
    vn = vn.astype(jnp.bfloat16)
    gt_cols = gt_cols.astype(jnp.int32)

    def body(i):
        tb = jax.lax.dynamic_slice_in_dim(tn, i * block_t, block_t)
        gtb = jax.lax.dynamic_slice_in_dim(gt_cols, i * block_t, block_t)
        # contract on dim 1 of BOTH operands (== tb @ vn.T) — an explicit
        # .T on a multi-GB gallery can materialize a full transposed copy
        scores = jax.lax.dot_general(
            tb, vn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        # masked row-reduction, not take_along_axis (see flat_sim_ranks)
        at_gt = col_ids == gtb[:, None]
        gt_scores = jnp.sum(jnp.where(at_gt, scores, 0.0), axis=1)[:, None]
        beats = jnp.logical_or(
            scores > gt_scores,
            jnp.logical_and(scores == gt_scores, col_ids > gtb[:, None]),
        )
        return 1 + jnp.sum(beats, axis=1, dtype=jnp.int32)

    nt = tn.shape[0] // block_t
    return jax.lax.map(body, jnp.arange(nt)).reshape(-1)


@functools.partial(jax.jit, static_argnames=("k", "block_v"))
def topk_two_stage(scores: jnp.ndarray, k: int, block_v: int = 16384):
    """Hierarchical top-k over a huge gallery axis: per-block top-k, then a
    final merge — one monolithic lax.top_k across ~1M columns does not
    compile in reasonable time on TPU (measured: >15 min vs well under a
    second two-stage). Returns (values, global indices), descending.
    Ragged tails are padded with -inf (k must fit one block)."""
    t, v = scores.shape
    block_v = min(block_v, v)
    nb = -(-v // block_v)
    pad = nb * block_v - v
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    s = scores.reshape(t, nb, block_v)
    vals, idx = jax.lax.top_k(s, k)  # (t, nb, k)
    base = (jnp.arange(nb, dtype=jnp.int32) * block_v)[None, :, None]
    flat_vals = vals.reshape(t, nb * k)
    flat_idx = (idx.astype(jnp.int32) + base).reshape(t, nb * k)
    out_vals, sel = jax.lax.top_k(flat_vals, k)
    return out_vals, jnp.take_along_axis(flat_idx, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("kk", "k"))
def _approx_refine_topk(scores: jnp.ndarray, kk: int, k: int):
    """approx_max_k candidate sweep (TPU-native PartialReduce) + exact
    top-k over the candidates + a strict-greater count against the
    selected floor for host-side exactness verification."""
    v, i = jax.lax.approx_max_k(scores, kk, recall_target=0.99)
    vv, sel = jax.lax.top_k(v, k)
    ii = jnp.take_along_axis(i, sel, axis=1)
    n_greater = jnp.sum(scores > vv[:, -1:], axis=1, dtype=jnp.int32)
    return vv, ii, n_greater


def topk_wide(scores: jnp.ndarray, k: int, max_doublings: int = 6):
    """Value-exact top-k via TPU's native ``approx_max_k`` + verification.

    Sweep 2k candidates approximately, exact-top-k the candidates, then
    VERIFY with one counting pass (strictly-greater scores than the
    selected floor must number < k); on a miss, double the candidate
    width and retry. Value-exact by construction; index order among exact
    score ties is arbitrary.

    NOTE (measured at 128 x 1M, k=1000 on v5e): plain ``lax.top_k`` is
    ~3.5x FASTER (0.22 s vs 0.78 s) and order-deterministic — use it by
    default. An apparent top_k "compile hang" at this shape was actually
    a closed-over 8.6 GB gallery lowering as compile-time constants; pass
    big arrays as jit arguments. This path remains for galleries where
    the monolithic sort's HBM footprint becomes the binding constraint."""
    t, v = scores.shape
    k = min(k, v)
    m = 2
    for _ in range(max_doublings):
        kk = min(k * m, v)
        vv, ii, n_greater = _approx_refine_topk(scores, kk, k)
        if int(jnp.max(n_greater)) <= k - 1:
            return vv, ii
        m *= 2
    return jax.lax.top_k(scores, k)  # give up: exact monolithic sort


def metrics_from_ranks(ranks: np.ndarray):
    """(r1, r5, r10, medr, meanr, mir, mAP) for the single-positive case
    (mAP == MIR when each query has exactly one relevant item)."""
    ranks = np.asarray(ranks, dtype=np.float64)
    r1, r5, r10 = [100.0 * np.mean(ranks <= k) for k in (1, 5, 10)]
    medr = np.floor(np.median(ranks))
    meanr = ranks.mean()
    mir = (1.0 / ranks).mean()
    return (r1, r5, r10, medr, meanr, mir, mir)
