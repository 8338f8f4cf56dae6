"""Sharded similarity engine: gallery-parallel ranking and top-k retrieval.

For AVS-scale galleries (v3c1 ~1M shots) one chip's HBM can't hold the
score matrix and shouldn't: shard the *gallery* axis across the mesh.
Queries are replicated (they're small); every device scores its gallery
shard; the two reductions the evaluation needs are cheap collectives:

* **rank-of-gt** — a sum of per-shard greater/tie counts (psum over ICI),
* **top-k**      — per-shard ``lax.top_k`` then a k*n_devices all-gather and
  a final top-k merge (k << V, so the collective moves k rows, not V).

Everything runs under ``shard_map`` with explicit PartitionSpecs, so the
same code executes on one chip (trivial mesh) or a pod slice.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas_kernels import flatten_heads


def _pad_gallery(vis: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, int]:
    v = vis.shape[0]
    vp = ((v + n - 1) // n) * n
    if vp != v:
        vis = jnp.pad(vis, ((0, vp - v),) + ((0, 0),) * (vis.ndim - 1))
    return vis, vp


def sharded_t2v_ranks(
    txt: jnp.ndarray,
    vis: jnp.ndarray,
    gt_cols: jnp.ndarray,
    mesh: Mesh,
    axis: str = "dp",
) -> np.ndarray:
    """1-based gt ranks with the gallery sharded over ``axis``.

    txt: (T, H, d) or (T, D) replicated; vis: (V, ...) sharded by rows.
    Exact tie semantics (greater + larger-index ties) preserved across
    shards because column ids are globally indexed.
    """
    n = mesh.shape[axis]
    tn = flatten_heads(txt)
    vn = flatten_heads(vis)
    v_real = vn.shape[0]
    vn, vp = _pad_gallery(vn, n)
    shard = vp // n

    def local_counts(tn, vn_local, gt_cols):
        # vn_local: (V/n, HD)
        idx = jax.lax.axis_index(axis)
        col0 = idx * shard
        scores = jnp.dot(tn, vn_local.T, preferred_element_type=jnp.float32)

        # gt score taken FROM the shard that owns the gt column (the same
        # matmul whose entries we compare against), then psum'd — keeps
        # tie comparisons self-consistent across accumulation orders.
        # Masked row-reduction, not take_along_axis: the per-row gather
        # over an HBM score block costs ~6 ms at MV-test3k scale
        # (laff_tpu.eval.flat_sim_ranks measurement); non-owner shards
        # contribute exactly 0 to the psum
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        at_gt = col_ids == gt_cols[:, None]
        gt_scores = jax.lax.psum(
            jnp.sum(jnp.where(at_gt, scores, 0.0), axis=1), axis
        )
        valid = col_ids < v_real
        greater = jnp.sum(
            jnp.logical_and(scores > gt_scores[:, None], valid).astype(jnp.int32),
            axis=1,
        )
        ties = jnp.sum(
            jnp.logical_and(
                jnp.logical_and(scores == gt_scores[:, None],
                                col_ids > gt_cols[:, None]),
                valid,
            ).astype(jnp.int32),
            axis=1,
        )
        return jax.lax.psum(greater + ties, axis)

    fn = jax.shard_map(
        local_counts,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
    )
    counts = jax.jit(fn)(tn, vn, gt_cols.astype(jnp.int32))
    return np.asarray(counts) + 1


def sharded_topk(
    txt: jnp.ndarray,
    vis: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "dp",
) -> Tuple[np.ndarray, np.ndarray]:
    """Global top-k gallery items per query with the gallery sharded.

    Returns (scores (T, k), indices (T, k)) in descending order; moves only
    k rows per device over the interconnect instead of the full shard.
    """
    n = mesh.shape[axis]
    tn = flatten_heads(txt)
    vn = flatten_heads(vis)
    v_real = vn.shape[0]
    vn, vp = _pad_gallery(vn, n)
    shard = vp // n
    k_local = min(k, shard)

    def local_topk(tn, vn_local):
        idx = jax.lax.axis_index(axis)
        col0 = idx * shard
        scores = jnp.dot(tn, vn_local.T, preferred_element_type=jnp.float32)
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col_ids < v_real, scores, -jnp.inf)
        vals, local_idx = jax.lax.top_k(scores, k_local)
        gidx = local_idx + col0
        # gather candidates from all shards: (T, k_local*n)
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        fvals, fpos = jax.lax.top_k(all_vals, min(k, k_local * n))
        fidx = jnp.take_along_axis(all_idx, fpos, axis=1)
        return fvals, fidx

    fn = jax.shard_map(
        local_topk, mesh=mesh, in_specs=(P(), P(axis)), out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by construction (all_gather)
    )
    vals, idx = jax.jit(fn)(tn, vn)
    return np.asarray(vals), np.asarray(idx)


def sharded_int8_topk(
    txt: jnp.ndarray,
    vis_q: jnp.ndarray,
    vis_scale: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "dp",
) -> Tuple[np.ndarray, np.ndarray]:
    """Global top-k nomination over an int8 gallery sharded by rows:
    2x the shots per chip (vs bf16) x n_devices chips.

    txt: (T, H, d) or (T, D) full-precision, replicated (quantized here);
    vis_q: (V, H*d) int8 rows, sharded over ``axis``; vis_scale: (V,) f32
    per-row scales, sharded alike (both from ``ops.quantized.quantize_rows``
    on the flattened-head embeddings). Per shard the int8 MXU scores its
    rows, takes a local top-k, and only k rows per device ride the
    interconnect (all_gather + merge), exactly like ``sharded_topk``.

    Returned scores are int8-approximate (~1e-2 on unit-norm cosines) —
    the serving flow re-embeds the returned candidates for exact scores
    (``engine.evaluator.int8_streaming_topk`` single-chip analog). The
    reference has no quantized or distributed path (its gallery scaling
    is host batching, ``model/model.py:1081-1128``)."""
    from ..ops.quantized import int8_scores, quantize_rows

    n = mesh.shape[axis]
    tn = flatten_heads(txt)
    v_real = vis_q.shape[0]
    vis_q, vp = _pad_gallery(vis_q, n)
    vis_scale = jnp.pad(vis_scale, (0, vp - v_real))
    shard = vp // n
    k_local = min(k, shard)

    def local_topk(tq, ts, vq_local, vs_local):
        idx = jax.lax.axis_index(axis)
        col0 = idx * shard
        scores = int8_scores(tq, ts, vq_local, vs_local)
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col_ids < v_real, scores, -jnp.inf)
        vals, local_idx = jax.lax.top_k(scores, k_local)
        gidx = local_idx + col0
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        fvals, fpos = jax.lax.top_k(all_vals, min(k, k_local * n))
        fidx = jnp.take_along_axis(all_idx, fpos, axis=1)
        return fvals, fidx

    fn = jax.shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)), out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by construction (all_gather)
    )
    tq, ts = quantize_rows(tn)
    vals, idx = jax.jit(fn)(tq, ts, vis_q, vis_scale)
    return np.asarray(vals), np.asarray(idx)
