"""Pallas TPU kernels for the retrieval hot path.

Two observations drive the design:

1. **LAFF-ml similarity is one matmul.** The H-head mean of per-head
   cosines equals (1/H) * dot of the *per-head-normalized, concatenated*
   embeddings: mean_h(t_h/|t_h| . v_h/|v_h|) = (t_cat . v_cat)/H. So the
   multi-head score matrix needs no batched einsum — normalize per head,
   flatten, single (T, HD) x (HD, V) MXU contraction.

2. **Ranking needs no scores in HBM.** The rank of the ground-truth video
   is a count of strictly-greater scores (+ tie correction). A fused
   kernel computes score tiles in VMEM and accumulates per-row counts,
   so the (T, V) matrix never touches HBM: traffic drops from
   O(T*V) to O((T + V) * HD) per pass — the difference between
   bandwidth-bound and compute-bound at MV-test3k scale.

Kernels:
  fused_sim_rank      -- multi-head sim + gt-rank counting, tiled
  fused_gate_attention-- LAFF gate (logits->softmax->weighted sum->+res->l2norm)

Numerics note: matmuls run bf16xbf16->f32 (MXU native). Scores produced in
tiles may differ from a monolithic XLA matmul in the last ulp, so ranks can
shift at near-tie boundaries vs laff_tpu.eval.flat_sim_ranks. In the
single-gallery-block ("wide") kernel the ground-truth score is extracted
from the same score tile, so tie comparison is fully self-consistent; in
the tiled fallback it comes from a separate f32 reduction and the gt column
is excluded from the greater-count (an exact match always ranks 1; other
comparisons carry last-ulp noise). The host/XLA path in laff_tpu.eval
stays the bit-exact parity reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norms import l2norm


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flatten_heads(embs: jnp.ndarray) -> jnp.ndarray:
    """(N, H, d) multi-head embeddings -> per-head-normalized (N, H*d)."""
    if embs.ndim == 2:
        return l2norm(embs)
    n, h, d = embs.shape
    return l2norm(embs, axis=-1).reshape(n, h * d)


# ---------------------------------------------------------------------------
# fused similarity + rank
# ---------------------------------------------------------------------------

def _sim_rank_kernel(nvalid_ref, gt_ref, txt_ref, vis_ref, gts_ref, out_ref, acc_ref):
    """Grid (nt, nv). txt tile (BT, HD), vis tile (BV, HD); accumulate
    greater/tie counts for each text row into out (1, BT) over the nv axis.
    Columns >= nvalid are padding and never counted. Row-vector operands
    are shaped (1, BT) to keep lanes aligned for Mosaic."""
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    scores = jnp.dot(
        txt_ref[:], vis_ref[:].T, preferred_element_type=jnp.float32
    )  # (BT, BV)

    gt_scores = gts_ref[0, :]  # (BT,)
    gt_cols = gt_ref[0, :]  # (BT,) global gt column ids

    bv = scores.shape[1]
    col_base = j * bv
    col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    valid = col_ids < nvalid_ref[0]

    # gts_ref comes from a separate (elementwise f32) reduction whose
    # rounding differs from the MXU tile dot by an ulp, so the gt column
    # could otherwise "beat itself" and push an exact match to rank 2 —
    # exclude it: its self-comparison is definitionally not a beat
    not_gt = col_ids != gt_cols[:, None]
    greater = jnp.sum(
        jnp.logical_and(
            jnp.logical_and(scores > gt_scores[:, None], valid), not_gt
        ).astype(jnp.int32),
        axis=1,
    )
    ties_after = jnp.sum(
        jnp.logical_and(
            jnp.logical_and(
                scores == gt_scores[:, None], col_ids > gt_cols[:, None]
            ),
            valid,
        ).astype(jnp.int32),
        axis=1,
    )
    acc_ref[0, :] += greater + ties_after

    @pl.when(j == nv - 1)
    def _():
        out_ref[0, :] = acc_ref[0, :] + 1


def _sim_rank_kernel_wide(nvalid_ref, gt_ref, txt_ref, vis_ref, out_ref):
    """Single-gallery-block variant: grid (nt,), the whole (Vp, HD) gallery
    stays resident in VMEM (fetched once — the index map is constant, so
    Mosaic skips the copy on every later step). The ground-truth score is
    extracted from the same score tile, so tie comparison is self-consistent
    by construction (same MXU accumulation order)."""
    scores = jnp.dot(
        txt_ref[:], vis_ref[:].T, preferred_element_type=jnp.float32
    )  # (BT, Vp)
    gt_cols = gt_ref[0, :]  # (BT,)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    valid = col_ids < nvalid_ref[0]
    at_gt = col_ids == gt_cols[:, None]
    gt_scores = jnp.sum(jnp.where(at_gt, scores, 0.0), axis=1)  # (BT,)

    greater = jnp.sum(
        jnp.logical_and(scores > gt_scores[:, None], valid).astype(jnp.int32),
        axis=1,
    )
    ties_after = jnp.sum(
        jnp.logical_and(
            jnp.logical_and(
                scores == gt_scores[:, None], col_ids > gt_cols[:, None]
            ),
            valid,
        ).astype(jnp.int32),
        axis=1,
    )
    out_ref[0, :] = greater + ties_after + 1


# galleries whose padded bf16 block fits comfortably in VMEM (~128 MiB on
# v5e) take the single-block path: HBM traffic drops from
# nt * Vp * HD to Tp * HD + Vp * HD — at MV-test3k scale that is
# 5.9 GB -> 0.5 GB, moving the kernel from bandwidth- to MXU-bound.
_WIDE_VMEM_BUDGET = 64 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("block_t", "block_v", "prenormalized", "vmem_budget"),
)
def fused_sim_rank(
    txt: jnp.ndarray,
    vis: jnp.ndarray,
    gt_cols: jnp.ndarray,
    block_t: int = 256,
    block_v: int = 1024,
    prenormalized: bool = False,
    vmem_budget: int = 32 * 1024 * 1024,
) -> jnp.ndarray:
    """1-based ranks of gt_cols for multi-head (or flat) embeddings.

    txt: (T, H, d) or (T, D); vis: (V, H, d) or (V, D); gt_cols: (T,) int32.
    The (T, V) score matrix lives only in VMEM tiles.

    ``prenormalized=True`` skips the per-head l2norm (LAFF attention
    outputs are already unit-norm per head — Attention.py:103 — so the
    production eval path saves a full read+write of both embedding sets).
    """
    if prenormalized:
        tn = txt.reshape(txt.shape[0], -1).astype(jnp.bfloat16)
        vn = vis.reshape(vis.shape[0], -1).astype(jnp.bfloat16)
    else:
        tn = flatten_heads(txt).astype(jnp.bfloat16)
        vn = flatten_heads(vis).astype(jnp.bfloat16)
    t, hd = tn.shape
    v = vn.shape[0]

    # pad to tile multiples; padded gallery rows are zeros (dot = 0); padded
    # text rows are harmless extra work sliced off at the end
    tp = _round_up(t, block_t)
    n_valid = jnp.asarray([v], jnp.int32)

    vp_wide = _round_up(v, 256)
    if vp_wide * hd * 2 <= _WIDE_VMEM_BUDGET:
        tn = jnp.pad(tn, ((0, tp - t), (0, 0)))
        vn_w = jnp.pad(vn, ((0, vp_wide - v), (0, 0)))
        gt = jnp.pad(gt_cols.astype(jnp.int32), (0, tp - t))
        ranks = pl.pallas_call(
            _sim_rank_kernel_wide,
            grid=(tp // block_t,),
            in_specs=[
                pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, block_t), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_t, hd), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vp_wide, hd), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_t), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, tp), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the gallery block alone is ~25 MB at MV-test3k scale; the
                # default scoped-vmem budget (16 MB) forces single-buffering
                vmem_limit_bytes=_WIDE_VMEM_BUDGET + 32 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * tp * vp_wide * hd,
                bytes_accessed=(tp + vp_wide) * hd * 2 + tp * 4,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(n_valid, gt[None, :], tn, vn_w)
        return ranks[0, :t]

    vp = _round_up(v, block_v)
    tn = jnp.pad(tn, ((0, tp - t), (0, 0)))
    vn = jnp.pad(vn, ((0, vp - v), (0, 0)))
    gt = jnp.pad(gt_cols.astype(jnp.int32), (0, tp - t))

    # gt scores, computed with the same dtype path (bf16 x bf16 -> f32)
    gt_rows = vn[gt]  # (Tp, HD)
    gt_scores = jnp.sum(
        tn.astype(jnp.float32) * gt_rows.astype(jnp.float32), axis=1
    )

    grid = (tp // block_t, vp // block_v)
    ranks = pl.pallas_call(
        _sim_rank_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_t), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, hd), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, hd), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, tp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, block_t), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            # text tiles are independent; the gallery axis carries the
            # accumulator and must run sequentially
            dimension_semantics=("parallel", "arbitrary"),
            # double-buffered (block_t + block_v) x HD bf16 blocks sit
            # above the 16 MB default scoped-vmem budget; larger tilings
            # (big-gallery sweeps) raise the budget further
            vmem_limit_bytes=vmem_budget,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * vp * hd,
            bytes_accessed=(tp * hd + (tp // block_t) * vp * hd) * 2 + tp * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(n_valid, gt[None, :], tn, vn, gt_scores[None, :])
    return ranks[0, :t]


# ---------------------------------------------------------------------------
# fused LAFF gate attention
# ---------------------------------------------------------------------------

def _gate_kernel(x_ref, k_ref, b_ref, g_ref, out_ref, *, with_ave, mul):
    """x (BT, L, H, dh), gate kernel (H, dh), bias (H,), residual weight
    (1,); out (BT, H, dh). One batch tile per program."""
    x = x_ref[:].astype(jnp.float32)
    kernel = k_ref[:].astype(jnp.float32)
    bias = b_ref[:]
    raw_global = jnp.mean(x, axis=1)  # (BT, H, dh)

    common = x * raw_global[:, None, :, :] if mul else x
    # gate logits as a VPU reduction (Mosaic cannot lower batched
    # dot_general); L and H are tiny so the MXU has nothing to win here
    logits = jnp.sum(common * kernel[None, None, :, :], axis=-1)  # (BT, L, H)
    logits = logits + bias[None, None, :]
    weights = jax.nn.softmax(logits, axis=1)  # (BT, L, H)
    out = jnp.sum(weights[..., None] * x, axis=1)  # (BT, H, dh)
    if with_ave:
        # residual g * L * mean (reference adds per position then sums)
        out = out + g_ref[0] * raw_global * float(x.shape[1])
    norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True)) + 1e-14
    out_ref[:] = out / norm


@functools.partial(jax.jit, static_argnames=("with_ave", "mul", "block_b"))
def fused_gate_attention(
    x: jnp.ndarray,          # (B, L, H, dh)
    gate_kernel: jnp.ndarray,  # (H, dh)
    gate_bias: jnp.ndarray,    # (H,)
    global_weight: jnp.ndarray | float = 1.0,
    with_ave: bool = True,
    mul: bool = False,
    block_b: int = 512,
) -> jnp.ndarray:
    """Fused multi-head LAFF gate: logits -> softmax over L -> weighted sum
    -> mean residual -> per-head l2norm, one VMEM-resident pass.

    DECISION RECORD (VERDICT r2 item 4): reference/interpret-mode ONLY —
    not wired into FusionTower, measured and retired for TPU.

    * Real TPU Mosaic refuses to lower the kernel at flagship dims
      (L=4, H=8, dh=512, any batch): the (B, L, H) `vector.
      multi_reduction` over the middle dim fails with "Unsupported
      output implicit dimension" (tile layouts want the lane axis to be
      the large trailing dim; H=8 and L=4 are both sub-lane). The CPU
      test parity (tests/test_pallas.py) runs in interpret mode.
    * The flax gate (models/attention.py:MultiHeadGateAttention), fully
      XLA-fused, measures 32.6 us/application at train batch 128,
      1.02 ms at eval batch 2048, 5.7 ms at 8192 on the v5e chip
      (shell/bench_gate.py, scan-amplified single-dispatch timing) —
      bandwidth-bound and a negligible slice of the step either way.
    * A Mosaic-compatible rewrite would need per-L 2-D tiles with
      segment reductions across the head axis; there is no HBM traffic
      for it to save over XLA's fusion, so it cannot win materially.

    Kept as an executable specification of the fused gate semantics and
    for interpret-mode cross-checks of the flax module."""
    b, l, h, dh = x.shape
    bp = _round_up(max(b, 8), min(block_b, _round_up(b, 8)))
    block = min(block_b, bp)
    bp = _round_up(b, block)
    xpad = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0), (0, 0)))
    g = jnp.asarray([global_weight], jnp.float32)

    kernel = functools.partial(_gate_kernel, with_ave=with_ave, mul=mul)
    out = pl.pallas_call(
        kernel,
        grid=(bp // block,),
        in_specs=[
            pl.BlockSpec((block, l, h, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, h, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h, dh), jnp.float32),
        interpret=_interpret(),
    )(xpad, gate_kernel, gate_bias, g)
    return out[:b]
