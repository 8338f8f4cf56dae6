"""int8 quantized similarity ranking for at-scale galleries.

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 FLOP rate
(measured on this chip: 227.6 TOPS vs 140 TFLOPS at the
8192 x 262144 x 4096 ranking shape, 1.63x wall speedup), and an int8
gallery is 2x smaller than bf16 — doubling the shots one chip's HBM can
rank. The reference has no quantized path (its hot loop is f32 torch.mm,
``model/model.py:1056-1076``); this is a deployment-scale extension.

Scheme: symmetric per-row absmax int8 (scale = absmax / 127). For
unit-norm fusion-head embeddings the per-element quantization noise is
~1/(127*sqrt(D)) relative, so approximate cosines are within ~1e-2 —
plenty to nominate candidates. Exactness is recovered by re-scoring the
top (k + margin) int8 candidates with the full-precision rows and taking
the final top-k from those: ``int8_topk(..., rescore_embs=...)`` returns
bit-identical *scores* to the dense path for every returned item, and
recovers the exact top-k whenever no true top-k item falls below the
(k + margin) int8 cut (empirically margin >= k/2 is conservative; the
recall test in tests/test_quantized.py measures it).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8: returns (q (N, D) int8, scale (N,) f32)
    with x ~= q * scale[:, None]."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


_DN = (((1,), (1,)), ((), ()))


@jax.jit
def int8_scores(
    tq: jnp.ndarray, t_scale: jnp.ndarray,
    vq: jnp.ndarray, v_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Approximate (T, V) scores: int8 MXU contraction + rank-1 rescale."""
    s32 = jax.lax.dot_general(tq, vq, _DN, preferred_element_type=jnp.int32)
    return s32.astype(jnp.float32) * t_scale[:, None] * v_scale[None, :]


@partial(jax.jit, static_argnames=("k", "block_t"))
def _rescore_block(cand_idx, txt, vis, k, block_t):
    """Exact scores for per-query candidate sets, final top-k among them.

    cand_idx: (T, C) int32, txt: (T, D), vis: (V, D). Gathers (B, C, D)
    gallery rows per text block — bounded HBM regardless of V."""
    t = txt.shape[0]

    def body(start, carry):
        vals_all, idx_all = carry
        rows = jax.lax.dynamic_slice_in_dim(cand_idx, start, block_t, 0)
        tx = jax.lax.dynamic_slice_in_dim(txt, start, block_t, 0)
        gathered = vis[rows]  # (B, C, D)
        exact = jnp.einsum(
            "bd,bcd->bc", tx, gathered, preferred_element_type=jnp.float32
        )
        vals, pos = jax.lax.top_k(exact, k)
        idx = jnp.take_along_axis(rows, pos, axis=1)
        vals_all = jax.lax.dynamic_update_slice_in_dim(vals_all, vals, start, 0)
        idx_all = jax.lax.dynamic_update_slice_in_dim(idx_all, idx, start, 0)
        return vals_all, idx_all

    n_blocks = -(-t // block_t)
    init = (
        jnp.zeros((n_blocks * block_t, k), jnp.float32),
        jnp.zeros((n_blocks * block_t, k), jnp.int32),
    )
    cand_idx = jnp.pad(cand_idx, ((0, n_blocks * block_t - t), (0, 0)))
    txt = jnp.pad(txt, ((0, n_blocks * block_t - t), (0, 0)))
    vals, idx = jax.lax.fori_loop(
        0, n_blocks, lambda i, c: body(i * block_t, c), init
    )
    return vals[:t], idx[:t]


def int8_topk(
    tq: jnp.ndarray, t_scale: jnp.ndarray,
    vq: jnp.ndarray, v_scale: jnp.ndarray,
    k: int,
    margin: Optional[int] = None,
    rescore_embs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    block_t: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k gallery items per query from int8 embeddings.

    Without ``rescore_embs``: int8-approximate scores and their top-k.
    With ``rescore_embs=(txt, vis)`` (full-precision (T, D)/(V, D) flats):
    nominate (k + margin) candidates on the int8 MXU, re-score just those
    exactly, return (values (T, k) f32, indices (T, k) i32) in descending
    exact-score order."""
    v = vq.shape[0]
    k = min(k, v)
    if margin is None:
        margin = max(k // 2, 32)
    c = min(k + margin, v)
    approx = int8_scores(tq, t_scale, vq, v_scale)
    if rescore_embs is None:
        return jax.lax.top_k(approx, k)
    _, cand = jax.lax.top_k(approx, c)
    txt, vis = rescore_embs
    return _rescore_block(cand, txt, vis, k, min(block_t, tq.shape[0]))
