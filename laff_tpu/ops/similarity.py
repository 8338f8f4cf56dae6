"""Similarity measures: cosine (MXU matmul), multi-head mean, Jaccard.

The N_text x N_video cosine-similarity matrix is the framework's hot loop
(reference ``model/model.py:1003-1016, 1056-1076``; ``loss.py:30-50``).
Everything here is shaped so XLA tiles it onto the MXU: embeddings are
normalized once, the matmul contracts the feature axis, and the multi-head
(LAFF-ml) mean is folded into a single batched contraction instead of H
separate matrices.
"""

from __future__ import annotations

import jax.numpy as jnp

from .norms import l2norm


def cosine_sim(query: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """(Q, D) x (G, D) -> (Q, G) cosine similarity."""
    query = l2norm(query)
    gallery = l2norm(gallery)
    return jnp.dot(query, gallery.T, preferred_element_type=jnp.float32)


def vector_cosine_sim(query: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """Row-wise cosine of paired vectors -> (1, B) (reference ``loss.py:36-40``)."""
    query = l2norm(query)
    gallery = l2norm(gallery)
    return jnp.sum(query * gallery, axis=1)[None, :]


def multi_head_cosine_sim(
    txt: jnp.ndarray, vis: jnp.ndarray, mean: bool = True
) -> jnp.ndarray:
    """LAFF-ml similarity.

    txt: (T, H, d), vis: (V, H, d). Per-head cosine similarities, averaged
    over heads when ``mean`` (reference ``model/model.py:1007-1014``), else
    (H, T, V) per-space matrices (``predict_each_head``).

    One einsum: XLA lowers this to a single batched matmul over H, so the
    H-head mean never materializes H full T x V matrices in HBM when fused
    with the downstream reduction.
    """
    txt = l2norm(txt)
    vis = l2norm(vis)
    sims = jnp.einsum("thd,vhd->htv", txt, vis, preferred_element_type=jnp.float32)
    if mean:
        return jnp.mean(sims, axis=0)
    return sims


def hist_sim(im: jnp.ndarray, s: jnp.ndarray, eps: float = 1e-14) -> jnp.ndarray:
    """Generalized Jaccard similarity (reference ``loss.py:43-50``):
    sum(min) / (sum(max) + eps) over all row pairs -> (B_im, B_s)."""
    im_e = im[:, None, :]
    s_e = s[None, :, :]
    intersection = jnp.sum(jnp.minimum(im_e, s_e), axis=-1)
    union = jnp.sum(jnp.maximum(im_e, s_e), axis=-1) + eps
    return intersection / union
