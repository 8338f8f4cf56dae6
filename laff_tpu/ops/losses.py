"""Retrieval losses, functional JAX versions of the reference loss zoo.

Parity targets (reference ``loss.py``):
  triplet_loss            <- MarginRankingLoss (68-135), improved triplet with
                             hardest-negative ``max_violation``
  triplet_loss_from_scores<- MarginRankingLossWithScore (138-200)
  dual_softmax_loss       <- DualSoftmaxLoss (291-310)
  cross_entropy_loss      <- CrossEntropyLoss (271-288)
  margin_loss             <- negation MarginLoss (224-268)
  margin2_loss            <- Margin2Loss dual-margin negation loss (342-398)
  kl_loss                 <- KlLoss (313-338)

All are pure functions of embeddings -> scalar, so they compose with
``jax.grad`` / ``jax.vmap`` (multi-space) / sharding. Under data-parallel
sharding, hardest-negative mining needs the *global* in-batch score matrix;
callers all-gather embeddings first (see laff_tpu.parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .similarity import cosine_sim, hist_sim, vector_cosine_sim

_MEASURES = {"cosine": cosine_sim, "hist": hist_sim}
_VEC_MEASURES = {"cosine": vector_cosine_sim, "hist": hist_sim}


def triplet_loss_from_scores(
    scores: jnp.ndarray,
    margin: float = 0.2,
    direction: str = "t2i",
    max_violation: bool = True,
    cost_style: str = "sum",
) -> jnp.ndarray:
    """Improved triplet loss on a precomputed (B, B) score matrix whose
    diagonal holds the positive pairs. Rows index visual items, columns
    index captions (reference layout: ``scores = sim(im, s)``).

    direction 'i2t' compares each diagonal to its row (caption retrieval),
    't2i' to its column (video retrieval), 'bidir' both.
    """
    n = scores.shape[0]
    diagonal = jnp.diagonal(scores)
    eye = jnp.eye(n, dtype=bool)

    cost_s = None  # caption retrieval: row-wise violations
    cost_im = None  # video retrieval: column-wise violations
    if direction in ("i2t", "bidir"):
        cost_s = jnp.clip(margin + scores - diagonal[:, None], min=0.0)
        cost_s = jnp.where(eye, 0.0, cost_s)
    if direction in ("t2i", "bidir"):
        cost_im = jnp.clip(margin + scores - diagonal[None, :], min=0.0)
        cost_im = jnp.where(eye, 0.0, cost_im)

    if max_violation:
        if cost_s is not None:
            cost_s = jnp.max(cost_s, axis=1)
        if cost_im is not None:
            cost_im = jnp.max(cost_im, axis=0)

    zero = jnp.zeros((1,), dtype=scores.dtype)
    cost_s = zero if cost_s is None else cost_s
    cost_im = zero if cost_im is None else cost_im

    if cost_style == "sum":
        return jnp.sum(cost_s) + jnp.sum(cost_im)
    return jnp.mean(cost_s) + jnp.mean(cost_im)


def triplet_loss(
    txt_embs: jnp.ndarray,
    vis_embs: jnp.ndarray,
    margin: float = 0.2,
    measure: str = "cosine",
    direction: str = "t2i",
    max_violation: bool = True,
    cost_style: str = "sum",
) -> jnp.ndarray:
    """MarginRankingLoss on (B, D) embedding pairs."""
    scores = _MEASURES[measure](vis_embs, txt_embs)
    return triplet_loss_from_scores(scores, margin, direction, max_violation, cost_style)


def triplet_loss_multi_space(
    txt_embs: jnp.ndarray,
    vis_embs: jnp.ndarray,
    margin: float = 0.2,
    measure: str = "cosine",
    direction: str = "t2i",
    max_violation: bool = True,
    cost_style: str = "sum",
) -> jnp.ndarray:
    """LAFF-ml: one independent triplet loss per head, summed
    (reference ``model/model.py:2036-2038``). txt/vis: (B, H, d).

    vmap over the head axis -> XLA batches the H score-matrix matmuls into
    one (H, B, B) contraction instead of a Python loop.
    """
    per_head = jax.vmap(
        partial(
            triplet_loss,
            margin=margin,
            measure=measure,
            direction=direction,
            max_violation=max_violation,
            cost_style=cost_style,
        ),
        in_axes=(1, 1),
    )(txt_embs, vis_embs)
    return jnp.sum(per_head)


def dual_softmax_loss_from_scores(sim1: jnp.ndarray, temp: float = 1000.0) -> jnp.ndarray:
    """DSL on a precomputed (B, B) in-batch similarity matrix."""

    def one_side(sim: jnp.ndarray) -> jnp.ndarray:
        n = sim.shape[0]
        sim = sim * jax.nn.softmax(sim / temp, axis=0) * n
        logpt = jnp.diagonal(jax.nn.log_softmax(sim, axis=-1))
        return -jnp.sum(logpt)

    return (one_side(sim1) + one_side(sim1.T)) / 2.0


def dual_softmax_loss(txt_embs: jnp.ndarray, vis_embs: jnp.ndarray, temp: float = 1000.0) -> jnp.ndarray:
    """DSL: prior-reweighted symmetric InfoNCE (reference ``loss.py:291-310``)."""
    return dual_softmax_loss_from_scores(cosine_sim(txt_embs, vis_embs), temp)


def cross_entropy_loss_from_scores(sim1: jnp.ndarray) -> jnp.ndarray:
    return -jnp.sum(jnp.diagonal(sim1))


def cross_entropy_loss(txt_embs: jnp.ndarray, vis_embs: jnp.ndarray) -> jnp.ndarray:
    """Reference CrossEntropyLoss (``loss.py:271-288``): with its diag-of-diag
    construction the loss degenerates to -sum(diag(sim)) per direction."""
    return cross_entropy_loss_from_scores(cosine_sim(txt_embs, vis_embs))


def margin_loss(
    txt_embs: jnp.ndarray,
    vis_embs: jnp.ndarray,
    false_txt_embs: jnp.ndarray,
    weight: jnp.ndarray,
    neg_weight: float = 1.0,
    measure: str = "cosine",
    cost_style: str = "sum",
) -> jnp.ndarray:
    """Negation loss: push false-caption scores below true-caption scores
    (reference ``loss.py:224-268``; note the reference hard-codes margin=0)."""
    sim = _VEC_MEASURES[measure]
    scores_t = sim(txt_embs, vis_embs)
    scores_f = sim(false_txt_embs, vis_embs)
    weight = weight * (neg_weight - 1.0) + 1.0
    cost = jnp.clip(scores_f - scores_t, min=0.0) * weight
    return jnp.sum(cost) if cost_style == "sum" else jnp.mean(cost)


def margin2_loss(
    txt_embs: jnp.ndarray,
    vis_embs: jnp.ndarray,
    false_txt_embs: jnp.ndarray,
    weight: jnp.ndarray,
    bottom_margin: float | None = 0.1,
    upper_margin: float | None = 0.6,
    bottom_margin_t2t: float | None = 0.1,
    upper_margin_t2t: float | None = 0.3,
    neg_weight: float = 1.0,
    measure: str = "cosine",
    cost_style: str = "sum",
) -> jnp.ndarray:
    """Dual-margin negation loss over t2v and t2t score gaps
    (reference ``loss.py:342-398``)."""
    sim = _VEC_MEASURES[measure]
    scores_t = sim(txt_embs, vis_embs)
    scores_f = sim(false_txt_embs, vis_embs)
    scores_f2 = sim(false_txt_embs, txt_embs)
    weight = weight * (neg_weight - 1.0) + 1.0

    cost = jnp.zeros_like(scores_t)
    if bottom_margin is not None:
        cost = cost + jnp.clip(bottom_margin + scores_f - scores_t, min=0.0)
    if upper_margin is not None:
        cost = cost + jnp.clip(-upper_margin - scores_f + scores_t, min=0.0)
    if bottom_margin_t2t is not None:
        cost = cost + jnp.clip(bottom_margin_t2t + scores_f2 - scores_t, min=0.0)
    if upper_margin_t2t is not None:
        cost = cost + jnp.clip(-upper_margin_t2t - scores_f2 + scores_t, min=0.0)
    cost = cost * weight
    return jnp.sum(cost) if cost_style == "sum" else jnp.mean(cost)


def kl_loss(
    scores: jnp.ndarray, origin_scores: jnp.ndarray, cost_style: str = "sum"
) -> jnp.ndarray:
    """KL(origin || scores) over rows (reference ``loss.py:313-338``)."""
    target = jax.nn.softmax(origin_scores, axis=1)
    log_pred = jax.nn.log_softmax(scores, axis=1)
    # torch KLDivLoss(reduction='none'): target * (log(target) - log_pred)
    elementwise = target * (jnp.log(jnp.clip(target, min=1e-30)) - log_pred)
    return jnp.sum(elementwise) if cost_style == "sum" else jnp.mean(elementwise)
