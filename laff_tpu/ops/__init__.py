from .norms import l1norm, l2norm
from .similarity import cosine_sim, hist_sim, multi_head_cosine_sim, vector_cosine_sim
from .quantized import int8_scores, int8_topk, quantize_rows
from .losses import (
    cross_entropy_loss,
    dual_softmax_loss,
    kl_loss,
    margin2_loss,
    margin_loss,
    triplet_loss,
    triplet_loss_from_scores,
    triplet_loss_multi_space,
)

__all__ = [
    "l1norm",
    "l2norm",
    "cosine_sim",
    "hist_sim",
    "multi_head_cosine_sim",
    "vector_cosine_sim",
    "cross_entropy_loss",
    "dual_softmax_loss",
    "kl_loss",
    "margin2_loss",
    "margin_loss",
    "triplet_loss",
    "triplet_loss_from_scores",
    "triplet_loss_multi_space",
    "int8_scores",
    "int8_topk",
    "quantize_rows",
]
