from .metrics import (
    blockwise_flat_ranks,
    eval_label_matrix,
    eval_qry2retro,
    flat_sim_ranks,
    label_matrix_from_scores,
    ranks_from_scores_device,
    topk_two_stage,
    topk_wide,
)

__all__ = [
    "blockwise_flat_ranks",
    "eval_label_matrix",
    "eval_qry2retro",
    "flat_sim_ranks",
    "label_matrix_from_scores",
    "ranks_from_scores_device",
    "topk_two_stage",
    "topk_wide",
]
