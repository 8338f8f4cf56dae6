from .metrics import (
    eval_label_matrix,
    flat_sim_ranks,
    eval_qry2retro,
    label_matrix_from_scores,
    ranks_from_scores_device,
)

__all__ = [
    "eval_label_matrix",
    "flat_sim_ranks",
    "eval_qry2retro",
    "label_matrix_from_scores",
    "ranks_from_scores_device",
]
