from .normalize import l2_normalize_cols, safe_entropy
from .kmeans import kmeans_init
from .update_r import compute_scale_dist, update_r
from .ridge import moe_correct_ridge
from .objective import compute_objective_terms

__all__ = [
    "l2_normalize_cols",
    "safe_entropy",
    "kmeans_init",
    "compute_scale_dist",
    "update_r",
    "moe_correct_ridge",
    "compute_objective_terms",
]
