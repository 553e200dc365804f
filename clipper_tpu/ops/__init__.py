from clipper_tpu.ops.affinity import (
    build_affinity,
    create_all_to_all,
    distinctness_mask,
    score_pairwise_consistency,
)
from clipper_tpu.ops.pairwise import (
    pairwise_distance_matrix,
    pairwise_inner_matrix,
    pairwise_sqdist_matrix,
)

__all__ = [
    "build_affinity", "create_all_to_all", "distinctness_mask",
    "score_pairwise_consistency", "pairwise_distance_matrix",
    "pairwise_inner_matrix", "pairwise_sqdist_matrix",
]
