"""clipper_tpu — TPU-native robust data association.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CLIPPER
graph-theoretic data-association engine (reference: mit-acl/clipper): pairwise
geometric-consistency scoring, dense affinity-graph construction, and the
projected-gradient-ascent relaxation of the weighted maximum-clique problem,
plus DSD densest-subgraph, maximum-clique, and SDP-relaxation baselines.

Design: batched/shardable numerical solving on dense masked matrices —
vmap for thousands of independent registration problems per chip, shard_map +
collectives for single problems with 100k+ associations across a device mesh.
"""

import os as _os

# The environment's TPU plugin force-appends itself to jax_platforms,
# breaking the standard JAX_PLATFORMS env-var contract. Restore it: an
# explicitly set JAX_PLATFORMS wins.
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from clipper_tpu.types import Params, Rounding, Solution
from clipper_tpu.clipper import Clipper, CLIPPER
from clipper_tpu.invariants import (
    PairwiseInvariant,
    EuclideanDistance,
    EuclideanDistanceParams,
    PointNormalDistance,
    PointNormalDistanceParams,
)
from clipper_tpu.ops.affinity import (
    build_affinity,
    create_all_to_all,
    score_pairwise_consistency,
)
from clipper_tpu.solvers.msrc import find_dense_clique, solve_msrc

__version__ = "0.1.0"

__all__ = [
    "Params", "Rounding", "Solution", "Clipper", "CLIPPER",
    "PairwiseInvariant", "EuclideanDistance", "EuclideanDistanceParams",
    "PointNormalDistance", "PointNormalDistanceParams",
    "build_affinity", "create_all_to_all", "score_pairwise_consistency",
    "find_dense_clique", "solve_msrc",
]
