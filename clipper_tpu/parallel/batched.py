"""Batched engine: many independent problems per device program via vmap.

The reference solves one problem per process; its only parallelism is an
OpenMP loop inside the affinity build (SURVEY.md §2). The TPU-native
equivalent of "throughput" is problem batching: vmap the whole pipeline
(scoring + solver + rounding) over B problems so a single chip runs
thousands of registrations / loop-closure verifications in one program.

Under vmap the nested while_loops run until the slowest problem in the batch
converges (lax.while_loop batching semantics); converged problems idle via
masked predicates. For homogeneous problem sizes this costs little; bucket
by m for heterogeneous loads.

Optionally shard the batch axis across a mesh (data parallelism over
problems) — combined with jit this scales to all devices with zero
communication.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.ops.affinity import score_pairwise_consistency
from clipper_tpu.solvers import msrc
from clipper_tpu.types import Params, Rounding, Solution


def make_batched_pipeline(invariant: PairwiseInvariant,
                          params: Params = Params(),
                          affinityeps: float = 1e-4,
                          shared_d1: bool = False,
                          solver: str = "flat",
                          matvec: str = "stacked",
                          probes: int = 1,
                          power_steps: int = 0):
    """Compile (D1s, D2s, As, u0s) -> batched Solution.

    Shapes: D1s (B, n1, d) — or (n1, d) if shared_d1, D2s (B, n2, d),
    As (B, m, 2), u0s (B, m).

    solver: "flat" (default; per-lane state machine — total device ticks =
        the max single-lane probe count, the SIMD optimum for batches) or
        "nested" (the reference-shaped triple-nested loop; per-level max
        batching semantics make it much slower for large batches).
    matvec: for the flat solver, "stacked" ([M; C] single matmul),
        "stacked_bf16" (same, with bf16 storage / f32 accumulation and an
        f32 final-objective polish), "stacked_int8" (int8 quantized
        storage — 1/4 the HBM traffic, dequantization fused into the
        matmul; same f32 polish), or "fused" (Pallas kernel computing
        M u and C u from one read of M; valid because C is the 0/1 pattern
        of M in this pipeline).
    probes: line-search width K for the flat solver. K > 1 evaluates K
        backtracking candidates per matvec tick (same HBM traffic — the tick
        cost on TPU), collapsing the backtrack-dominated batch tail; the
        accepted candidate matches the sequential line search exactly.
        Requires matvec "stacked"/"stacked_bf16".
    power_steps: extra power-iteration init steps on u0 before solving
        (see msrc_flat.power_init) — kills the backtracking tail that sets
        a lock-step batch's critical path; 0 = the reference trajectory.
    """
    from clipper_tpu.solvers import msrc_flat

    rounding = params.rounding
    if rounding == Rounding.DSD:
        rounding = Rounding.NONZERO

    def one(D1, D2, A, u0):
        M, C = score_pairwise_consistency(invariant, D1, D2, A,
                                          affinityeps=affinityeps)
        if solver == "flat":
            polish = False
            if matvec == "fused":
                from clipper_tpu.ops.fused_matvec import make_pattern_dual_matvec
                mv = make_pattern_dual_matvec(M)
            elif matvec == "stacked_bf16":
                mv = msrc_flat.stacked_dual_matvec(M, C, jnp.bfloat16)
                polish = True
            elif matvec == "stacked_int8":
                mv = msrc_flat.stacked_dual_matvec(M, C, jnp.int8)
                polish = True
            else:
                mv = msrc_flat.stacked_dual_matvec(M, C)
            if power_steps:
                u0 = msrc_flat.power_init(mv, u0, power_steps)
            if probes > 1:
                assert matvec != "fused", "multiprobe needs the stacked matvec"
                u, F, ifinal = msrc_flat.flat_solve_single_multiprobe(
                    mv, u0, params, probes=probes)
            else:
                u, F, ifinal = msrc_flat.flat_solve_single(mv, u0, params)
            if polish:
                F = msrc_flat.recompute_objective(
                    msrc_flat.stacked_dual_matvec(M, C), u)
        else:
            u, F, ifinal = msrc.find_dense_clique(M, C, u0, params)
        mask = msrc.round_solution(u, F, rounding)
        return Solution(ifinal=ifinal, mask=mask, u0=u0, u=u, score=F)

    in_axes = (None if shared_d1 else 0, 0, 0, 0)
    return jax.jit(jax.vmap(one, in_axes=in_axes))


def make_solve_pipeline(params: Params = Params()):
    """Compile (Ms, Cs, u0s) -> batched Solution (matrices already built)."""

    def one(M, C, u0):
        u, F, ifinal = msrc.find_dense_clique(M, C, u0, params)
        mask = msrc.round_solution(u, F, params.rounding)
        return Solution(ifinal=ifinal, mask=mask, u0=u0, u=u, score=F)

    return jax.jit(jax.vmap(one))


def shard_batch(tree, mesh: Mesh, axis_name: str = "b"):
    """Place a batch of arrays with the leading axis sharded over the mesh.

    Data parallelism over problems: each device owns B/ndev problems; no
    collectives are needed anywhere in the pipeline.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
