"""Sharded engine: single huge problems block-distributed over a device mesh.

The reference's scalability ceiling is one node's memory for the m x m
affinity matrix (dense build at reference: src/clipper.cpp:29 before
sparsification); it has no distributed capability of any kind (SURVEY.md §2).
This module is the TPU-native answer for m >= 100k associations:

  * 2D mesh ("r", "c"); M and C live as (m/R, m/C) blocks per device,
    NEVER materialized on one host.
  * The affinity build computes each device's block locally from the
    (replicated, small) gathered endpoint arrays — zero communication.
  * The PGA matvec is a block-row matmul: local (m/R, m/C) @ u_c, psum over
    the column axis, all_gather over the row axis. All collectives ride ICI.
  * Norms / sums / the line-search logic operate on the replicated (m,)
    iterate — O(m) redundant work vs O(m^2/(RC)) matvec work, negligible.

Everything runs in ONE shard_map region so XLA schedules collectives with
compute; the solver loop is the same run_pga as the dense path, with sharded
operators plugged in.

Requirement: the invariant's score_block must be symmetric in its pair
arguments (true for all built-ins); the sharded build computes both triangles
independently instead of mirroring the upper one.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.solvers import msrc, msrc_flat
from clipper_tpu.types import Params, Rounding, Solution


def make_mesh(shape: Tuple[int, int] = None,
              axis_names: Tuple[str, str] = ("r", "c")) -> Mesh:
    """2D device mesh over all available devices (R x C).

    jax.devices() orders devices by process, so reshaping to (R, C) with C a
    multiple of the per-host device count puts whole block-rows on a host:
    the column-axis psum of the matvec then rides ICI within hosts, and only
    the (much smaller) row-axis all_gather of the (m,) vector crosses DCN.
    Use :func:`make_mesh_multihost` to pick that shape automatically.
    """
    devices = np.array(jax.devices())
    n = devices.size
    if shape is None:
        # squarest factorization of n
        r = int(np.floor(np.sqrt(n)))
        while n % r:
            r -= 1
        shape = (r, n // r)
    return Mesh(devices[: shape[0] * shape[1]].reshape(shape), axis_names)


def make_mesh_multihost(axis_names: Tuple[str, str] = ("r", "c")) -> Mesh:
    """DCN-aware mesh: hosts own block-rows (rows = processes, cols = local
    devices), so per-probe psum reductions stay on ICI."""
    n_local = max(1, jax.local_device_count())
    n = len(jax.devices())
    return make_mesh((n // n_local, n_local), axis_names)


def _padded_size(m: int, r: int, c: int) -> int:
    block = int(np.lcm(r, c))
    return int(-(-m // block) * block)


def pad_problem(P1, P2, u0, m_pad: int):
    """Zero-pad gathered endpoints and u0 to m_pad rows.

    Padding with u0 = 0 and no edges is EXACT for the PGA: padded entries
    start at 0, have strictly negative gradient once projected, never enter
    the d-update mask, and contribute nothing to sums/norms.
    """
    m = P1.shape[0]
    pad = m_pad - m
    if pad == 0:
        return P1, P2, u0
    P1 = jnp.pad(P1, ((0, pad), (0, 0)))
    P2 = jnp.pad(P2, ((0, pad), (0, 0)))
    u0 = jnp.pad(u0, (0, pad))
    return P1, P2, u0


def sharded_operators(M_blk, C_blk, mc: int, axis_names=("r", "c")):
    """PGA operators over block-sharded matrices (called INSIDE shard_map)."""
    r_ax, c_ax = axis_names

    def block_mv(blk, u):
        ci = jax.lax.axis_index(c_ax)
        u_c = jax.lax.dynamic_slice_in_dim(u, ci * mc, mc)
        part = blk @ u_c                       # local MXU matmul
        row = jax.lax.psum(part, c_ax)         # reduce partial products (ICI)
        return jax.lax.all_gather(row, r_ax, tiled=True)  # replicate result

    def make_mv_Md(d):
        Md_blk = M_blk + d * C_blk             # local, no communication
        return lambda u: block_mv(Md_blk, u)

    return msrc.PGAOperators(
        mv_M=lambda u: block_mv(M_blk, u),
        mv_C=lambda u: block_mv(C_blk, u),
        make_mv_Md=make_mv_Md,
    )


def _affinity_block(invariant, P1, P2, A, m_true: int, mr: int, mc: int,
                    affinityeps: float, axis_names=("r", "c")):
    """One device's (mr, mc) block of M and C (called INSIDE shard_map)."""
    r_ax, c_ax = axis_names
    ri = jax.lax.axis_index(r_ax)
    ci = jax.lax.axis_index(c_ax)
    r0 = ri * mr
    c0 = ci * mc

    P1r = jax.lax.dynamic_slice_in_dim(P1, r0, mr)
    P1c = jax.lax.dynamic_slice_in_dim(P1, c0, mc)
    P2r = jax.lax.dynamic_slice_in_dim(P2, r0, mr)
    P2c = jax.lax.dynamic_slice_in_dim(P2, c0, mc)
    Ar = jax.lax.dynamic_slice_in_dim(A, r0, mr)
    Ac = jax.lax.dynamic_slice_in_dim(A, c0, mc)

    scores = invariant.score_block(P1r, P1c, P2r, P2c)

    # distinctness + diagonal + padding + threshold masks
    # (reference: src/clipper.cpp:35-55)
    distinct = ~((Ar[:, 0, None] == Ac[None, :, 0])
                 | (Ar[:, 1, None] == Ac[None, :, 1]))
    gr = r0 + jax.lax.broadcasted_iota(jnp.int32, (mr, mc), 0)
    gc = c0 + jax.lax.broadcasted_iota(jnp.int32, (mr, mc), 1)
    off_diag = gr != gc
    valid = (gr < m_true) & (gc < m_true)
    keep = distinct & off_diag & valid & (scores > affinityeps)

    M_blk = jnp.where(keep, scores, 0.0).astype(scores.dtype)
    C_blk = keep.astype(scores.dtype)
    return M_blk, C_blk


def _divisor_at_most(n: int, k: int) -> int:
    k = min(n, k)
    while n % k:
        k -= 1
    return k


def _affinity_block_stored(invariant, P1, P2, A, m_true: int, mr: int,
                           mc: int, affinityeps: float, storage_dtype,
                           build_chunk: int = 512, axis_names=("r", "c")):
    """One device's stacked (2 mr, mc) [M; C] block, built DIRECTLY in the
    reduced storage dtype, chunk of rows at a time (called INSIDE shard_map).

    The plain build (:func:`_affinity_block`) materializes the full-precision
    (mr, mc) M and C blocks before quantization — at the single-chip capacity
    point (m = 65,536 int8: the stored [M; C] block alone is 8.6 GB) the f32
    intermediates (34 GB) would blow HBM long before the storage does. Here
    only a (chunk, mc) score tile is ever live in full precision; XLA updates
    the carried int8/bf16 buffer in place across the fori_loop.
    """
    r_ax, c_ax = axis_names
    ri = jax.lax.axis_index(r_ax)
    ci = jax.lax.axis_index(c_ax)
    r0 = ri * mr
    c0 = ci * mc

    P1c = jax.lax.dynamic_slice_in_dim(P1, c0, mc)
    P2c = jax.lax.dynamic_slice_in_dim(P2, c0, mc)
    Ac = jax.lax.dynamic_slice_in_dim(A, c0, mc)

    chunk = _divisor_at_most(mr, build_chunk)
    nchunks = mr // chunk
    is_int8 = jnp.dtype(storage_dtype) == jnp.int8
    buf = jnp.zeros((2 * mr, mc), storage_dtype)

    def body(kk, buf):
        cr0 = r0 + kk * chunk
        P1r = jax.lax.dynamic_slice_in_dim(P1, cr0, chunk)
        P2r = jax.lax.dynamic_slice_in_dim(P2, cr0, chunk)
        Ar = jax.lax.dynamic_slice_in_dim(A, cr0, chunk)

        scores = invariant.score_block(P1r, P1c, P2r, P2c)
        # distinctness + diagonal + padding + threshold masks
        # (reference: src/clipper.cpp:35-55)
        distinct = ~((Ar[:, 0, None] == Ac[None, :, 0])
                     | (Ar[:, 1, None] == Ac[None, :, 1]))
        gr = cr0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, mc), 0)
        gc = c0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, mc), 1)
        keep = (distinct & (gr != gc) & (gr < m_true) & (gc < m_true)
                & (scores > affinityeps))

        M_t = jnp.where(keep, scores, 0.0).astype(scores.dtype)
        C_t = keep.astype(scores.dtype)
        if is_int8:
            M_s = msrc_flat.quantize_stacked(M_t)
            C_s = msrc_flat.quantize_stacked(C_t)
        else:
            M_s = M_t.astype(storage_dtype)
            C_s = C_t.astype(storage_dtype)
        buf = jax.lax.dynamic_update_slice(buf, M_s, (kk * chunk, 0))
        buf = jax.lax.dynamic_update_slice(buf, C_s, (mr + kk * chunk, 0))
        return buf

    return jax.lax.fori_loop(0, nchunks, body, buf)


def _block_quadform(invariant, P1, P2, A, u, m_true, mr: int, mc: int,
                    affinityeps: float, build_chunk: int = 512,
                    axis_names=("r", "c")):
    """This device's exact f32 partial of u' M u: u_r' M_blk u_c, rebuilding
    the block chunk-of-rows on the fly (called INSIDE shard_map; sum the
    result with a psum over both mesh axes).

    O(m^2 / (R C)) work per device — one extra build pass — and O(chunk, mc)
    memory; no support-size cap, unlike support_objective.
    """
    r_ax, c_ax = axis_names
    ri = jax.lax.axis_index(r_ax)
    ci = jax.lax.axis_index(c_ax)
    r0 = ri * mr
    c0 = ci * mc

    P1c = jax.lax.dynamic_slice_in_dim(P1, c0, mc)
    P2c = jax.lax.dynamic_slice_in_dim(P2, c0, mc)
    Ac = jax.lax.dynamic_slice_in_dim(A, c0, mc)
    u_c = jax.lax.dynamic_slice_in_dim(u, c0, mc)

    chunk = _divisor_at_most(mr, build_chunk)

    def body(kk, acc):
        cr0 = r0 + kk * chunk
        P1r = jax.lax.dynamic_slice_in_dim(P1, cr0, chunk)
        P2r = jax.lax.dynamic_slice_in_dim(P2, cr0, chunk)
        Ar = jax.lax.dynamic_slice_in_dim(A, cr0, chunk)
        u_r = jax.lax.dynamic_slice_in_dim(u, cr0, chunk)

        scores = invariant.score_block(P1r, P1c, P2r, P2c)
        distinct = ~((Ar[:, 0, None] == Ac[None, :, 0])
                     | (Ar[:, 1, None] == Ac[None, :, 1]))
        gr = cr0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, mc), 0)
        gc = c0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, mc), 1)
        keep = (distinct & (gr != gc) & (gr < m_true) & (gc < m_true)
                & (scores > affinityeps))
        M_t = jnp.where(keep, scores, 0.0)
        return acc + jnp.dot(u_r, M_t @ u_c)

    return jax.lax.fori_loop(0, mr // chunk, body,
                             jnp.zeros((), u.dtype))


def sharded_dual_matvec(MC_store, mr: int, mc: int, out_dtype,
                        axis_names=("r", "c"),
                        matvec_chunk: Optional[int] = None):
    """u -> (M u, C u) over block-sharded stacked [M; C] storage.

    MC_store is this device's (2 mr, mc) block in f64/f32/bf16/int8 (int8 =
    quantize_stacked scaling). Accepts (m,) vectors or (m, K) multiprobe
    candidate matrices (replicated); one local matmul + psum over the column
    axis + two row-axis all_gathers per probe. Mirrors
    msrc_flat.make_stacked_matvec so the sharded flat solver runs the same
    arithmetic as the dense one, with collectives inserted.

    matvec_chunk: process the block ``chunk`` rows at a time inside a
    fori_loop (slice int8 -> dequantize -> matmul -> write). On TPU the
    int8->bf16 dequantization fuses into the matmul, so leave this None;
    on the CPU backend (virtual-mesh validation runs) XLA MATERIALIZES the
    converted copy of the whole block — 4x the stored bytes, an OOM at
    m >= 100k — and chunking caps the live converted bytes at
    (chunk, mc). Arithmetic is identical (same per-row dot products).
    """
    r_ax, c_ax = axis_names

    if MC_store.dtype == jnp.int8:
        inv_scale = jnp.asarray(1.0 / msrc_flat._INT8_SCALE, out_dtype)

        def local_rows(rows, u_c):
            y = jax.lax.dot_general(
                rows.astype(jnp.bfloat16), u_c.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_dtype)
            return y * inv_scale
    else:
        acc = out_dtype if MC_store.dtype == out_dtype else jnp.float32

        def local_rows(rows, u_c):
            return jax.lax.dot_general(
                rows, u_c.astype(rows.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc).astype(out_dtype)

    if matvec_chunk is None:
        def local(u_c):
            return local_rows(MC_store, u_c)
    else:
        chunk = _divisor_at_most(2 * mr, matvec_chunk)
        nchunks = 2 * mr // chunk

        def local(u_c):
            out_shape = ((2 * mr,) if u_c.ndim == 1
                         else (2 * mr, u_c.shape[1]))
            buf = jnp.zeros(out_shape, out_dtype)

            def body(kk, buf):
                rows = jax.lax.dynamic_slice_in_dim(MC_store, kk * chunk,
                                                    chunk)
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, local_rows(rows, u_c), kk * chunk, axis=0)

            return jax.lax.fori_loop(0, nchunks, body, buf)

    def mv(u):
        ci = jax.lax.axis_index(c_ax)
        u_c = jax.lax.dynamic_slice_in_dim(u, ci * mc, mc, axis=0)
        y = jax.lax.psum(local(u_c), c_ax)
        Mu = jax.lax.all_gather(y[:mr], r_ax, tiled=True)
        Cu = jax.lax.all_gather(y[mr:], r_ax, tiled=True)
        return Mu, Cu

    return mv


def build_sharded_pipeline(invariant: PairwiseInvariant, mesh: Mesh,
                           params: Params = Params(),
                           affinityeps: float = 1e-4,
                           solver: str = "flat",
                           storage_dtype=None,
                           probes: int = 1,
                           power_steps: int = 0,
                           support: int = 512,
                           build_chunk: int = 512,
                           matvec_chunk: Optional[int] = None):
    """Compile a full sharded pipeline: endpoints -> affinity blocks -> solve.

    Returns a jitted function (P1, P2, A, u0, m_true) -> (u, F, ifinal, mask)
    where P1/P2 are (m_pad, d) gathered endpoints (padded; see pad_problem),
    A is (m_pad, 2), u0 is (m_pad,), and m_true the unpadded size.

    solver: "flat" (default; the per-lane state machine with the
        cancellation-free gradient and stall guard — identical trajectory
        to the dense flat engine) or "nested" (the reference-shaped loop).
    storage_dtype (flat only): None keeps the working dtype; jnp.bfloat16 /
        jnp.int8 store the [M; C] blocks reduced — 2x / 4x less per-chip
        HBM for the dominant buffers AND matvec traffic, which is what sets
        the per-chip memory ceiling at m >= 100k. The blocks are built
        chunk-of-rows at a time DIRECTLY in the storage dtype (see
        _affinity_block_stored), so peak per-device memory is the stored
        block + one (build_chunk, mc) full-precision tile; the final
        objective is re-polished in full precision on u's top-``support``
        entries (support_objective — exact for converged supports).
    probes (flat only): K-wide line search (see
        msrc_flat.flat_solve_single_multiprobe) — pays on single large
        problems where the probe sequence is the critical path.
    """
    if solver not in ("flat", "nested"):
        raise ValueError(f"solver must be 'flat' or 'nested', got {solver!r}")
    r_ax, c_ax = mesh.axis_names
    R = mesh.shape[r_ax]
    C = mesh.shape[c_ax]

    def pipeline_body(P1, P2, A, u0, m_true):
        m_pad = P1.shape[0]
        mr, mc = m_pad // R, m_pad // C
        if solver == "nested":
            M_blk, C_blk = _affinity_block(invariant, P1, P2, A, m_true,
                                           mr, mc, affinityeps, (r_ax, c_ax))
            ops = sharded_operators(M_blk, C_blk, mc, (r_ax, c_ax))
            return msrc.run_pga(ops, u0, params, dtype=P1.dtype)

        if storage_dtype is None:
            M_blk, C_blk = _affinity_block(invariant, P1, P2, A, m_true,
                                           mr, mc, affinityeps, (r_ax, c_ax))
            MC_store = jnp.concatenate([M_blk, C_blk], axis=0)
        else:
            # reduced storage built directly, never materializing the
            # full-precision block (single-chip capacity path, m >= 65k)
            MC_store = _affinity_block_stored(
                invariant, P1, P2, A, m_true, mr, mc, affinityeps,
                storage_dtype, build_chunk, (r_ax, c_ax))
        dual = sharded_dual_matvec(MC_store, mr, mc, P1.dtype,
                                   (r_ax, c_ax), matvec_chunk=matvec_chunk)
        if power_steps:
            u0 = msrc_flat.power_init(dual, u0, power_steps)
        if probes > 1:
            u, F, ifinal = msrc_flat.flat_solve_single_multiprobe(
                dual, u0, params, probes=probes)
        else:
            u, F, ifinal = msrc_flat.flat_solve_single(dual, u0, params)
        if storage_dtype is not None:
            # full-precision objective polish: omega = round(F) needs F
            # accurate to well under 0.5 (reference: src/clipper.cpp:305).
            # Fast path: support-restricted (top-k) rebuild — exact only
            # when nnz(u) <= k. When the converged support is wider (big
            # cliques at low outlier ratios / large m), fall back to the
            # exact chunked block quadform (one extra build pass). The
            # predicate is computed from the replicated u, so every device
            # takes the same branch and the psum below stays collective-safe.
            from clipper_tpu.parallel.pool import support_objective
            k = min(support, m_pad)
            nnz = jnp.sum(u > 0)

            def fast(_):
                Fs = support_objective(invariant, P1, P2, A, u,
                                       affinityeps=affinityeps, k=k,
                                       include_identity=False)
                return Fs / (R * C)   # replicated; psum restores Fs

            def exact(_):
                return _block_quadform(invariant, P1, P2, A, u, m_true,
                                       mr, mc, affinityeps, build_chunk,
                                       (r_ax, c_ax))

            part = jax.lax.cond(nnz <= k, fast, exact, None)
            F = (jax.lax.psum(part, (r_ax, c_ax))
                 + jnp.dot(u, u)).astype(P1.dtype)
        return u, F, ifinal

    shmapped = jax.shard_map(
        pipeline_body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    rounding = params.rounding
    if rounding == Rounding.DSD:
        rounding = Rounding.NONZERO  # facade reruns DSD host-side

    @jax.jit
    def pipeline(P1, P2, A, u0, m_true):
        u, F, ifinal = shmapped(P1, P2, A, u0,
                                jnp.asarray(m_true, jnp.int32))
        mask = msrc.round_solution(u, F, rounding)
        return u, F, ifinal, mask

    return pipeline


def solve_sharded(invariant: PairwiseInvariant, D1, D2, A, u0,
                  params: Params = Params(), mesh: Optional[Mesh] = None,
                  *, affinityeps: float = 1e-4, solver: str = "flat",
                  storage_dtype=None, probes: int = 1,
                  power_steps: int = 0, support: int = 512,
                  build_chunk: int = 512,
                  matvec_chunk: Optional[int] = None) -> Solution:
    """End-to-end sharded solve of one large problem.

    D1/D2 are (n, d) row-major datasets; A is (m, 2); u0 is (m,).
    See :func:`build_sharded_pipeline` for solver/storage_dtype/probes.
    """
    if mesh is None:
        mesh = make_mesh()
    R = mesh.shape[mesh.axis_names[0]]
    C = mesh.shape[mesh.axis_names[1]]

    A = jnp.asarray(A, jnp.int32)
    m = A.shape[0]
    P1 = jnp.asarray(D1)[A[:, 0]]
    P2 = jnp.asarray(D2)[A[:, 1]]
    u0 = jnp.asarray(u0, P1.dtype)

    m_pad = _padded_size(m, R, C)
    P1, P2, u0p = pad_problem(P1, P2, u0, m_pad)
    A_pad = jnp.pad(A, ((0, m_pad - m), (0, 0)), constant_values=-1)

    pipeline = build_sharded_pipeline(invariant, mesh, params, affinityeps,
                                      solver=solver,
                                      storage_dtype=storage_dtype,
                                      probes=probes,
                                      power_steps=power_steps,
                                      support=support,
                                      build_chunk=build_chunk,
                                      matvec_chunk=matvec_chunk)
    u, F, ifinal, mask = pipeline(P1, P2, A_pad, u0p, m)
    return Solution(ifinal=ifinal, mask=mask[:m], u0=u0, u=u[:m], score=F)
