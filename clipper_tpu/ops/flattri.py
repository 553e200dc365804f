"""Flat row-major triangle storage: the pool engine's half-traffic layout.

M and C are symmetric, so the dense stacked [M; C] pool storage
(msrc_flat.make_stacked_matvec) carries every off-diagonal entry twice:
2 m^2 bytes per problem, all of it streamed through HBM every solver tick.
This module stores only the upper-triangle TILES of [M; C], packed as one
(2t, S) array per problem with S = t * nt (nt + 1) / 2:

    row-block r's tiles (r, r), (r, r+1), ..., (r, nt-1) occupy the
    contiguous column span [off_r * t, (off_r + nt - r) * t) with
    off_r = r * nt - r (r - 1) / 2   — a STATIC offset.

Rows 0:t of the array hold the M tiles, rows t:2t the C tiles (the same
stacked-pair convention as ops/symstore.py). Zero padding slack, and —
because every segment boundary is static — the matvec kernel needs no
coordinate tables, no SMEM lookups, and no dynamic scatters: it is nt
unrolled iterations of three static-shape MXU contractions.

Why this exists (CLAUDE.md round-5 candidate #1): the pool tick reads its
lane's ENTIRE stored matrix every probe, so storage bytes ARE tick time on
an HBM-bound chip. Halving the stored bytes halves both the tick and the
pool's footprint. The blocker for a Pallas pool matvec was lazy per-lane
indexing — the XLA tick fuses the MCs[idx] gather into the matmul read,
which a pallas_call cannot — solved here by riding the lane's pool index
in as a SCALAR-PREFETCH operand and addressing HBM with it from the tri
BlockSpec's index_map (index_map may read prefetched refs). A round-1
one-read attempt failed VPU-bound (BENCH.md: pattern compare +
multiply-reduce); this kernel keeps every contraction on the MXU.

Reference semantics covered: affinity masks src/clipper.cpp:35-64, the
hot matvec src/clipper.cpp:219.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from clipper_tpu.invariants.base import PairwiseInvariant


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def tri_tile_offsets(nt: int) -> list:
    """off_r (in tiles) of row-block r's segment in the flat layout."""
    return [r * nt - r * (r - 1) // 2 for r in range(nt)]


def tri_ncols(nt: int, t: int) -> int:
    """S: total flat columns = t * (number of upper-triangle tiles)."""
    return t * (nt * (nt + 1) // 2)


def tri_coords(nt: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-tile (r, c, off) arrays in flat storage order (row-major)."""
    rs, cs, offs = [], [], []
    off = 0
    for r in range(nt):
        for c in range(r, nt):
            rs.append(r)
            cs.append(c)
            offs.append(off)
            off += 1
    return (np.asarray(rs, np.int32), np.asarray(cs, np.int32),
            np.asarray(offs, np.int32))


def repack_stacked(MC: jnp.ndarray, t: int) -> jnp.ndarray:
    """Dense stacked (2m, m) [M; C] -> flat triangle (2t, S).

    Pure static slicing; the content is bit-identical to the build's, so
    the repacked storage represents exactly the same matrix pair (tests
    cross-check the matvec against make_stacked_matvec this way).
    """
    two_m, m = MC.shape
    assert two_m == 2 * m and m % t == 0, (MC.shape, t)
    nt = m // t
    segs = []
    for r in range(nt):
        Mseg = jax.lax.slice(MC, (r * t, r * t), ((r + 1) * t, m))
        Cseg = jax.lax.slice(MC, (m + r * t, r * t), (m + (r + 1) * t, m))
        segs.append(jnp.concatenate([Mseg, Cseg], axis=0))   # (2t, (nt-r)t)
    return jnp.concatenate(segs, axis=1)


def _seg_matvec_lane(read, u_row, nt: int, t: int, cdt, acc_dtype,
                     dot_acc=None):
    """One lane's (M u, C u) from its flat triangle, as unrolled segment
    matmuls — the shared math of the Pallas kernel body and the XLA
    fallback. ``read(r0, c0, r1, c1)`` returns the storage slice
    [r0:r1, c0:c1] of the lane's (2t, S) triangle — in the kernel these
    are VALUE slices of one whole-block VMEM load (measured faster than
    per-segment ref slices, whose overlapping transposed reads re-issue
    VMEM loads); u_row: (K, m) candidate rows in ``cdt``. Returns
    (accM, accC), each (K, m) in ``acc_dtype``.

    Mosaic has no dynamic_slice/scatter lowering, so the accumulator is
    assembled from STATIC pieces only: the forward products are disjoint
    per row (concatenated once at the end) and each transposed product is
    left-padded with a static zero block and summed — nt cheap (1, m) VPU
    adds against the nt MXU contractions that dominate.
    """
    m = nt * t
    K = u_row.shape[0]      # candidate rows per lane (1 = plain tick;
    # a K-wide multiprobe line search rides the SAME storage read and the
    # same MXU passes — extra candidate rows are nearly free here, unlike
    # the stacked XLA GEMV where the MXU pads K to 128 lanes)
    dot_acc = acc_dtype if dot_acc is None else dot_acc
    offs = tri_tile_offsets(nt)
    fwdM, fwdC = [], []
    accM = jnp.zeros((K, m), acc_dtype)
    accC = jnp.zeros((K, m), acc_dtype)
    for r in range(nt):
        L = nt - r
        c0 = offs[r] * t
        seg = read(0, c0, 2 * t, c0 + L * t).astype(cdt)     # (2t, L t)
        u_c = jax.lax.slice(u_row, (0, r * t), (K, m))       # (K, L t)
        # forward: y[r] += [M; C]-segment applied to u's blocks r..nt-1
        P = jax.lax.dot_general(
            u_c, seg, (((1,), (1,)), ((), ())),
            preferred_element_type=dot_acc).astype(acc_dtype)  # (K, 2t)
        fwdM.append(jax.lax.slice(P, (0, 0), (K, t)))
        fwdC.append(jax.lax.slice(P, (0, t), (K, 2 * t)))
        if L > 1:
            # transposed application of the strictly-upper tiles (the
            # diagonal tile — the segment's first t columns — is
            # full-symmetric already and excluded by the static slice)
            u_r = jax.lax.slice(u_row, (0, r * t), (K, (r + 1) * t))
            QM = jax.lax.dot_general(
                u_r, jax.lax.slice(seg, (0, t), (t, L * t)),
                (((1,), (0,)), ((), ())),
                preferred_element_type=dot_acc).astype(acc_dtype)
            QC = jax.lax.dot_general(
                u_r, jax.lax.slice(seg, (t, t), (2 * t, L * t)),
                (((1,), (0,)), ((), ())),
                preferred_element_type=dot_acc).astype(acc_dtype)
            z = jnp.zeros((K, (r + 1) * t), acc_dtype)
            accM = accM + jnp.concatenate([z, QM], axis=1)
            accC = accC + jnp.concatenate([z, QC], axis=1)
    accM = accM + jnp.concatenate(fwdM, axis=1)
    accC = accC + jnp.concatenate(fwdC, axis=1)
    return accM, accC


def make_tri_pool_matvec(tri: jnp.ndarray, nt: int, out_dtype,
                         interpret=None, dot_acc=None):
    """Batched per-lane dual matvec over flat-triangle pool storage.

    tri: (P, 2t, S) storage (int8/bf16/f32). Returns
    ``bmv(idx, U) -> (MU, CU)`` with idx (B,) int32 lane -> pool row and
    U (B, m): one pallas_call computes every lane's (M u, C u), streaming
    each lane's OWN problem's triangle HBM -> VMEM exactly once per tick
    (grid (B,); the lane's pool index rides scalar prefetch into the tri
    BlockSpec index_map). Per-tick HBM traffic: B * (m^2 + m t) / 2 ...
    precisely B * 2t * S bytes = ~half the dense stacked pool's B * 2 m^2.

    All contractions are MXU dot_generals on static-shape segments; u and
    the (B, 2m) f32 output stay VMEM-resident across the whole grid.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, two_t, S = tri.shape
    t = two_t // 2
    m = nt * t
    assert S == tri_ncols(nt, t), (S, nt, t)
    is_int8 = tri.dtype == jnp.int8
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE
    cdt = jnp.bfloat16 if is_int8 else tri.dtype
    # f64 storage (the CPU bit-parity mode) must accumulate in f64; every
    # reduced-precision storage accumulates in f32 (as make_stacked_matvec)
    acc_dtype = jnp.float64 if tri.dtype == jnp.float64 else jnp.float32
    scale = jnp.asarray(1.0 / _INT8_SCALE if is_int8 else 1.0, acc_dtype)
    if interpret is None:
        interpret = _use_interpret()

    def kernel(idx_ref, tri_ref, u_ref, out_ref):
        del idx_ref  # consumed by the tri BlockSpec index_map
        tri_row = tri_ref[...]  # one whole-block VMEM load (measured
        # faster than per-segment ref slices: overlapping segment reads
        # re-issue VMEM loads, and Mosaic pipelines the single big load)

        def read(r0, c0, r1, c1):
            return jax.lax.slice(tri_row, (r0, c0), (r1, c1))

        accM, accC = _seg_matvec_lane(read, u_ref[0], nt, t, cdt,
                                      acc_dtype, dot_acc)
        out_ref[0] = jnp.concatenate([accM, accC], axis=1)

    # the storage rides as a 2D (P * 2t, S) view with (2t, S) blocks: the
    # natural 3D (1, 2t, S) block over (P, 2t, S) int8 delivers CORRUPTED
    # data when P > 1 (measured round 5: ~2e-2 errors against the stacked
    # oracle for ANY index pattern incl. constant 0, while P = 1 is exact
    # to 1e-5 — a Mosaic block-fetch defect on leading-axis-indexed 3D
    # int8 operands). The reshape is layout-free and the 2D path measures
    # exact.
    tri2 = tri.reshape(P * two_t, S)

    def bmv(idx, U):
        """U: (B, m) plain tick, or (B, K, m) K-wide multiprobe candidate
        rows per lane. Returns (MU, CU) of matching shape."""
        B = U.shape[0]
        mp = U.ndim == 3
        K = U.shape[1] if mp else 1
        # each lane gets its own (1, K, m) u block / (1, K, 2m) out block:
        # a singleton-row block at a DYNAMIC sublane offset of a (B, m)
        # array is untileable (Mosaic needs 8-aligned sublane starts), but
        # a leading lane axis is un-tiled and indexes freely
        Ub = U.astype(cdt).reshape(B, K, m)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((two_t, S), lambda b, idx_ref:
                             (idx_ref[b], 0)),
                pl.BlockSpec((1, K, m), lambda b, idx_ref: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, K, 2 * m),
                                   lambda b, idx_ref: (b, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, K, 2 * m), acc_dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * m * m * B * K,
                bytes_accessed=B * two_t * S * tri.dtype.itemsize,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(jnp.asarray(idx, jnp.int32), tri2, Ub)
        y = (out * scale).astype(out_dtype)
        if not mp:
            return y[:, 0, :m], y[:, 0, m:]
        return y[:, :, :m], y[:, :, m:]

    return bmv


def repack_stacked_tiles(MC: jnp.ndarray, t: int) -> jnp.ndarray:
    """Dense stacked (2m, m) [M; C] -> tile-major triangle (T, 2t, t).

    The tile-batched layout for :func:`make_tri_pool_matvec_tiles`: tile k
    (row r_k, col c_k in :func:`tri_coords` order) is the stacked pair
    [M[r t:(r+1)t, c t:(c+1)t]; C[...]]."""
    two_m, m = MC.shape
    assert two_m == 2 * m and m % t == 0, (MC.shape, t)
    nt = m // t
    rs, cs, _ = tri_coords(nt)
    tiles = []
    for r, c in zip(rs, cs):
        Mt = jax.lax.slice(MC, (r * t, c * t), ((r + 1) * t, (c + 1) * t))
        Ct = jax.lax.slice(MC, (m + r * t, c * t),
                           (m + (r + 1) * t, (c + 1) * t))
        tiles.append(jnp.concatenate([Mt, Ct], axis=0))
    return jnp.stack(tiles)


def _tile_assembly(nt: int, dtype):
    """Static 0/1 assembly operators mapping per-tile products to output
    blocks: fwd[r, k] = 1 iff tile k lives in row r; trn[c, k] = 1 iff
    tile k is strictly-upper in column c (diagonal tiles excluded — their
    symmetric content is complete in the forward application)."""
    rs, cs, _ = tri_coords(nt)
    T = len(rs)
    fwd = np.zeros((nt, T), np.float32)
    trn = np.zeros((nt, T), np.float32)
    for k, (r, c) in enumerate(zip(rs, cs)):
        fwd[r, k] = 1.0
        if r != c:
            trn[c, k] = 1.0
    return jnp.asarray(fwd, dtype), jnp.asarray(trn, dtype)


def make_tri_pool_matvec_tiles(tri: jnp.ndarray, nt: int, out_dtype,
                               interpret=None):
    """Tile-batched per-lane dual matvec: 3 batched MXU contractions/lane.

    .. warning:: EXPERIMENTAL — measured WRONG on real TPU hardware
       (round 5): the T-batched M=1 dot_generals come back with errors
       ~0.3 through Mosaic while interpret mode is exact, and the solve
       stage measured 2x slower than the flat-segment kernel besides.
       Kept for future Mosaic versions; production uses
       :func:`make_tri_pool_matvec` (the flat-segment kernel).

    tri: (P, T, 2t, t) tile-major storage (:func:`repack_stacked_tiles`
    layout). The flat-segment kernel (make_tri_pool_matvec) issues ~3 nt
    small matmuls per lane; at pool-sized problems (nt ~ 4-8 blocks) the
    per-matmul fixed cost dominates the tick. Here the kernel body is
    exactly THREE T-batched dot_generals on the resident tile block —
    forward tiles, transposed M-halves, transposed C-halves — and every
    gather/scatter (u blocks per tile, products to output rows/columns,
    diagonal-tile exclusion) is hoisted OUTSIDE the pallas_call into XLA
    as tiny static einsums over (B, T, ...) arrays, where they fuse.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, T, two_t, t = tri.shape
    m = nt * t
    assert T == nt * (nt + 1) // 2, (T, nt)
    is_int8 = tri.dtype == jnp.int8
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE
    cdt = jnp.bfloat16 if is_int8 else tri.dtype
    acc_dtype = jnp.float64 if tri.dtype == jnp.float64 else jnp.float32
    scale = jnp.asarray(1.0 / _INT8_SCALE if is_int8 else 1.0, acc_dtype)
    if interpret is None:
        interpret = _use_interpret()
    rs, cs, _ = tri_coords(nt)
    rs_j = jnp.asarray(rs)
    cs_j = jnp.asarray(cs)
    fwd_asm, trn_asm = _tile_assembly(nt, acc_dtype)

    def kernel(idx_ref, tri_ref, ugc_ref, ugr_ref, of_ref, om_ref, oc_ref):
        del idx_ref
        tr = tri_ref[0].astype(cdt)                   # (T, 2t, t)
        ugc = ugc_ref[0]                              # (T, 1, t)
        ugr = ugr_ref[0]
        # forward: tile (r, c) applied to u's block c -> row r's (1, 2t)
        of_ref[0] = jax.lax.dot_general(
            ugc, tr, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=acc_dtype)         # (T, 1, 2t)
        trM = tr[:, :t, :]
        trC = tr[:, t:, :]
        # transposed: tile' applied to u's block r -> column c's (1, t)
        om_ref[0] = jax.lax.dot_general(
            ugr, trM, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dtype)         # (T, 1, t)
        oc_ref[0] = jax.lax.dot_general(
            ugr, trC, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dtype)

    def bmv(idx, U):
        B = U.shape[0]
        Ub = U.astype(cdt).reshape(B, nt, t)
        ugc = Ub[:, cs_j][:, :, None, :]              # (B, T, 1, t)
        ugr = Ub[:, rs_j][:, :, None, :]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, T, two_t, t), lambda b, i: (i[b], 0, 0, 0)),
                pl.BlockSpec((1, T, 1, t), lambda b, i: (b, 0, 0, 0)),
                pl.BlockSpec((1, T, 1, t), lambda b, i: (b, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, T, 1, 2 * t), lambda b, i: (b, 0, 0, 0)),
                pl.BlockSpec((1, T, 1, t), lambda b, i: (b, 0, 0, 0)),
                pl.BlockSpec((1, T, 1, t), lambda b, i: (b, 0, 0, 0)),
            ],
        )
        of, om, oc = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, T, 1, 2 * t), acc_dtype),
                jax.ShapeDtypeStruct((B, T, 1, t), acc_dtype),
                jax.ShapeDtypeStruct((B, T, 1, t), acc_dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * m * m * B,
                bytes_accessed=B * T * two_t * t * tri.dtype.itemsize,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(jnp.asarray(idx, jnp.int32), tri, ugc, ugr)
        # static assembly (fuses in XLA): rows collect forward products,
        # columns collect strictly-upper transposed products
        yf = jnp.einsum("rk,bko->bro", fwd_asm, of[:, :, 0, :])  # (B,nt,2t)
        ym = jnp.einsum("ck,bko->bco", trn_asm, om[:, :, 0, :])  # (B,nt,t)
        yc = jnp.einsum("ck,bko->bco", trn_asm, oc[:, :, 0, :])
        MU = (yf[:, :, :t] + ym).reshape(B, m)
        CU = (yf[:, :, t:] + yc).reshape(B, m)
        return ((MU * scale).astype(out_dtype),
                (CU * scale).astype(out_dtype))

    return bmv


def make_tri_pool_matvec_tiles_xla(tri: jnp.ndarray, nt: int, out_dtype):
    """XLA fallback for the tile-major layout (CPU tests / virtual meshes):
    same batched contractions and assembly, with a materialized per-lane
    tile gather instead of the scalar-prefetch index_map."""
    P, T, two_t, t = tri.shape
    m = nt * t
    is_int8 = tri.dtype == jnp.int8
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE
    cdt = jnp.bfloat16 if is_int8 else tri.dtype
    acc_dtype = jnp.float64 if tri.dtype == jnp.float64 else jnp.float32
    scale = jnp.asarray(1.0 / _INT8_SCALE if is_int8 else 1.0, acc_dtype)
    rs, cs, _ = tri_coords(nt)
    rs_j = jnp.asarray(rs)
    cs_j = jnp.asarray(cs)
    fwd_asm, trn_asm = _tile_assembly(nt, acc_dtype)

    def bmv(idx, U):
        B = U.shape[0]
        tr = tri[idx].astype(cdt)                     # (B, T, 2t, t)
        Ub = U.astype(cdt).reshape(B, nt, t)
        ugc = Ub[:, cs_j]                             # (B, T, t)
        ugr = Ub[:, rs_j]
        of = jnp.einsum("bkot,bkt->bko", tr, ugc,
                        preferred_element_type=acc_dtype)   # (B, T, 2t)
        om = jnp.einsum("bkst,bks->bkt", tr[:, :, :t, :], ugr,
                        preferred_element_type=acc_dtype)   # (B, T, t)
        oc = jnp.einsum("bkst,bks->bkt", tr[:, :, t:, :], ugr,
                        preferred_element_type=acc_dtype)
        yf = jnp.einsum("rk,bko->bro", fwd_asm, of.astype(acc_dtype))
        ym = jnp.einsum("ck,bko->bco", trn_asm, om.astype(acc_dtype))
        yc = jnp.einsum("ck,bko->bco", trn_asm, oc.astype(acc_dtype))
        MU = (yf[:, :, :t] + ym).reshape(B, m)
        CU = (yf[:, :, t:] + yc).reshape(B, m)
        return ((MU * scale).astype(out_dtype),
                (CU * scale).astype(out_dtype))

    return bmv


def make_tri_pool_matvec_xla(tri: jnp.ndarray, nt: int, out_dtype):
    """XLA fallback with identical semantics (CPU tests / virtual meshes).

    The per-lane tri[idx] gather materializes (B, 2t, S) every tick — fine
    on a CPU host, wasteful on TPU (use the Pallas kernel there).
    """
    P, two_t, S = tri.shape
    t = two_t // 2
    m = nt * t
    is_int8 = tri.dtype == jnp.int8
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE
    cdt = jnp.bfloat16 if is_int8 else tri.dtype
    acc_dtype = jnp.float64 if tri.dtype == jnp.float64 else jnp.float32
    scale = jnp.asarray(1.0 / _INT8_SCALE if is_int8 else 1.0, acc_dtype)

    def one(tri_row, uK):
        def read(r0, c0, r1, c1):
            return jax.lax.slice(tri_row, (r0, c0), (r1, c1))

        return _seg_matvec_lane(read, uK.astype(cdt), nt, t, cdt,
                                acc_dtype)

    def bmv(idx, U):
        """U: (B, m) or (B, K, m) multiprobe candidates (see the Pallas
        kernel's contract)."""
        mp = U.ndim == 3
        U2 = U if mp else U[:, None, :]
        MU, CU = jax.vmap(one)(tri[idx], U2)
        MU = (MU * scale).astype(out_dtype)
        CU = (CU * scale).astype(out_dtype)
        return (MU, CU) if mp else (MU[:, 0], CU[:, 0])

    return bmv


def build_tri_pallas(invariant: PairwiseInvariant, P1s, P2s, As, m_trues,
                     *, t: int = 256, affinityeps: float = 1e-4,
                     storage_dtype=jnp.int8):
    """Batched fused build straight into flat-triangle storage.

    P1s/P2s: (W, m_pad, d) gathered endpoints; As: (W, m_pad, 2) (pad -1);
    m_trues: (W,) i32. Returns (W, 2t, S) storage. Each grid program
    evaluates ONE upper tile's scores + masks + quantization and writes its
    (2t, t) [M; C] column — half the score evaluations AND half the HBM
    writes of the dense fused build (ops/affinity_pallas.py), which is the
    direct answer to round 4's build-floor finding ("chase write
    structure"): the cheapest write is the one not issued.

    Same mask semantics as affinity_pallas.score_consistency_stored_pallas
    (reference: src/clipper.cpp:35-64); tile coordinates ride scalar
    prefetch so the 1D upper-tile grid needs no lower-triangle skip logic.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE

    W, m_pad, d = P1s.shape
    assert m_pad % t == 0, (m_pad, t)
    nt = m_pad // t
    S = tri_ncols(nt, t)
    rs, cs, offs = tri_coords(nt)
    T = len(rs)
    is_int8 = jnp.dtype(storage_dtype) == jnp.int8

    score_block_t = getattr(invariant, "score_block_t", None)
    if score_block_t is None:
        raise ValueError(
            "build_tri_pallas needs invariant.score_block_t; use "
            "build_tri_xla for invariants without it")
    if not getattr(invariant, "symmetric", False):
        raise ValueError("build_tri_pallas requires a symmetric invariant")

    # pre-transposed column operands, as in the dense fused build (a
    # (t, 1) -> (1, t) in-kernel transpose is a cross-lane shuffle)
    P1t = jnp.swapaxes(P1s, 1, 2)
    P2t = jnp.swapaxes(P2s, 1, 2)
    Ast = jnp.swapaxes(As, 1, 2)
    mts = jnp.asarray(m_trues, jnp.int32)

    def kernel(rs_ref, cs_ref, offs_ref, mt_ref, P1r_ref, P1ct_ref,
               P2r_ref, P2ct_ref, Ar_ref, Act_ref, out_ref):
        w = pl.program_id(0)
        k = pl.program_id(1)
        scores = score_block_t(P1r_ref[0], P1ct_ref[0],
                               P2r_ref[0], P2ct_ref[0])
        Ar = Ar_ref[0]
        Act = Act_ref[0]
        distinct = ~(
            (jax.lax.slice_in_dim(Ar, 0, 1, axis=1)
             == jax.lax.slice_in_dim(Act, 0, 1, axis=0))
            | (jax.lax.slice_in_dim(Ar, 1, 2, axis=1)
               == jax.lax.slice_in_dim(Act, 1, 2, axis=0)))
        gr = rs_ref[k] * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        gc = cs_ref[k] * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        lim = mt_ref[w]
        keep = (distinct & (gr != gc) & (gr < lim) & (gc < lim)
                & (scores > affinityeps))
        if is_int8:
            Mq = jnp.clip(jnp.round(jnp.where(keep, scores, 0.0)
                                    * _INT8_SCALE), 0, 127)
            Cq = jnp.where(keep, _INT8_SCALE, 0.0)
        else:
            Mq = jnp.where(keep, scores, 0.0)
            Cq = jnp.where(keep, 1.0, 0.0)
        out_ref[0, :t, :] = Mq.astype(storage_dtype)
        out_ref[0, t:, :] = Cq.astype(storage_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(W, T),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda w, k, rs_r, cs_r, o_r, mt_r:
                         (w, rs_r[k], 0)),
            pl.BlockSpec((1, d, t), lambda w, k, rs_r, cs_r, o_r, mt_r:
                         (w, 0, cs_r[k])),
            pl.BlockSpec((1, t, d), lambda w, k, rs_r, cs_r, o_r, mt_r:
                         (w, rs_r[k], 0)),
            pl.BlockSpec((1, d, t), lambda w, k, rs_r, cs_r, o_r, mt_r:
                         (w, 0, cs_r[k])),
            pl.BlockSpec((1, t, 2), lambda w, k, rs_r, cs_r, o_r, mt_r:
                         (w, rs_r[k], 0)),
            pl.BlockSpec((1, 2, t), lambda w, k, rs_r, cs_r, o_r, mt_r:
                         (w, 0, cs_r[k])),
        ],
        out_specs=pl.BlockSpec((1, 2 * t, t),
                               lambda w, k, rs_r, cs_r, o_r, mt_r:
                               (w, 0, o_r[k])),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, 2 * t, S), storage_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(jnp.asarray(rs), jnp.asarray(cs), jnp.asarray(offs), mts,
      P1s, P1t, P2s, P2t, As, Ast)


def build_tri_pallas_fused(invariant: PairwiseInvariant, P1s, P2s, As,
                           m_trues, *, t: int = 256,
                           affinityeps: float = 1e-4,
                           storage_dtype=jnp.int8):
    """One-GRID-PROGRAM-per-problem fused flat-triangle build.

    build_tri_pallas runs one program per (problem, tile); at the headline
    shapes the per-program fixed cost dominates the build (round 4's
    write-floor ablation: the grid floor sat 4.6x above the plain-XLA
    write). Here grid = (W,) and the kernel computes ALL T upper tiles of
    its problem in one statically-unrolled loop: the endpoint operands are
    the problem's whole (m_pad, d) arrays (a few KB — every tile slices
    them statically) and the output is one contiguous (2t, S) write.
    Same masks/quantization as build_tri_pallas (bit-identical, tested).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from clipper_tpu.solvers.msrc_flat import _INT8_SCALE

    W, m_pad, d = P1s.shape
    assert m_pad % t == 0, (m_pad, t)
    nt = m_pad // t
    S = tri_ncols(nt, t)
    rs, cs, offs = tri_coords(nt)
    is_int8 = jnp.dtype(storage_dtype) == jnp.int8

    score_block_t = getattr(invariant, "score_block_t", None)
    if score_block_t is None or not getattr(invariant, "symmetric", False):
        raise ValueError("build_tri_pallas_fused requires a symmetric "
                         "invariant with score_block_t")

    P1t = jnp.swapaxes(P1s, 1, 2)
    P2t = jnp.swapaxes(P2s, 1, 2)
    Ast = jnp.swapaxes(As, 1, 2)
    mts = jnp.asarray(m_trues, jnp.int32)

    def kernel(mt_ref, P1r_ref, P1ct_ref, P2r_ref, P2ct_ref, Ar_ref,
               Act_ref, out_ref):
        w = pl.program_id(0)
        lim = mt_ref[w]
        for k in range(len(rs)):
            r, c, off = int(rs[k]), int(cs[k]), int(offs[k])
            scores = score_block_t(
                P1r_ref[0, r * t:(r + 1) * t, :],
                P1ct_ref[0, :, c * t:(c + 1) * t],
                P2r_ref[0, r * t:(r + 1) * t, :],
                P2ct_ref[0, :, c * t:(c + 1) * t])
            Ar = Ar_ref[0, r * t:(r + 1) * t, :]
            Act = Act_ref[0, :, c * t:(c + 1) * t]
            distinct = ~(
                (jax.lax.slice_in_dim(Ar, 0, 1, axis=1)
                 == jax.lax.slice_in_dim(Act, 0, 1, axis=0))
                | (jax.lax.slice_in_dim(Ar, 1, 2, axis=1)
                   == jax.lax.slice_in_dim(Act, 1, 2, axis=0)))
            gr = r * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            gc = c * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            keep = (distinct & (gr != gc) & (gr < lim) & (gc < lim)
                    & (scores > affinityeps))
            if is_int8:
                Mq = jnp.clip(jnp.round(jnp.where(keep, scores, 0.0)
                                        * _INT8_SCALE), 0, 127)
                Cq = jnp.where(keep, _INT8_SCALE, 0.0)
            else:
                Mq = jnp.where(keep, scores, 0.0)
                Cq = jnp.where(keep, 1.0, 0.0)
            out_ref[0, :t, off * t:(off + 1) * t] = Mq.astype(storage_dtype)
            out_ref[0, t:, off * t:(off + 1) * t] = Cq.astype(storage_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, m_pad, d), lambda w, mt: (w, 0, 0)),
            pl.BlockSpec((1, d, m_pad), lambda w, mt: (w, 0, 0)),
            pl.BlockSpec((1, m_pad, d), lambda w, mt: (w, 0, 0)),
            pl.BlockSpec((1, d, m_pad), lambda w, mt: (w, 0, 0)),
            pl.BlockSpec((1, m_pad, 2), lambda w, mt: (w, 0, 0)),
            pl.BlockSpec((1, 2, m_pad), lambda w, mt: (w, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * t, S), lambda w, mt: (w, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, 2 * t, S), storage_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(mts, P1s, P1t, P2s, P2t, As, Ast)


def build_tri_xla(invariant: PairwiseInvariant, D1, D2, A, m_true, *,
                  t: int = 256, affinityeps: float = 1e-4,
                  storage_dtype=jnp.int8):
    """Single-problem XLA build: dense direct-to-storage build + repack.

    The correctness baseline (bit-identical content to the stacked build,
    tests cross-check the Pallas build against it) and the off-TPU path.
    D1/D2/A unpadded per-problem arrays as in score_consistency_stored;
    storage_dtype=None keeps the invariant's full working precision.
    """
    if storage_dtype is None:
        from clipper_tpu.ops.affinity import score_pairwise_consistency
        M, C = score_pairwise_consistency(invariant, D1, D2, A,
                                          affinityeps=affinityeps,
                                          m_true=m_true)
        MC = jnp.concatenate([M, C], axis=0)
    else:
        from clipper_tpu.ops.affinity import score_consistency_stored
        MC = score_consistency_stored(invariant, D1, D2, A,
                                      affinityeps=affinityeps,
                                      m_true=m_true,
                                      storage_dtype=storage_dtype)
    return repack_stacked(MC, t)
