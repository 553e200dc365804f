"""Symmetric-triangle tile storage: 2x single-chip capacity for huge problems.

M and C are symmetric; dense stacked [M; C] storage (msrc_flat) keeps both
triangles, so the per-chip HBM ceiling for a single problem is
2 m^2 bytes (int8) — m = 81,920 on a 16 GB v5e. This module stores only the
upper-triangle TILES (row-block <= col-block): m^2 + m t bytes, lifting the
single-chip ceiling past m = 114,688 — a problem size whose dense f64
affinity matrix alone would need 105 GB on the reference's single node
(reference: src/clipper.cpp:29 allocates the full m x m before
sparsification; the published operating point is m = 1000).

Layout: nt = m / t row/column blocks; tiles are ordered diagonal-first
(k = 0..nt-1 is block (k, k)), then strictly-upper row-major. Each stored
tile is the stacked (2t, t) [M-tile; C-tile] pair (int8 = quantize_stacked
scaling), so M and C ride one read.

The dual matvec applies each off-diagonal tile twice — forward
(y_rows += T @ u_cols) and transposed (y_cols += T' @ u_rows), both
MXU batched matmuls over the tile list — processed ``mv_chunk`` tiles per
fori_loop step so the (chunk, 2t, K) matmul products never materialize at
full T. Per-tick HBM traffic is ~2x the stored bytes (each tile read for
both directions) — the same bytes/tick as dense storage at equal m, i.e.
the triangle trades no speed for half the memory; a one-read-two-matmul
Pallas kernel could reclaim the factor (see BENCH.md round-3 notes).

Everything (build included) runs on device under jit with static shapes;
the build writes tiles directly in the storage dtype, chunk of tiles at a
time (the same never-materialize-full-precision discipline as
parallel/sharded._affinity_block_stored).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.solvers import msrc, msrc_flat
from clipper_tpu.types import Rounding


def tile_coords(nt: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (rows, cols) block coordinates: nt diagonal tiles first,
    then the strictly-upper triangle row-major. len = nt (nt + 1) / 2."""
    rows = [k for k in range(nt)]
    cols = [k for k in range(nt)]
    for r in range(nt):
        for c in range(r + 1, nt):
            rows.append(r)
            cols.append(c)
    return np.asarray(rows, np.int32), np.asarray(cols, np.int32)


def _divisor_at_most(n: int, k: int) -> int:
    k = max(1, min(n, k))
    while n % k:
        k -= 1
    return k


def shard_tile_coords(nt: int, D: int) -> Tuple[np.ndarray, np.ndarray]:
    """Upper-triangle tile coordinates padded to a multiple of D so the
    tile list splits evenly across D devices (contiguous slices under a 1D
    mesh sharding). Padding slots carry the INERT coordinate (nt, nt):
    their global row/col indices are >= m_pad, so the build's validity mask
    zeroes the whole tile, and the matvec's windowed scatter drops their
    (zero) products out of bounds."""
    rows, cols = tile_coords(nt)
    T = len(rows)
    T_pad = -(-T // D) * D
    if T_pad != T:
        pad = np.full(T_pad - T, nt, np.int32)
        rows = np.concatenate([rows, pad])
        cols = np.concatenate([cols, pad])
    return rows, cols


def _tile_scores(invariant: PairwiseInvariant, P1b, P2b, Ab, r, c,
                 m_true, t: int, affinityeps: float):
    """Masked full-precision scores of block (r, c): the f32 M tile.

    Shared by the quantizing build and the exact chunked objective so both
    see bit-identical score values (reference semantics:
    src/clipper.cpp:35-55)."""
    P1r, P1c = P1b[r], P1b[c]
    P2r, P2c = P2b[r], P2b[c]
    Ar, Ac = Ab[r], Ab[c]
    scores = invariant.score_block(P1r, P1c, P2r, P2c)
    distinct = ~((Ar[:, 0, None] == Ac[None, :, 0])
                 | (Ar[:, 1, None] == Ac[None, :, 1]))
    gr = r * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    gc = c * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    keep = (distinct & (gr != gc) & (gr < m_true) & (gc < m_true)
            & (scores > affinityeps))
    return scores, keep


def exact_objective(invariant: PairwiseInvariant, P1, P2, A, u, m_true,
                    tile: int = 128, affinityeps: float = 1e-4,
                    chunk: int = 256, rows=None, cols=None,
                    partial: bool = False):
    """F = u'(M + I)u computed exactly in f32 by chunked tile rebuild.

    O(chunk t^2) transient memory at any m — the support-overflow fallback
    for the triangle storage: when a converged clique is wider than the
    top-k polish window, the truncated objective silently shrinks
    omega = round(F) (the bug class first hit at m=65,536, BENCH.md
    round 2; the symmetric-triangle path hit it again at m=114,688 with
    cliques ~4,600 wide in round 3). Scores are recomputed tile-by-tile in
    full precision — one extra build-cost pass, paid only when triggered.
    """
    m_pad, d = P1.shape
    t = int(tile)
    nt = m_pad // t
    if rows is None:
        # rows/cols: explicit tile coordinates for the sharded engine
        # (each device sums only its local slice); partial=True returns
        # the local quadratic sum WITHOUT the identity term so the caller
        # can psum partials and add u'u once on the replicated iterate
        rows_np, cols_np = tile_coords(nt)
        rows = jnp.asarray(rows_np)
        cols = jnp.asarray(cols_np)
    T = rows.shape[0]
    P1b = P1.reshape(nt, t, d)
    P2b = P2.reshape(nt, t, d)
    Ab = A.reshape(nt, t, 2)
    Ub = u.astype(jnp.float32).reshape(nt, t)

    def one_quad(r, c):
        scores, keep = _tile_scores(invariant, P1b, P2b, Ab, r, c,
                                    m_true, t, affinityeps)
        Mt = jnp.where(keep, scores, 0.0).astype(jnp.float32)
        q = Ub[jnp.minimum(r, nt - 1)] @ (Mt @ Ub[jnp.minimum(c, nt - 1)])
        # off-diagonal tiles represent both (r, c) and its transpose;
        # inert padding slots (r = c = nt) have all-zero Mt -> q = 0
        return jnp.where(r == c, q, 2.0 * q)

    ch = _divisor_at_most(T, chunk)
    vquad = jax.vmap(one_quad)

    def body(kk, acc):
        s = kk * ch
        r = jax.lax.dynamic_slice_in_dim(rows, s, ch)
        c = jax.lax.dynamic_slice_in_dim(cols, s, ch)
        return acc + jnp.sum(vquad(r, c))

    F = jax.lax.fori_loop(0, T // ch, body, jnp.zeros((), jnp.float32))
    if partial:
        return F
    # identity term on the f32 blocks (Ub), not u's working dtype: with a
    # bf16 iterate the exact-overflow fallback must not reintroduce the
    # low-precision accumulation it exists to avoid
    return F + jnp.vdot(Ub, Ub)


def build_symtiles(invariant: PairwiseInvariant, P1, P2, A, m_true,
                   tile: int = 128, affinityeps: float = 1e-4,
                   storage_dtype=jnp.int8, build_chunk: int = 256):
    """(T, 2t, t) stacked upper-triangle tiles, built on device in storage
    precision, ``build_chunk`` tiles per step.

    P1/P2: (m_pad, d) gathered endpoints (m_pad a multiple of tile; pad
    with zeros — padded entries are masked inert exactly as
    parallel.sharded.pad_problem). A: (m_pad, 2) associations (pad -1).
    Requires a symmetric invariant (both built-ins); the full matrix it
    represents is tile(r,c) + tile(c,r)^T with the diagonal tiles' strict
    lower halves ignored (they are masked to the symmetric value anyway).

    Reference semantics: masks from src/clipper.cpp:35-55; C = pattern(M)
    from src/clipper.cpp:63-64.
    """
    m_pad, d = P1.shape
    t = int(tile)
    assert m_pad % t == 0, (m_pad, t)
    nt = m_pad // t
    rows_np, cols_np = tile_coords(nt)
    P1b = P1.reshape(nt, t, d)
    P2b = P2.reshape(nt, t, d)
    Ab = A.reshape(nt, t, 2)
    return _build_tiles_at(invariant, P1b, P2b, Ab, jnp.asarray(rows_np),
                           jnp.asarray(cols_np), m_true, t, affinityeps,
                           storage_dtype, build_chunk)


def _build_tiles_at(invariant, P1b, P2b, Ab, rows, cols, m_true, t,
                    affinityeps, storage_dtype, build_chunk):
    """Build the stacked tiles at explicit (rows, cols) block coordinates —
    the core shared by the full-triangle build and the sharded engine
    (each device builds only its local coordinate slice). Inert padding
    coordinates (see :func:`shard_tile_coords`) produce all-zero tiles via
    the validity mask."""
    T = rows.shape[0]
    is_int8 = jnp.dtype(storage_dtype) == jnp.int8

    def one_tile(r, c):
        scores, keep = _tile_scores(invariant, P1b, P2b, Ab, r, c,
                                    m_true, t, affinityeps)
        if is_int8:
            from clipper_tpu.solvers.msrc_flat import _INT8_SCALE
            Mq = jnp.clip(jnp.round(jnp.where(keep, scores, 0.0)
                                    * _INT8_SCALE), 0, 127).astype(jnp.int8)
            Cq = jnp.where(keep, jnp.int8(127), jnp.int8(0))
        else:
            Mq = jnp.where(keep, scores, 0.0).astype(storage_dtype)
            Cq = keep.astype(storage_dtype)
        return jnp.concatenate([Mq, Cq], axis=0)       # (2t, t)

    chunk = _divisor_at_most(T, build_chunk)
    vtile = jax.vmap(one_tile)
    buf = jnp.zeros((T, 2 * t, t), storage_dtype)

    def body(kk, buf):
        s = kk * chunk
        r = jax.lax.dynamic_slice_in_dim(rows, s, chunk)
        c = jax.lax.dynamic_slice_in_dim(cols, s, chunk)
        return jax.lax.dynamic_update_slice(buf, vtile(r, c), (s, 0, 0))

    return jax.lax.fori_loop(0, T // chunk, body, buf)


def make_sym_dual_matvec(tiles, nt: int, out_dtype, mv_chunk: int = 4096,
                         rows=None, cols=None, axis_name=None):
    """u -> (M u, C u) over upper-triangle tile storage.

    Accepts (m,) vectors or (m, K) multiprobe candidates. Forward and
    transposed tile applications are MXU-batched over ``mv_chunk`` tiles
    per fori_loop step; diagonal tiles (the first nt) skip the transpose
    (their strict-lower content mirrors in-tile).

    rows/cols: explicit tile coordinates matching ``tiles`` (default: the
    full diagonal-first triangle ordering). Inert padding slots at
    (nt, nt) are dropped by the windowed scatter. axis_name: when the tile
    list is SHARDED over a mesh axis (each device holding a coordinate
    slice — see :func:`solve_sharded_sym`), psum the accumulated
    (nt, 2t, K) products over that axis so every device returns the full
    (M u, C u); u must be replicated.
    """
    T, two_t, t = tiles.shape
    m = nt * t
    if rows is None:
        rows_np, cols_np = tile_coords(nt)
        rows = jnp.asarray(rows_np)
        cols = jnp.asarray(cols_np)

    if tiles.dtype == jnp.int8:
        scale = jnp.asarray(1.0 / msrc_flat._INT8_SCALE, jnp.float32)

        def prep(tl):
            return tl.astype(jnp.bfloat16)

        def cast_u(x):
            return x.astype(jnp.bfloat16)
    else:
        scale = jnp.asarray(1.0, jnp.float32)

        def prep(tl):
            return tl

        def cast_u(x):
            return x.astype(tiles.dtype)

    chunk = _divisor_at_most(T, mv_chunk)
    nchunks = T // chunk

    def mv(u):
        vec = u.ndim == 1
        U = u[:, None] if vec else u
        K = U.shape[1]
        Ub = cast_u(U.reshape(nt, t, K))

        def body(kk, acc):
            s = kk * chunk
            tl = prep(jax.lax.dynamic_slice_in_dim(tiles, s, chunk))
            r = jax.lax.dynamic_slice_in_dim(rows, s, chunk)
            c = jax.lax.dynamic_slice_in_dim(cols, s, chunk)
            u_c = Ub[jnp.minimum(c, nt - 1)]              # (chunk, t, K)
            u_r = Ub[jnp.minimum(r, nt - 1)]
            # forward: (chunk, 2t, t) @ (chunk, t, K) -> (chunk, 2t, K)
            P = jax.lax.dot_general(
                tl, u_c, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc = acc.at[r].add(P, mode="drop")
            # transposed application T' @ u_r for both halves in one dot:
            # view the stacked tile as (chunk, 2, t, t) and contract its
            # ROW axis with u_r -> (chunk, 2, t, K). Strictly-upper tiles
            # only (diagonal tiles hold the full symmetric tile already);
            # masked by `off`. Inert padding slots (r = c = nt) are zero
            # tiles whose scatter drops out of bounds either way.
            off = (r != c).astype(jnp.float32)[:, None, None]
            tl4 = tl.reshape(chunk, 2, t, t)
            Q = jax.lax.dot_general(
                tl4, u_r, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (chunk, 2, t, K)
            return acc.at[c].add(Q.reshape(chunk, 2 * t, K) * off,
                                 mode="drop")

        acc = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((nt, 2 * t, K), jnp.float32))
        if axis_name is not None:
            acc = jax.lax.psum(acc, axis_name)
        y = (acc * scale).astype(out_dtype)
        Mu = y[:, :t].reshape(m, K)
        Cu = y[:, t:].reshape(m, K)
        return (Mu[:, 0], Cu[:, 0]) if vec else (Mu, Cu)

    return mv


def make_sym_dual_matvec_pallas(tiles, nt: int, out_dtype,
                                tiles_block: int = 8):
    """One-read Pallas symmetric dual matvec: u -> (M u, C u).

    The XLA tile matvec (:func:`make_sym_dual_matvec`) reads every
    off-diagonal tile TWICE per tick — once forward, once for the
    transposed application — because XLA materializes each dot_general's
    operand stream independently. This kernel streams each (2t, t) int8
    tile HBM -> VMEM exactly ONCE and issues both MXU contractions from
    the resident copy, so per-tick HBM traffic is the stored triangle
    (~m^2 int8 bytes): 2x less than the dense stacked storage at equal m
    AND 2x less than the XLA triangle matvec. The replicated u blocks and
    the (nt, K, 2t) f32 accumulator live in VMEM for the whole grid
    (K <= 8 fits comfortably); tile coordinates ride SMEM per step.

    Layout choices (TPU tiling constraints, pallas_guide.md):
      * u is laid out (nt, K, t) so a tile's u-block slice is (K, t) with
        the 128-lane minor dim = t — no lane-padding blowup for K = 1;
      * the accumulator is (nt, K, 2t); forward adds at block r, the
        transposed halves add at block c's [0:t] / [t:2t] lanes;
      * both contractions contract a 128-multiple dim on the MXU
        (forward: u_c (K,t) x tile (2t,t) over t; transposed:
        u_r (K,t) x half (t,t) over the tile's ROW axis).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, two_t, t = tiles.shape
    m = nt * t
    TB = int(tiles_block)
    T_pad = -(-T // TB) * TB
    rows_np, cols_np = tile_coords(nt)
    coords_np = np.zeros((T_pad, 2), np.int32)
    coords_np[:T, 0] = rows_np
    coords_np[:T, 1] = cols_np
    # padding tiles are zero and map to the diagonal slot (0, 0): their
    # forward product adds 0 and the transpose is masked by r == c
    coords = jnp.asarray(coords_np)
    if T_pad != T:
        tiles = jnp.pad(tiles, ((0, T_pad - T), (0, 0), (0, 0)))

    is_int8 = tiles.dtype == jnp.int8
    scale = jnp.asarray(1.0 / msrc_flat._INT8_SCALE if is_int8 else 1.0,
                        jnp.float32)
    cdt = jnp.bfloat16 if is_int8 else tiles.dtype

    def kernel(coords_ref, tiles_ref, u_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for k in range(TB):
            r = coords_ref[k, 0]
            c = coords_ref[k, 1]
            tile_k = tiles_ref[k].astype(cdt)             # (2t, t)
            u_c = u_ref[c]                                # (K, t)
            # forward: y[r] += [M; C]-tile applied to u's block c
            P = jax.lax.dot_general(
                u_c, tile_k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (K, 2t)
            out_ref[r] += P

            @pl.when(r != c)
            def _():
                # transposed application from the SAME resident tile
                u_r = u_ref[r]                            # (K, t)
                QM = jax.lax.dot_general(
                    u_r, tile_k[:t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (K, t)
                QC = jax.lax.dot_general(
                    u_r, tile_k[t:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[c, :, :t] += QM
                out_ref[c, :, t:] += QC

    def mv(u):
        vec = u.ndim == 1
        U = u[:, None] if vec else u
        K = U.shape[1]
        Ub = U.T.reshape(K, nt, t).transpose(1, 0, 2).astype(cdt)

        out = pl.pallas_call(
            kernel,
            grid=(T_pad // TB,),
            in_specs=[
                pl.BlockSpec((TB, 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TB, two_t, t), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, K, t), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nt, K, 2 * t), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, K, 2 * t), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * m * m * K,
                bytes_accessed=T_pad * two_t * t * tiles.dtype.itemsize,
                transcendentals=0),
            interpret=jax.default_backend() != "tpu",
        )(coords, tiles, Ub)

        y = (out * scale).astype(out_dtype)               # (nt, K, 2t)
        Mu = y[:, :, :t].transpose(0, 2, 1).reshape(m, K)
        Cu = y[:, :, t:].transpose(0, 2, 1).reshape(m, K)
        return (Mu[:, 0], Cu[:, 0]) if vec else (Mu, Cu)

    return mv


def solve_single(invariant: PairwiseInvariant, D1, D2, A, u0,
                 params=None, *, tile: int = 128, affinityeps: float = 1e-4,
                 storage_dtype=jnp.int8, probes: int = 1,
                 power_steps: int = 0, support: int = 512,
                 build_chunk: int = 256, mv_chunk: int = 4096,
                 matvec: str = "auto", d_scale: float = 1.0):
    """End-to-end single-problem solve over symmetric-triangle storage.

    The capacity configuration for one chip: build tiles on device in
    storage precision, run the flat solver (optionally multiprobe), polish
    the objective in full precision on u's top-``support`` entries
    (pool.support_objective — exact for converged supports), return
    (u, F, ifinal). Memory: m^2 + m t storage bytes + O(mv_chunk t^2)
    transient — m = 114,688 int8 fits a 16 GB v5e.

    matvec: 'auto' | 'pallas' | 'xla' — tick matvec backend. 'pallas' is
    the one-read kernel (make_sym_dual_matvec_pallas): each stored tile is
    streamed HBM -> VMEM once per tick and both the forward and transposed
    MXU contractions issue from the resident copy — ~half the per-tick HBM
    traffic of the XLA tile matvec, which reads every off-diagonal tile
    twice. 'auto' picks pallas on a TPU backend (elsewhere the kernel
    would run in interpret mode, so auto falls back to XLA).
    """
    from clipper_tpu.types import Params
    if params is None:
        params = Params()

    A = jnp.asarray(A, jnp.int32)
    m = A.shape[0]
    t = int(tile)
    m_pad = -(-m // t) * t
    P1 = jnp.asarray(D1)[A[:, 0]]
    P2 = jnp.asarray(D2)[A[:, 1]]
    u0 = jnp.asarray(u0, P1.dtype)
    pad = m_pad - m
    if pad:
        P1 = jnp.pad(P1, ((0, pad), (0, 0)))
        P2 = jnp.pad(P2, ((0, pad), (0, 0)))
        u0 = jnp.pad(u0, (0, pad))
        A = jnp.pad(A, ((0, pad), (0, 0)), constant_values=-1)
    nt = m_pad // t

    if matvec == "auto":
        # the Pallas kernel runs in (slow) interpret mode off-TPU
        matvec = "pallas" if jax.default_backend() == "tpu" else "xla"
    u, F, ifinal = _solve_padded(
        invariant, P1, P2, A, u0, jnp.int32(m), params=params, tile=t,
        affinityeps=affinityeps,
        storage_dtype=jnp.dtype(storage_dtype).name,
        probes=probes, power_steps=power_steps, support=support,
        build_chunk=build_chunk, mv_chunk=mv_chunk, matvec=matvec,
        d_scale=d_scale)
    return u[:m], F, ifinal


@functools.partial(jax.jit, static_argnames=(
    "invariant", "params", "tile", "affinityeps", "storage_dtype", "probes",
    "power_steps", "support", "build_chunk", "mv_chunk", "matvec",
    "d_scale"))
def _solve_padded(invariant, P1, P2, A, u0, m_true, *, params, tile,
                  affinityeps, storage_dtype, probes, power_steps, support,
                  build_chunk, mv_chunk, matvec="xla", d_scale=1.0):
    from clipper_tpu.parallel.pool import support_objective

    storage = jnp.dtype(storage_dtype)
    m_pad = P1.shape[0]
    nt = m_pad // tile
    if matvec == "pallas":
        # row-chunked layout: the fast one-read kernel (~G tiles of slack
        # per short row — a few % of the triangle at G=32)
        G = min(32, nt)
        chunk_r, chunk_c0, _, _ = row_chunk_coords(nt, G)
        chunks = build_symchunks(invariant, P1, P2, A, m_true, tile=tile,
                                 G=G, affinityeps=affinityeps,
                                 storage_dtype=storage,
                                 build_chunk=max(1, build_chunk // G))
        mv = make_sym_dual_matvec_pallas_rows(chunks, chunk_r, chunk_c0,
                                              nt, u0.dtype)
    else:
        tiles = build_symtiles(invariant, P1, P2, A, m_true, tile=tile,
                               affinityeps=affinityeps, storage_dtype=storage,
                               build_chunk=build_chunk)
        mv = make_sym_dual_matvec(tiles, nt, u0.dtype, mv_chunk=mv_chunk)
    if power_steps:
        u0 = msrc_flat.power_init(mv, u0, power_steps)
    if probes > 1:
        u, F, ifinal = msrc_flat.flat_solve_single_multiprobe(
            mv, u0, params, probes=probes, d_scale=d_scale)
    else:
        u, F, ifinal = msrc_flat.flat_solve_single(mv, u0, params,
                                                   d_scale=d_scale)
    # full-precision objective polish (omega = round(F) needs accuracy
    # well under 0.5 — int8 in-loop F carries a systematic positive bias,
    # BENCH.md round 2). The top-k polish is exact only for supports <= k;
    # wider cliques take the in-graph chunked exact rebuild (scalar
    # lax.cond: the expensive branch runs only when overflow occurs)
    k = min(support, m_pad)
    nnz = jnp.sum(u > 0)
    F = jax.lax.cond(
        nnz > k,
        lambda: exact_objective(invariant, P1, P2, A, u, m_true,
                                tile=tile, affinityeps=affinityeps,
                                chunk=build_chunk),
        lambda: support_objective(invariant, P1, P2, A, u,
                                  affinityeps=affinityeps, k=k))
    return u, F, ifinal


# ----------------------------------------------------------------------
# row-chunked triangle storage: the fast Pallas layout
# ----------------------------------------------------------------------

def row_chunk_coords(nt: int, G: int):
    """Chunk descriptors for row-major triangle storage.

    Row-block r owns tiles (r, r..nt-1); they are stored CONTIGUOUSLY as
    ceil((nt - r)/G) chunks of G tiles each (short rows padded with inert
    (nt, nt) slots — zero tiles, see shard_tile_coords). Returns
    (chunk_r, chunk_c0) of shape (NC,) plus the flat per-tile (rows, cols)
    of shape (NC * G,) for the chunk-major build.

    Why this layout exists: the tile-list Pallas matvec spends ~0.25 us of
    sequential per-tile work (3 tiny matmuls + dynamic scatters) — at
    m=65,536 that is 131k tiles = ~33 ms/tick regardless of tiles_block
    (measured round 4: TB=8 and TB=32 both 35.4 ms). A chunk is ONE
    (2t, G t) operand: the kernel runs two big-contraction MXU matmuls per
    chunk instead of 3 G tiny ones.
    """
    chunk_r, chunk_c0, rows, cols = [], [], [], []
    for r in range(nt):
        c = r
        while c < nt:
            chunk_r.append(r)
            chunk_c0.append(c)
            for g in range(G):
                cc = c + g
                rows.append(r if cc < nt else nt)
                cols.append(cc if cc < nt else nt)
            c += G
    return (np.asarray(chunk_r, np.int32), np.asarray(chunk_c0, np.int32),
            np.asarray(rows, np.int32), np.asarray(cols, np.int32))


def build_symchunks(invariant: PairwiseInvariant, P1, P2, A, m_true,
                    tile: int = 128, G: int = 32,
                    affinityeps: float = 1e-4, storage_dtype=jnp.int8,
                    build_chunk: int = 8, chunk_coords=None):
    """(NC, 2t, G t) chunk-major triangle storage (see row_chunk_coords).

    Same per-tile scores/masks/quantization as build_symtiles (shared
    _tile_scores); only the memory layout differs — each chunk stacks its
    G tiles side by side so the matvec reads one contiguous operand.
    """
    m_pad, d = P1.shape
    t = int(tile)
    assert m_pad % t == 0, (m_pad, t)
    nt = m_pad // t
    if chunk_coords is None:
        chunk_r, chunk_c0, _, _ = row_chunk_coords(nt, G)
    else:
        # explicit (possibly device-local) chunk descriptors — the sharded
        # engine builds only its slice of the chunk list
        chunk_r, chunk_c0 = chunk_coords
    NC = chunk_r.shape[0]
    crs = jnp.asarray(chunk_r)
    cc0s = jnp.asarray(chunk_c0)
    P1b = P1.reshape(nt, t, d)
    P2b = P2.reshape(nt, t, d)
    Ab = A.reshape(nt, t, 2)
    is_int8 = jnp.dtype(storage_dtype) == jnp.int8

    def one_tile(r, c):
        scores, keep = _tile_scores(invariant, P1b, P2b, Ab, r, c,
                                    m_true, t, affinityeps)
        if is_int8:
            from clipper_tpu.solvers.msrc_flat import _INT8_SCALE
            Mq = jnp.clip(jnp.round(jnp.where(keep, scores, 0.0)
                                    * _INT8_SCALE), 0, 127).astype(jnp.int8)
            Cq = jnp.where(keep, jnp.int8(127), jnp.int8(0))
        else:
            Mq = jnp.where(keep, scores, 0.0).astype(storage_dtype)
            Cq = keep.astype(storage_dtype)
        return jnp.concatenate([Mq, Cq], axis=0)       # (2t, t)

    def one_chunk(r, c0):
        return jnp.concatenate([one_tile(r, c0 + g) for g in range(G)],
                               axis=1)                 # (2t, G t)

    chunk = _divisor_at_most(NC, build_chunk)
    vchunk = jax.vmap(one_chunk)
    buf = jnp.zeros((NC, 2 * t, G * t), storage_dtype)

    def body(kk, buf):
        s = kk * chunk
        r = jax.lax.dynamic_slice_in_dim(crs, s, chunk)
        c0 = jax.lax.dynamic_slice_in_dim(cc0s, s, chunk)
        return jax.lax.dynamic_update_slice(buf, vchunk(r, c0), (s, 0, 0))

    return jax.lax.fori_loop(0, NC // chunk, body, buf)


def row_chunk_table(chunk_r, chunk_c0, nt: int) -> np.ndarray:
    """Row table for the rows kernel's in-kernel coordinate recovery.

    Layout (int32, length 2 nt + 3): S = table[0 : nt + 2] with
    S[r] = first chunk index whose row is >= r (S[nt + 1] = NC sentinel),
    then first_c0 = table[nt + 2 : 2 nt + 3] with first_c0[r] = c0 of row
    r's first chunk in THIS list. A chunk list may be any row-ordered
    slice of the canonical layout (a device-local shard starts mid-row;
    its first row's first_c0 encodes the offset); inert pad descriptors
    (r = nt) sort last by construction.
    """
    chunk_r = np.asarray(chunk_r, np.int32)
    chunk_c0 = np.asarray(chunk_c0, np.int32)
    NC = len(chunk_r)
    assert (np.diff(chunk_r) >= 0).all(), "chunks must be row-ordered"
    S = np.empty(nt + 2, np.int32)
    S[: nt + 1] = np.searchsorted(chunk_r, np.arange(nt + 1), side="left")
    S[nt + 1] = NC
    first_c0 = np.zeros(nt + 1, np.int32)
    for rr in range(nt + 1):
        if S[rr] < S[rr + 1]:   # row rr owns chunks (S[nt + 1] = NC cap)
            first_c0[rr] = chunk_c0[S[rr]]
    return np.concatenate([S, first_c0]).astype(np.int32)


def make_sym_dual_matvec_pallas_rows(chunks, chunk_r, chunk_c0, nt: int,
                                     out_dtype, table=None):
    """One-read row-chunked Pallas dual matvec: u -> (M u, C u).

    Per grid step (one chunk): stream the (2t, G t) stacked [M; C] chunk
    HBM -> VMEM once, then
      forward:    y[K, r t : r t + t]   (+= for both halves)
                  = u[:, c0 t : c0 t + G t] @ chunk'          (contract G t)
      transposed: y[K, c0 t : c0 t + G t]
                  += u[:, r t : r t + t] @ M-half              (contract t)
    Both contractions are MXU matmuls with 128-multiple contraction dims;
    u and the (K, 2 m_ext) accumulator live row-major in VMEM (K sublanes,
    m lanes — no lane-padding at K = 1, no in-kernel relayouts; every
    dynamic address is a static-size, dynamic-start slice). The diagonal
    tile (first tile of each row's first chunk) already holds the full
    symmetric content, so its transposed application is masked out.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NC, two_t, Gt = chunks.shape
    t = two_t // 2
    G = Gt // t
    m = nt * t
    m_ext = (nt + G) * t          # slack so pad-chunk slices stay in bounds
    # The kernel cannot carry per-chunk coords: a scalar-prefetch operand
    # costs ~256 B of SMEM PER SCALAR (measured: (4352, 2) i32 asked for
    # 2.2 MB of the 1 MB SMEM). Instead prefetch the O(nt) row table from
    # :func:`row_chunk_table` and recover (r, c0) from the program id by
    # in-kernel binary search — O(log nt) scalar SMEM reads per step.
    if table is None:
        table = jnp.asarray(row_chunk_table(chunk_r, chunk_c0, nt))
    n_srch = max(1, int(np.ceil(np.log2(nt + 1))) + 1)

    is_int8 = chunks.dtype == jnp.int8
    scale = jnp.asarray(1.0 / msrc_flat._INT8_SCALE if is_int8 else 1.0,
                        jnp.float32)
    cdt = jnp.bfloat16 if is_int8 else chunks.dtype

    def kernel(table_ref, chunk_ref, u_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        i = pl.program_id(0)
        # binary search S for r: S[lo] <= i < S[hi] invariant, init
        # lo = 0, hi = nt + 1 (S[nt + 1] = NC > i always)
        def srch(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            go = table_ref[mid] <= i
            return (jnp.where(go, mid, lo), jnp.where(go, hi, mid))

        lo, _ = jax.lax.fori_loop(
            0, n_srch, srch, (jnp.int32(0), jnp.int32(nt + 1)))
        r = jnp.minimum(lo, nt)                # pad rows clamp in-bounds
        c0 = table_ref[nt + 2 + r] + (i - table_ref[r]) * G
        c0 = jnp.clip(c0, 0, nt)               # pad chunks are zero tiles
        ch = chunk_ref[0].astype(cdt)                  # (2t, G t)
        u_c = u_ref[:, pl.dslice(c0 * t, Gt)]          # (K, G t)
        # forward: (K, G t) x (2t, G t) -> (K, 2t)
        P = jax.lax.dot_general(
            u_c, ch, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:, pl.dslice(r * t, t)] += P[:, :t]
        out_ref[:, pl.dslice(m_ext + r * t, t)] += P[:, t:]

        # transposed halves: (K, t) x (t, G t) -> (K, G t); the diagonal
        # tile (c0 == r, first t columns) is already complete in-forward
        u_r = u_ref[:, pl.dslice(r * t, t)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Gt), 1)
        keep = ((lane >= t) | (c0 != r)).astype(jnp.float32)
        QM = jax.lax.dot_general(
            u_r, ch[:t], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * keep
        QC = jax.lax.dot_general(
            u_r, ch[t:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * keep
        out_ref[:, pl.dslice(c0 * t, Gt)] += QM
        out_ref[:, pl.dslice(m_ext + c0 * t, Gt)] += QC

    def mv(u):
        vec = u.ndim == 1
        U = u[:, None] if vec else u
        K = U.shape[1]
        Ub = jnp.zeros((K, m_ext), cdt).at[:, :m].set(U.T.astype(cdt))

        # coords ride as a SCALAR-PREFETCH operand: available whole to the
        # kernel from SMEM without per-step windowing (a windowed SMEM
        # BlockSpec replicates the array ~64x and blows the 1 MB SMEM; the
        # prefetch mechanism is the standard route for data-dependent
        # addressing — same pattern as block-sparse kernels' block maps)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NC,),
            in_specs=[
                pl.BlockSpec((1, two_t, Gt), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((K, m_ext), lambda i, c: (0, 0)),
            ],
            out_specs=pl.BlockSpec((K, 2 * m_ext), lambda i, c: (0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, 2 * m_ext), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=4 * m * m * K,
                bytes_accessed=NC * two_t * Gt * chunks.dtype.itemsize,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )(table, chunks, Ub)

        y = (out * scale).astype(out_dtype)            # (K, 2 m_ext)
        Mu = y[:, :m].T
        Cu = y[:, m_ext:m_ext + m].T
        return (Mu[:, 0], Cu[:, 0]) if vec else (Mu, Cu)

    return mv


# ----------------------------------------------------------------------
# sharded symmetric-triangle engine: the tile LIST distributed over a mesh
# ----------------------------------------------------------------------

def build_symshard_pipeline(invariant: PairwiseInvariant, mesh,
                            params=None, *, tile: int = 128,
                            affinityeps: float = 1e-4,
                            storage_dtype=jnp.int8, probes: int = 1,
                            power_steps: int = 0, support: int = 1024,
                            build_chunk: int = 64, mv_chunk: int = 512,
                            matvec: str = "auto", G: int = 32,
                            d_scale: float = 1.0):
    """Compile the triangle-sharded pipeline over a 1D device mesh.

    Composition of the two capacity levers: symmetric-triangle tile storage
    (~half the bytes of dense stacked [M; C] — this module's single-chip
    win) SHARDED over the mesh — total storage m^2 + O(m t) bytes split
    evenly as contiguous slices of the diagonal-first tile list, so D
    devices hold ~m^2/D each, vs 2 m^2 / D for parallel.sharded's dense
    stacked blocks. The dual matvec is each device's local tile loop
    (forward + transposed application per stored tile, exactly
    :func:`make_sym_dual_matvec`) followed by ONE psum of the (nt, 2t, K)
    accumulator — 2 m K f32 elements, independent of D, riding ICI.
    Load is balanced by construction (equal tile counts per device; every
    tile costs the same two (2t, t) x (t, K) contractions).

    Answers the reference's single-node memory ceiling
    (reference: src/clipper.cpp:29) at m >= 200k: dense stacked block
    storage (parallel/sharded.py) needs 2 m^2 total bytes where this needs
    m^2 — the committed demonstration point is a problem the dense engine
    cannot hold at all (BENCH.md round 4).

    matvec: 'auto' | 'xla' | 'pallas' — the per-device local matvec.
    'pallas' is the row-chunked one-read kernel
    (make_sym_dual_matvec_pallas_rows) over this device's chunk slice,
    psum-reduced — the production multi-chip configuration; 'auto' picks
    it on TPU backends (off-TPU the kernel would run in interpret mode).
    The coordinate inputs differ by mode: 'xla' shards the flat tile list
    (rows, cols); 'pallas' shards the chunk descriptors AND the matching
    flat tile list (crs, cc0, rows, cols) — :func:`solve_sharded_sym`
    prepares both.

    Returns a jitted (<coords...>, P1, P2, A, u0, m_true) ->
    (u, F, ifinal, mask) over PADDED arrays; use :func:`solve_sharded_sym`
    for the end-to-end convenience wrapper.
    """
    from jax.sharding import PartitionSpec as P
    from clipper_tpu.parallel.pool import support_objective

    from clipper_tpu.types import Params
    if params is None:
        params = Params()
    if matvec == "auto":
        matvec = "pallas" if jax.default_backend() == "tpu" else "xla"
    axis = mesh.axis_names[0]
    D = mesh.shape[axis]
    t = int(tile)
    storage = jnp.dtype(storage_dtype)

    def body(*args):
        if matvec == "pallas":
            (crs_l, cc0_l, rows_l, cols_l, table_l,
             P1, P2, A, u0, m_true) = args
        else:
            rows_l, cols_l, P1, P2, A, u0, m_true = args
        m_pad, d = P1.shape
        nt = m_pad // t
        P1b = P1.reshape(nt, t, d)
        P2b = P2.reshape(nt, t, d)
        Ab = A.reshape(nt, t, 2)
        if matvec == "pallas":
            chunks = build_symchunks(
                invariant, P1, P2, A, m_true, tile=t, G=G,
                affinityeps=affinityeps, storage_dtype=storage,
                build_chunk=max(1, build_chunk // G),
                chunk_coords=(crs_l, cc0_l))
            mv_local = make_sym_dual_matvec_pallas_rows(
                chunks, crs_l, cc0_l, nt, u0.dtype, table=table_l)

            def mv(u):
                return jax.lax.psum(mv_local(u), axis)
        else:
            tiles = _build_tiles_at(invariant, P1b, P2b, Ab, rows_l,
                                    cols_l, m_true, t, affinityeps,
                                    storage, build_chunk)
            mv = make_sym_dual_matvec(tiles, nt, u0.dtype,
                                      mv_chunk=mv_chunk, rows=rows_l,
                                      cols=cols_l, axis_name=axis)
        if power_steps:
            u0i = msrc_flat.power_init(mv, u0, power_steps)
        else:
            u0i = u0
        if probes > 1:
            u, F, ifinal = msrc_flat.flat_solve_single_multiprobe(
                mv, u0i, params, probes=probes, d_scale=d_scale)
        else:
            u, F, ifinal = msrc_flat.flat_solve_single(mv, u0i, params,
                                                       d_scale=d_scale)

        # full-precision polish (omega = round(F) accuracy, see
        # _solve_padded). The predicate is computed from the REPLICATED u,
        # so every device takes the same lax.cond branch and the psum
        # stays collective-safe (same pattern as parallel.sharded).
        k = min(support, m_pad)
        nnz = jnp.sum(u > 0)

        def fast(_):
            Fs = support_objective(invariant, P1, P2, A, u,
                                   affinityeps=affinityeps, k=k,
                                   include_identity=False)
            return Fs / D                  # replicated; psum restores Fs

        def exact(_):
            return exact_objective(invariant, P1, P2, A, u, m_true,
                                   tile=t, affinityeps=affinityeps,
                                   chunk=build_chunk, rows=rows_l,
                                   cols=cols_l, partial=True)

        part = jax.lax.cond(nnz <= k, fast, exact, None)
        uf = u.astype(jnp.float32)
        F = (jax.lax.psum(part.astype(jnp.float32), axis)
             + jnp.dot(uf, uf)).astype(u.dtype)
        return u, F, ifinal

    ncoords = 5 if matvec == "pallas" else 2
    shmapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis),) * ncoords + (P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    rounding = params.rounding
    if rounding == Rounding.DSD:
        # this is a public standalone entry, so warn exactly as the pool
        # engines do (pool._pool_rounding); the Clipper facade's capacity
        # path reruns exact DSD host-side on the nonzero support instead
        import warnings
        warnings.warn(
            "solve_sharded_sym cannot run exact (host-side) DSD rounding "
            "in-graph; downgrading to Rounding.NONZERO — use the Clipper "
            "facade (engine='sharded') for exact DSD", stacklevel=2)
        rounding = Rounding.NONZERO

    @jax.jit
    def pipeline(*args):
        coords = args[:ncoords]
        P1, P2, A, u0, m_true = args[ncoords:]
        u, F, ifinal = shmapped(*coords, P1, P2, A, u0,
                                jnp.asarray(m_true, jnp.int32))
        mask = msrc.round_solution(u, F, rounding)
        return u, F, ifinal, mask

    return pipeline


def solve_sharded_sym(invariant: PairwiseInvariant, D1, D2, A, u0,
                      params=None, mesh=None, *, tile: int = 128,
                      affinityeps: float = 1e-4, storage_dtype=jnp.int8,
                      probes: int = 1, power_steps: int = 0,
                      support: int = 1024, build_chunk: int = 64,
                      mv_chunk: int = 512, matvec: str = "auto",
                      G: int = 32, d_scale: float = 1.0):
    """End-to-end triangle-sharded solve of one huge problem.

    D1/D2 are (n, d) row-major datasets; A is (m, 2); u0 is (m,). See
    :func:`build_symshard_pipeline` for the engine design. Returns a
    Solution (mask/u unpadded to m).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from clipper_tpu.types import Params, Solution
    if params is None:
        params = Params()
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("d",))
    axis = mesh.axis_names[0]
    D = mesh.shape[axis]
    t = int(tile)

    A = jnp.asarray(A, jnp.int32)
    m = A.shape[0]
    m_pad = -(-m // t) * t
    P1 = jnp.asarray(D1)[A[:, 0]]
    P2 = jnp.asarray(D2)[A[:, 1]]
    u0 = jnp.asarray(u0, P1.dtype)
    pad = m_pad - m
    if pad:
        P1 = jnp.pad(P1, ((0, pad), (0, 0)))
        P2 = jnp.pad(P2, ((0, pad), (0, 0)))
        u0 = jnp.pad(u0, (0, pad))
        A = jnp.pad(A, ((0, pad), (0, 0)), constant_values=-1)
    nt = m_pad // t

    if matvec == "auto":
        matvec = "pallas" if jax.default_backend() == "tpu" else "xla"
    tile_shard = NamedSharding(mesh, P(axis))
    if matvec == "pallas":
        # chunk descriptors + the matching flat tile list, both padded to
        # a D-multiple of chunks with inert (nt, nt) slots so the shards
        # stay chunk-aligned and contiguous
        crs, cc0s, trows, tcols = row_chunk_coords(nt, G)
        NC = len(crs)
        NC_pad = -(-NC // D) * D
        if NC_pad != NC:
            pad_c = np.full(NC_pad - NC, nt, np.int32)
            pad_t = np.full((NC_pad - NC) * G, nt, np.int32)
            crs = np.concatenate([crs, pad_c])
            cc0s = np.concatenate([cc0s, pad_c])
            trows = np.concatenate([trows, pad_t])
            tcols = np.concatenate([tcols, pad_t])
        # per-device row tables for the kernel's in-kernel (r, c0)
        # recovery (a device's slice starts mid-row; its table encodes
        # the offset), flattened so P(axis) hands each device its own
        NC_loc = NC_pad // D
        tables = np.concatenate([
            row_chunk_table(crs[dd * NC_loc:(dd + 1) * NC_loc],
                            cc0s[dd * NC_loc:(dd + 1) * NC_loc], nt)
            for dd in range(D)])
        coords = tuple(jax.device_put(jnp.asarray(x), tile_shard)
                       for x in (crs, cc0s, trows, tcols, tables))
    else:
        rows_np, cols_np = shard_tile_coords(nt, D)
        coords = (jax.device_put(jnp.asarray(rows_np), tile_shard),
                  jax.device_put(jnp.asarray(cols_np), tile_shard))

    pipeline = build_symshard_pipeline(
        invariant, mesh, params, tile=t, affinityeps=affinityeps,
        storage_dtype=storage_dtype, probes=probes, power_steps=power_steps,
        support=support, build_chunk=build_chunk, mv_chunk=mv_chunk,
        matvec=matvec, G=G, d_scale=d_scale)
    u, F, ifinal, mask = pipeline(*coords, P1, P2, A, u0, m)
    return Solution(ifinal=ifinal, mask=mask[:m], u0=u0[:m], u=u[:m],
                    score=F)
