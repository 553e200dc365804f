"""Block-sparse (occupied-tile) storage for the dual matvec.

Measured fact (BENCH.md round 2): on the UNIFORM-outlier bunny protocol the
affinity nonzeros are spread uniformly (density ~13% at rho=0.9), so every
128x128 tile is occupied — block-sparse storage cannot win there and the
dense int8 stacked GEMV is the floor. But real association workloads are
often STRUCTURED: multi-object scenes, multi-session maps, and batched
loop-closure candidates put consistent pairs in blocks (associations of
object k are only geometrically consistent with object k), leaving most
tiles of M exactly zero. This module exploits that structure: keep only the
occupied (row, col) tiles of the stacked [M; C] storage, gather the matching
u slice per tile, run one batched (2t, t) x (t,) contraction, and
scatter-add the per-tile products into the output. Hot-loop HBM traffic
drops by the tile-occupancy factor on top of int8's 4x vs f32.

M and C share their off-diagonal sparsity pattern exactly (C is the keep
mask of M — ops/affinity.py score_pairwise_consistency), so a tile of the
stacked [M; C] pair is zero iff its M tile is zero; one occupancy scan
serves both halves.

The reference covers this capability axis with element-sparse storage
(reference: include/clipper/types.h:19-22 SparseMatrix<double>,
src/clipper.cpp:61-64 upper-triangle sparse M). CSR gathers are hostile to
the MXU, so the TPU-native answer is tile granularity with an automatic
dense fallback when occupancy is high (``from_dense``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from clipper_tpu.solvers import msrc_flat


class BlockSparseMC(NamedTuple):
    """Occupied tiles of the stacked [M; C] matrix (a jax pytree).

    tiles: (T, 2t, t) storage — tile k holds rows [rows[k]*t, rows[k]*t + t)
        of M stacked over the same rows of C, columns [cols[k]*t, ...).
    rows, cols: (T,) int32 tile coordinates (tile units, not elements).
    """
    tiles: jnp.ndarray
    rows: jnp.ndarray
    cols: jnp.ndarray

    @property
    def tile(self) -> int:
        return self.tiles.shape[2]


def _pad_to_tiles(X: np.ndarray, t: int) -> np.ndarray:
    m = X.shape[0]
    m_pad = -(-m // t) * t
    if m_pad == m:
        return X
    return np.pad(X, ((0, m_pad - m), (0, m_pad - m)))


def from_dense(M, C, tile: int = 128, storage_dtype=jnp.int8,
               max_occupancy: float = 0.5
               ) -> Tuple[Optional[BlockSparseMC], dict]:
    """Host-side build: dense (M, C) -> occupied-tile storage, or fallback.

    Returns (bs, info). ``bs`` is None when tile occupancy exceeds
    ``max_occupancy`` — at high occupancy the gather/scatter overhead beats
    the byte saving, so callers should use the dense stacked storage
    (``info["dense"]``, prepared in the same storage dtype) instead.
    info always carries {"occupancy", "n_tiles", "nt", "m", "m_pad"}.

    Build is host-side (numpy) because the occupied-tile count is
    data-dependent — a jitted build would need a static worst-case T. The
    target use case is single large problems where the build is amortized
    over hundreds of solver ticks.
    """
    M = np.asarray(M)
    C = np.asarray(C)
    m = M.shape[0]
    t = int(tile)
    Mp = _pad_to_tiles(M, t)
    Cp = _pad_to_tiles(C, t)
    m_pad = Mp.shape[0]
    nt = m_pad // t

    # occupancy scan on M only: C = pattern(M) off-diagonal, so C tiles are
    # occupied exactly where M tiles are (all-zero M tile => all-zero C tile)
    occ = (Mp.reshape(nt, t, nt, t).any(axis=(1, 3)))
    rows, cols = np.nonzero(occ)
    occupancy = float(len(rows)) / (nt * nt)
    info = {"occupancy": occupancy, "n_tiles": int(len(rows)),
            "nt": nt, "m": m, "m_pad": m_pad}

    stacked = np.concatenate([Mp, Cp], axis=0)  # (2*m_pad, m_pad)
    if occupancy > max_occupancy:
        MC = jnp.asarray(stacked, jnp.float32)
        if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8:
            info["dense"] = msrc_flat.quantize_stacked(MC)
        elif storage_dtype is not None:
            info["dense"] = MC.astype(storage_dtype)
        else:
            info["dense"] = MC
        return None, info

    # gather occupied tiles, M half stacked over the C half per tile
    tiles = np.empty((len(rows), 2 * t, t), np.float32)
    for k, (r, c) in enumerate(zip(rows, cols)):
        tiles[k, :t] = Mp[r * t:(r + 1) * t, c * t:(c + 1) * t]
        tiles[k, t:] = Cp[r * t:(r + 1) * t, c * t:(c + 1) * t]
    tiles = jnp.asarray(tiles)
    if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8:
        tiles = msrc_flat.quantize_stacked(tiles)
    elif storage_dtype is not None:
        tiles = tiles.astype(storage_dtype)
    bs = BlockSparseMC(tiles=tiles,
                       rows=jnp.asarray(rows, jnp.int32),
                       cols=jnp.asarray(cols, jnp.int32))
    return bs, info


def from_scipy(M, C, tile: int = 128, storage_dtype=jnp.int8,
               max_occupancy: float = 0.5
               ) -> Tuple[Optional[BlockSparseMC], dict]:
    """Sparse-input tile build: scipy matrices -> occupied-tile storage.

    Unlike :func:`from_dense`, a dense (m, m) is NEVER materialized on the
    sparse path — tiles are scattered directly from the COO triplets, so
    host memory is O(nnz + T * tile^2). This is the product path behind
    ``Clipper.set_sparse_matrix_data`` for genuinely sparse problems
    (the reference accepts sparse input end-to-end:
    include/clipper/clipper.h:139-143, src/clipper.cpp:61-64).

    M, C: scipy.sparse matrices, FULL symmetric with zero diagonal (the
    facade symmetrizes the reference's upper-triangle input convention).
    Occupied tiles are the union of M's and C's tile patterns. Only when
    occupancy > max_occupancy does the fallback densify (at that point
    dense storage is the right representation anyway; ``info["dense"]``).
    """
    import scipy.sparse as sp

    M = sp.coo_matrix(M)
    C = sp.coo_matrix(C)
    m = M.shape[0]
    t = int(tile)
    m_pad = -(-m // t) * t
    nt = m_pad // t

    def tile_ids(X):
        return (X.row // t).astype(np.int64) * nt + (X.col // t)

    occ_ids = np.unique(np.concatenate([tile_ids(M), tile_ids(C)]))
    T = len(occ_ids)
    occupancy = float(T) / (nt * nt)
    info = {"occupancy": occupancy, "n_tiles": T, "nt": nt,
            "m": m, "m_pad": m_pad}

    if occupancy > max_occupancy:
        stacked = np.zeros((2 * m_pad, m_pad), np.float32)
        stacked[:m, :m] = M.toarray()
        stacked[m_pad:m_pad + m, :m] = C.toarray()
        MC = jnp.asarray(stacked)
        if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8:
            info["dense"] = msrc_flat.quantize_stacked(MC)
        elif storage_dtype is not None:
            info["dense"] = MC.astype(storage_dtype)
        else:
            info["dense"] = MC
        return None, info

    tile_of = {int(g): k for k, g in enumerate(occ_ids)}  # tile id -> slot
    tiles = np.zeros((T, 2 * t, t), np.float32)

    def scatter(X, half):
        ids = tile_ids(X)
        slots = np.fromiter((tile_of[int(g)] for g in ids), np.int64,
                            count=len(ids))
        tiles[slots, half * t + X.row % t, X.col % t] = X.data

    scatter(M, 0)
    scatter(C, 1)
    tiles = jnp.asarray(tiles)
    if storage_dtype is not None and jnp.dtype(storage_dtype) == jnp.int8:
        tiles = msrc_flat.quantize_stacked(tiles)
    elif storage_dtype is not None:
        tiles = tiles.astype(storage_dtype)
    bs = BlockSparseMC(tiles=tiles,
                       rows=jnp.asarray(occ_ids // nt, jnp.int32),
                       cols=jnp.asarray(occ_ids % nt, jnp.int32))
    return bs, info


def make_matvec(bs: BlockSparseMC, nt: int, out_dtype):
    """Dual matvec u -> (M u, C u) over occupied-tile storage.

    Drop-in for :func:`msrc_flat.make_stacked_matvec`: same (Mu, Cu)
    contract over the PADDED size m_pad = nt * tile (padded entries of u
    must be zero — they have no edges, the same inertness argument as
    parallel.sharded.pad_problem). Call inside jit with ``bs`` passed as an
    argument (axon rejects large closure constants — CLAUDE.md).
    """
    t = bs.tiles.shape[2]
    m = nt * t

    def mv(u):
        """u: (m,) or (m, K) candidate columns (multiprobe line search)."""
        vec = u.ndim == 1
        U = u[:, None] if vec else u
        K = U.shape[1]
        ug = U.reshape(nt, t, K)[bs.cols]                  # (T, t, K) gather
        if bs.tiles.dtype == jnp.int8:
            lhs = bs.tiles.astype(jnp.bfloat16)
            rhs = ug.astype(jnp.bfloat16)
            scale = jnp.asarray(1.0 / msrc_flat._INT8_SCALE, jnp.float32)
        else:
            lhs = bs.tiles
            rhs = ug.astype(bs.tiles.dtype)
            scale = jnp.asarray(1.0, jnp.float32)
        prod = jax.lax.dot_general(                         # (T, 2t, K)
            lhs, rhs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        acc = jnp.zeros((nt, 2 * t, K), jnp.float32).at[bs.rows].add(prod)
        y = acc.astype(out_dtype)
        yM = y[:, :t].reshape(m, K)
        yC = y[:, t:].reshape(m, K)
        return (yM[:, 0], yC[:, 0]) if vec else (yM, yC)

    return mv


def solve_single(M, C, u0, params=None, *, tile: int = 128,
                 storage_dtype=jnp.int8, max_occupancy: float = 0.5,
                 probes: int = 1, power_steps: int = 0):
    """End-to-end single-problem solve over block-sparse (or fallback dense)
    storage: pad, build tiles host-side, run the flat solver, unpad.

    Returns (u, F, ifinal, info) with info from :func:`from_dense`. F is the
    solver's in-loop objective in the storage precision; callers should
    re-polish in full precision before rounding, as the dense pipelines do.
    """
    bs, info = from_dense(M, C, tile=tile, storage_dtype=storage_dtype,
                          max_occupancy=max_occupancy)
    u, F, ifinal = solve_prepared(bs, info, u0, params, probes=probes,
                                  power_steps=power_steps)
    return u, F, ifinal, info


def solve_prepared(bs: Optional[BlockSparseMC], info: dict, u0,
                   params=None, *, probes: int = 1, power_steps: int = 0):
    """Run the flat solver over prepared tile (or fallback dense) storage.

    (bs, info) from :func:`from_dense` / :func:`from_scipy` — build once,
    solve many times (multistart, warm restarts) with no rebuild.
    Returns (u, F, ifinal); F is the in-loop storage-precision objective.
    """
    from clipper_tpu.types import Params
    if params is None:
        params = Params()
    m = info["m"]
    m_pad = info["m_pad"]
    u0p = jnp.pad(jnp.asarray(u0), (0, m_pad - m))

    if bs is None:
        u, F, ifinal = _solve_dense(info["dense"], u0p, params=params,
                                    probes=probes, power_steps=power_steps)
    else:
        u, F, ifinal = _solve_block(bs, u0p, nt=info["nt"], params=params,
                                    probes=probes, power_steps=power_steps)
    return u[:m], F, ifinal


def solve_prepared_multi(bs: Optional[BlockSparseMC], info: dict, u0s,
                         params=None, *, probes: int = 1,
                         power_steps: int = 0):
    """Batched multistart over prepared storage: ONE device program for all
    K restarts (vmapped lanes over the shared tiles) instead of K separate
    dispatches — through the remote device tunnel each dispatch costs a
    flat ~23 ms fetch, so the K-loop alternative pays K x that in pure
    latency. u0s: (K, m). Returns (us, Fs, ifinals) with us (K, m).
    """
    from clipper_tpu.types import Params
    if params is None:
        params = Params()
    m = info["m"]
    m_pad = info["m_pad"]
    u0ps = jnp.pad(jnp.asarray(u0s), ((0, 0), (0, m_pad - m)))

    if bs is None:
        us, Fs, ifinals = _solve_dense_multi(
            info["dense"], u0ps, params=params, probes=probes,
            power_steps=power_steps)
    else:
        us, Fs, ifinals = _solve_block_multi(
            bs, u0ps, nt=info["nt"], params=params, probes=probes,
            power_steps=power_steps)
    return us[:, :m], Fs, ifinals


@functools.partial(jax.jit, static_argnames=("params", "probes",
                                             "power_steps"))
def _solve_dense_multi(MC, u0ps, *, params, probes, power_steps):
    mv = msrc_flat.make_stacked_matvec(MC, u0ps.dtype)
    return jax.vmap(
        lambda u0p: _run_flat(mv, u0p, params, probes, power_steps))(u0ps)


@functools.partial(jax.jit, static_argnames=("nt", "params", "probes",
                                             "power_steps"))
def _solve_block_multi(bs, u0ps, *, nt, params, probes, power_steps):
    mv = make_matvec(bs, nt, u0ps.dtype)
    return jax.vmap(
        lambda u0p: _run_flat(mv, u0p, params, probes, power_steps))(u0ps)


def _run_flat(mv, u0p, params, probes, power_steps):
    if power_steps:
        u0p = msrc_flat.power_init(mv, u0p, power_steps)
    if probes > 1:
        return msrc_flat.flat_solve_single_multiprobe(
            mv, u0p, params, probes=probes)
    return msrc_flat.flat_solve_single(mv, u0p, params)


@functools.partial(jax.jit, static_argnames=("params", "probes",
                                             "power_steps"))
def _solve_dense(MC, u0p, *, params, probes, power_steps):
    mv = msrc_flat.make_stacked_matvec(MC, u0p.dtype)
    return _run_flat(mv, u0p, params, probes, power_steps)


@functools.partial(jax.jit, static_argnames=("nt", "params", "probes",
                                             "power_steps"))
def _solve_block(bs, u0p, *, nt, params, probes, power_steps):
    mv = make_matvec(bs, nt, u0p.dtype)
    return _run_flat(mv, u0p, params, probes, power_steps)
