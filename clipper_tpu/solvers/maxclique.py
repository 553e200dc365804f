"""Maximum-clique solver (exact / heuristic / k-core).

Mirrors the reference's method surface (reference: include/clipper/maxclique.h:15-25,
src/maxclique.cpp:47-147, which wraps the external PMC library):

  EXACT  — k-core prune + greedy-coloring branch & bound ("ROBIN*")
  HEU    — k-core-ordered greedy clique lower bound ("ROBIN" heuristic)
  KCORE  — vertices with core number >= max core ("ROBIN")

Exact search is inherently sequential-combinatorial, so it runs host-side in
C++ (clipper_tpu/native/maxclique.cpp, our own implementation); its top-level
branches are distributed over ``threads`` std::threads sharing an atomic
incumbent (same role as PMC's OpenMP search). KCORE is also
available as a jittable TPU op (clipper_tpu.ops.kcore). A pure-Python exact
fallback covers small graphs when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import dataclasses
import enum
from typing import List, Optional

import numpy as np

from clipper_tpu.native import build as native_build


class Method(enum.IntEnum):
    EXACT = 0
    HEU = 1
    KCORE = 2


@dataclasses.dataclass(frozen=True)
class Params:
    """reference: include/clipper/maxclique.h:17-23 (same defaults)."""

    method: Method = Method.EXACT
    threads: int = 24           # workers for the parallel exact B&B
    time_limit: int = 3600      # [s] cap on exact search
    verbose: bool = False


def solve(A: np.ndarray, params: Params = Params()) -> List[int]:
    """Max clique of the adjacency matrix A (nonzero = edge, diag ignored).

    Returns sorted vertex indices.
    """
    A = np.asarray(A)
    n = A.shape[0]
    adj = np.ascontiguousarray((A != 0), dtype=np.uint8)
    np.fill_diagonal(adj, 0)

    lib = native_build.load()
    if lib is not None:
        lib.mc_solve.restype = ctypes.c_int64
        lib.mc_solve.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_double, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        out = np.zeros(n, dtype=np.int64)
        num = lib.mc_solve(
            n, adj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(params.method), float(params.time_limit),
            max(1, int(params.threads)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return sorted(int(v) for v in out[:num])
    return _solve_python(adj, params)


def core_numbers(A: np.ndarray) -> np.ndarray:
    """Host-side core numbers via the native library (or Python fallback)."""
    A = np.asarray(A)
    n = A.shape[0]
    adj = np.ascontiguousarray((A != 0), dtype=np.uint8)
    np.fill_diagonal(adj, 0)
    lib = native_build.load()
    if lib is not None:
        lib.mc_core_numbers.restype = ctypes.c_int64
        lib.mc_core_numbers.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64)]
        core = np.zeros(n, dtype=np.int64)
        lib.mc_core_numbers(
            n, adj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            core.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return core
    return _core_numbers_python(adj)


# ----------------------------------------------------------------------------
# Python fallback
# ----------------------------------------------------------------------------


def _core_numbers_python(adj: np.ndarray) -> np.ndarray:
    n = adj.shape[0]
    deg = adj.sum(1).astype(np.int64)
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    k = 0
    while alive.any():
        peel = alive & (deg <= k)
        if not peel.any():
            k += 1
            continue
        core[peel] = k
        alive &= ~peel
        deg = (adj * alive[None, :]).sum(1)
    return core


def _solve_python(adj: np.ndarray, params: Params) -> List[int]:
    n = adj.shape[0]
    core = _core_numbers_python(adj)
    maxcore = core.max() if n else 0
    if params.method == Method.KCORE:
        return sorted(np.flatnonzero(core >= maxcore))

    # greedy heuristic
    order = np.argsort(-core, kind="stable")
    best: List[int] = []
    for s in order[: min(n, 64)]:
        if core[s] + 1 <= len(best):
            break
        clique = [int(s)]
        for u in order:
            if u == s:
                continue
            if all(adj[u, w] for w in clique):
                clique.append(int(u))
        if len(clique) > len(best):
            best = clique
    if params.method == Method.HEU:
        return sorted(best)

    if n > 128:
        raise RuntimeError("exact max clique without the native library is "
                           "limited to n <= 128")

    # simple exact B&B with coloring bound
    def expand(cand: List[int], current: List[int]):
        nonlocal best
        if not cand:
            if len(current) > len(best):
                best = list(current)
            return
        # greedy coloring bound
        classes: List[List[int]] = []
        color = {}
        for v in cand:
            for ci, cl in enumerate(classes):
                if not any(adj[v, u] for u in cl):
                    cl.append(v)
                    color[v] = ci + 1
                    break
            else:
                classes.append([v])
                color[v] = len(classes)
        ordered = sorted(cand, key=lambda v: color[v])
        for i in range(len(ordered) - 1, -1, -1):
            v = ordered[i]
            if len(current) + color[v] <= len(best):
                return
            nxt = [u for u in ordered[:i] if adj[v, u]]
            expand(nxt, current + [v])

    cand = [int(v) for v in range(n) if core[v] + 1 > len(best)]
    expand(cand, [])
    return sorted(best)
