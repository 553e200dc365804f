"""Clipper facade — the user-facing driver class.

Mirrors the conceptual surface of the reference CLIPPER class
(reference: include/clipper/clipper.h:78-183, Python surface
bindings/python/py_clipper.cpp:197-232) with the same snake_case method names
as ``clipperpy``. Data layout follows the reference: ``D1`` is (d, n1) with
data as *columns* (reference: include/clipper/clipper.h:88-90).

Differences by design (TPU-native):
  * Matrices are dense jnp arrays; "sparse" inputs are accepted as
    scipy.sparse or dense and densified.
  * Randomness is explicit: pass ``u0`` or a PRNG ``key`` to :meth:`solve`.
  * The solver runs jitted on the default JAX device; DSD rounding and the
    exact max-clique baseline run host-side.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clipper_tpu import utils
from clipper_tpu.invariants.base import PairwiseInvariant
from clipper_tpu.ops.affinity import build_affinity
from clipper_tpu.solvers import msrc
from clipper_tpu.types import Params, Rounding, Solution, as_association


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@functools.partial(jax.jit, static_argnames=("params",))
def _solve_multistart_jit(M, C, u0s, params):
    """Module-level jitted multistart entry: a jit wrapper created inside
    solve() would discard its compile cache on every call — minutes of
    retrace per invocation through the remote device tunnel (CLAUDE.md)."""
    from clipper_tpu.solvers import msrc_flat
    return msrc_flat.solve_multistart(M, C, u0s, params)


_CAPACITY_M = 8192      # 'auto' switches to the triangle engine at this m


class Clipper:
    def __init__(self, invariant: Optional[PairwiseInvariant],
                 params: Params = Params(), *, dtype=None,
                 seed: Optional[int] = 0, engine: str = "auto",
                 mesh=None, engine_opts: Optional[dict] = None):
        """``seed`` controls the default randomness of :meth:`solve` when no
        ``u0``/``key`` is passed: call k of this instance uses
        ``PRNGKey(fold_in(seed, k))``, so repeated runs of the same program
        are REPRODUCIBLE by default (unlike the reference, whose default u0
        is time-seeded — reference: src/utils.cpp:22-29). Pass ``seed=None``
        to opt back into time-seeded non-reproducible draws.

        engine: 'auto' | 'dense' | 'triangle' | 'sharded' — the storage /
        execution engine :meth:`solve` uses for matrices built by
        :meth:`score_pairwise_consistency`:
          * 'dense' — materialized (m, m) M and C in working precision
            (the reference's representation, src/clipper.cpp:29);
          * 'triangle' — symmetric-triangle tile storage built on device
            in int8 (f64 working precision stores f64), solved by
            ops.symstore.solve_single — the single-chip capacity engine
            (m = 114,688 on one 16 GB chip, BENCH.md);
          * 'sharded' — the triangle storage SHARDED over ``mesh`` (default
            a 1D mesh of all local devices), solved by
            ops.symstore.solve_sharded_sym — the multi-chip 100k+ engine;
          * 'auto' — 'dense' below m = 8192, 'triangle' from there up.
        Injected matrices (set_matrix_data / set_sparse_matrix_data) always
        take their own dense/blocksparse paths. engine_opts are forwarded
        to the capacity engine (probes, power_steps, storage_dtype,
        support, tile, ...).
        """
        if engine not in ("auto", "dense", "triangle", "sharded"):
            raise ValueError(f"unknown engine {engine!r}")
        self.invariant = invariant
        self.params = params
        self.dtype = dtype or _default_dtype()
        self.seed = seed
        self.engine = engine
        self.mesh = mesh
        self.engine_opts = dict(engine_opts or {})
        self._nsolves = 0
        self._A: Optional[jnp.ndarray] = None   # (m, 2) putative associations
        self._M: Optional[jnp.ndarray] = None   # (m, m) zero-diag symmetric
        self._C: Optional[jnp.ndarray] = None   # (m, m) zero-diag symmetric 0/1
        self._soln: Optional[Solution] = None
        # sparse product path (set_sparse_matrix_data with scipy input):
        # symmetric scipy matrices + occupied-tile device storage; a dense
        # (m, m) is never materialized on this path
        self._M_sparse = None                    # scipy.sparse, symmetric
        self._C_sparse = None
        self._bs = None                          # ops.blocksparse storage
        self._bs_info: Optional[dict] = None
        # capacity-engine path (engine='triangle'/'sharded'): raw row-major
        # datasets retained for on-device tile builds; no dense (m, m)
        self._cap: Optional[dict] = None

    # ------------------------------------------------------------------
    # scoring
    # ------------------------------------------------------------------

    def score_pairwise_consistency(self, D1, D2, A=None) -> None:
        """Build affinity/constraint matrices from (d, n) column-major data.

        reference: src/clipper.cpp:21-65. Under a capacity engine
        ('triangle'/'sharded', or 'auto' at m >= 8192) no dense (m, m) is
        materialized here: the row-major datasets are retained and
        :meth:`solve` builds symmetric-triangle tile storage on device.
        """
        D1 = jnp.asarray(D1, self.dtype).T   # -> (n1, d) rows
        D2 = jnp.asarray(D2, self.dtype).T
        if A is not None and np.size(A) == 0:
            A = None
        m = (np.asarray(A).shape[0] if A is not None
             else D1.shape[0] * D2.shape[0])
        engine = self._resolve_engine(m)
        if engine in ("triangle", "sharded"):
            if A is None:
                from clipper_tpu.ops.affinity import create_all_to_all
                A = create_all_to_all(D1.shape[0], D2.shape[0])
            self._A = as_association(A)
            self._cap = {"engine": engine, "D1": D1, "D2": D2}
            self._M = self._C = None
            self._clear_sparse()
            return
        M, C, Aout = build_affinity(self.invariant, D1, D2, A,
                                    affinityeps=self.params.affinityeps,
                                    dtype=self.dtype)
        self._M, self._C, self._A = M, C, Aout
        self._cap = None
        self._clear_sparse()

    def _resolve_engine(self, m: int) -> str:
        if self.engine == "auto":
            return "dense" if m < _CAPACITY_M else "triangle"
        return self.engine

    # ------------------------------------------------------------------
    # solvers
    # ------------------------------------------------------------------

    def solve(self, u0=None, *, key: Optional[jax.Array] = None,
              multistart: int = 1) -> Solution:
        """Solve MSRC by graduated projected gradient ascent.

        reference: src/clipper.cpp:69-78. If no u0 is given, a U[0,1) random
        vector is drawn from ``key`` if passed, else from the instance's
        deterministic per-call key stream (see ``seed`` in ``__init__``;
        ``seed=None`` restores the reference's time-seeded behavior).

        multistart > 1 runs that many random inits in parallel on device and
        keeps the densest cluster found (highest F) — restarts are nearly
        free under batching and remove the local solver's init sensitivity
        (an extension; the reference solves from a single init). Passing
        BOTH an explicit ``u0`` and ``multistart > 1`` is contradictory
        (one deterministic init vs several random ones) and raises.

        If the matrices were injected sparse (``set_sparse_matrix_data``
        with scipy input at low tile occupancy), the solve runs over
        occupied-tile device storage and a dense (m, m) is never
        materialized (see ops.blocksparse).
        """
        self._require_matrices()
        if multistart > 1 and u0 is not None:
            raise ValueError(
                "solve(u0=..., multistart>1) is contradictory: an explicit "
                "u0 fixes the single init. Pass key=... to seed the "
                "multistart draws instead")
        if key is None:
            if self.seed is None:
                key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
            else:
                key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                         self._nsolves)
        self._nsolves += 1
        if self._bs_info is not None:
            return self._solve_sparse(u0, key, multistart)
        if self._cap is not None:
            return self._solve_capacity(u0, key, multistart)
        m = self._M.shape[0]
        t0 = time.perf_counter()
        if multistart > 1 and u0 is None:
            u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=self.dtype))(
                jax.random.split(key, multistart))
            soln = _solve_multistart_jit(self._M, self._C, u0s, self.params)
        else:
            if u0 is None:
                u0 = utils.randvec(key, m, dtype=self.dtype)
            u0 = jnp.asarray(u0, self.dtype)
            soln = msrc.solve_msrc(self._M, self._C, u0, self.params)
        soln.mask.block_until_ready()

        if self.params.rounding == Rounding.DSD:
            # exact densest-subgraph rounding on the NONZERO support
            # (reference: src/clipper.cpp:294-300); host-side combinatorial.
            from clipper_tpu.solvers import dsd
            S = list(np.flatnonzero(np.asarray(soln.u) > 0))
            nodes = dsd.solve(np.asarray(self._M), S)
            mask = np.zeros(m, dtype=bool)
            mask[nodes] = True
            soln = Solution(ifinal=soln.ifinal, mask=jnp.asarray(mask),
                            u0=soln.u0, u=soln.u, score=soln.score)
        soln.t = time.perf_counter() - t0
        self._soln = soln
        return soln

    def _solve_capacity(self, u0, key, multistart: int) -> Solution:
        """Solve through the symmetric-triangle capacity engines
        (ops/symstore.py): tile storage built on device in reduced
        precision, no dense (m, m) anywhere — single-chip 'triangle'
        (solve_single) or mesh-'sharded' (solve_sharded_sym). Answers the
        reference's single-node O(m^2)-doubles ceiling
        (reference: src/clipper.cpp:29) from the same facade surface
        (reference: include/clipper/clipper.h:78-183)."""
        from clipper_tpu.ops import symstore

        if multistart > 1:
            raise NotImplementedError(
                "multistart on the capacity engines is not supported; run "
                "separate solves with explicit keys (each solve rebuilds "
                "tile storage, so restarts are not near-free here)")
        engine = self._cap["engine"]
        D1, D2 = self._cap["D1"], self._cap["D2"]
        m = self._A.shape[0]
        t0 = time.perf_counter()
        if u0 is None:
            u0 = utils.randvec(key, m, dtype=self.dtype)
        u0 = jnp.asarray(u0, self.dtype)
        opts = dict(affinityeps=self.params.affinityeps)
        if self.dtype == jnp.float64:
            # reference-parity working precision stores full f64 tiles
            opts["storage_dtype"] = jnp.float64
        else:
            opts.setdefault("storage_dtype", jnp.int8)
            opts["probes"] = 16
            opts["power_steps"] = 4
        opts.update(self.engine_opts)
        eng_params = self.params
        if eng_params.rounding == Rounding.DSD:
            # exact DSD is rerun host-side below; the engine itself rounds
            # NONZERO (suppresses solve_sharded_sym's downgrade warning)
            import dataclasses
            eng_params = dataclasses.replace(eng_params,
                                             rounding=Rounding.NONZERO)
        if engine == "sharded":
            soln = symstore.solve_sharded_sym(
                self.invariant, D1, D2, self._A, u0, eng_params,
                mesh=self.mesh, **opts)
            u, F, ifinal, mask = soln.u, soln.score, soln.ifinal, soln.mask
        else:
            u, F, ifinal = symstore.solve_single(
                self.invariant, D1, D2, self._A, u0, eng_params, **opts)
            rounding = self.params.rounding
            if rounding == Rounding.DSD:
                rounding = Rounding.NONZERO     # exact DSD below
            mask = msrc.round_solution(u, F, rounding)
        np.asarray(mask)   # synchronize (tunnel-safe, see CLAUDE.md)

        if self.params.rounding == Rounding.DSD:
            mask = self._dsd_on_support(u)
        soln = Solution(ifinal=ifinal, mask=mask, u0=u0, u=u, score=F)
        soln.t = time.perf_counter() - t0
        self._soln = soln
        return soln

    def _dsd_on_support(self, u) -> jnp.ndarray:
        """Exact DSD rounding without a dense (m, m): the reference's DSD
        call is already restricted to the nonzero support S
        (reference: src/clipper.cpp:294-300), and the flow gadget only
        reads M[S, S] — so rebuild just that (|S|, |S|) block from the
        invariant and run the host max-flow on it."""
        from clipper_tpu.ops.affinity import distinctness_mask
        from clipper_tpu.solvers import dsd

        m = self._A.shape[0]
        u_np = np.asarray(u)
        S = np.flatnonzero(u_np > 0)
        if S.size == 0:
            return jnp.zeros(m, dtype=bool)
        A_S = jnp.asarray(np.asarray(self._A)[S])
        P1 = self._cap["D1"][A_S[:, 0]]
        P2 = self._cap["D2"][A_S[:, 1]]
        scores = self.invariant.score_block(P1, P1, P2, P2)
        keep = distinctness_mask(A_S) & (scores > self.params.affinityeps)
        M_SS = np.asarray(jnp.where(keep, scores, 0.0), np.float64)
        M_SS = np.triu(M_SS, 1)
        M_SS = M_SS + M_SS.T
        nodes = S[np.asarray(dsd.solve(M_SS), np.int64)]
        mask = np.zeros(m, dtype=bool)
        mask[nodes] = True
        return jnp.asarray(mask)

    def _solve_sparse(self, u0, key, multistart: int) -> Solution:
        """Solve over the occupied-tile storage built by
        set_sparse_matrix_data — no dense (m, m) is ever materialized:
        the solver reads tiles, the full-precision polish is an O(nnz)
        scipy quadform, and DSD rounding densifies only the (|S|, |S|)
        support submatrix."""
        from clipper_tpu.ops import blocksparse
        from clipper_tpu.solvers import msrc_flat

        m = self._bs_info["m"]
        t0 = time.perf_counter()
        K = max(1, int(multistart))
        if u0 is not None:
            u0s = jnp.asarray(u0, self.dtype)[None, :]
            K = 1
        else:
            u0s = jax.vmap(lambda k: utils.randvec(k, m, dtype=self.dtype))(
                jax.random.split(key, K))
        # ALL K restarts run as one batched device program (vmapped lanes
        # over the shared tile storage) and come back in one fetch — a
        # host loop of K dispatches would pay ~23 ms tunnel latency each
        us, Fs, ifinals = blocksparse.solve_prepared_multi(
            self._bs, self._bs_info, u0s, self.params, power_steps=4)
        # full-precision objective u'(M + I)u via a sparse matvec:
        # int8 tile storage biases the in-loop F (BENCH.md round 2),
        # and omega = round(F) needs accuracy well under 0.5
        us_np = np.asarray(us, np.float64)
        Fps = [float(un @ (self._M_sparse @ un) + un @ un) for un in us_np]
        best = int(np.argmax(Fps))
        u_np, Fp = us_np[best], Fps[best]
        ifinal, u0k = int(ifinals[best]), u0s[best]

        if self.params.rounding == Rounding.DSD:
            from clipper_tpu.solvers import dsd
            S = np.flatnonzero(u_np > 0)
            A_sub = np.asarray(
                self._M_sparse[np.ix_(S, S)].toarray(), np.float64)
            nodes = S[np.asarray(dsd.solve(A_sub), np.int64)]
            mask = np.zeros(m, dtype=bool)
            mask[nodes] = True
            mask = jnp.asarray(mask)
        else:
            mask = msrc.round_solution(
                jnp.asarray(u_np, self.dtype),
                jnp.asarray(Fp, self.dtype), self.params.rounding)
        soln = Solution(ifinal=jnp.int32(ifinal), mask=mask, u0=u0k,
                        u=jnp.asarray(u_np, self.dtype),
                        score=jnp.asarray(Fp, self.dtype))
        soln.t = time.perf_counter() - t0
        self._soln = soln
        return soln

    def solve_as_maximum_clique(self, params=None) -> Solution:
        """Solve the exact/heuristic maximum-clique problem on C.

        reference: src/clipper.cpp:82-97.
        """
        from clipper_tpu.solvers import maxclique
        self._require_matrices()
        m = self._m()
        # densified constraint adjacency without diagonal
        # (reference: src/clipper.cpp:84-85) — the host B&B works on a
        # bitset adjacency, so densifying the 0/1 pattern is inherent here
        if self._cap is not None:
            C = self._densify_cap()[1]
        elif self._C is not None:
            C = self._C
        else:
            C = self._C_sparse.toarray()
        adj = np.asarray(C) != 0
        t0 = time.perf_counter()
        nodes = maxclique.solve(adj, params or maxclique.Params())
        t = time.perf_counter() - t0
        mask = np.zeros(m, dtype=bool)
        mask[nodes] = True
        self._soln = Solution(ifinal=jnp.int32(0), mask=jnp.asarray(mask),
                              u0=jnp.zeros(m, self.dtype),
                              u=jnp.zeros(m, self.dtype),
                              score=jnp.asarray(-1.0, self.dtype), t=t)
        return self._soln

    def solve_as_msrc_sdr(self, params=None) -> Solution:
        """Solve the MSRC semidefinite relaxation (JAX-native ADMM).

        reference: src/clipper.cpp:101-113, src/sdp.cpp:88-303.
        """
        from clipper_tpu.solvers import sdp
        self._require_matrices()
        m = self._m()
        M = self.get_affinity_matrix()
        C = self.get_constraint_matrix()
        t0 = time.perf_counter()
        sdp_soln = sdp.solve(M, C, params or sdp.Params())
        t = time.perf_counter() - t0
        mask = np.zeros(m, dtype=bool)
        mask[sdp_soln.nodes] = True
        self._soln = Solution(ifinal=jnp.int32(0), mask=jnp.asarray(mask),
                              u0=jnp.zeros(m, self.dtype),
                              u=jnp.zeros(m, self.dtype),
                              score=jnp.asarray(-1.0, self.dtype), t=t)
        return self._soln

    @staticmethod
    def solve_as_msrc_sdr_batched(Ms, Cs, params=None) -> list:
        """Batched MSRC-SDR over (B, m, m) stacked affinity/constraint
        matrices (identity diagonal, as get_affinity_matrix returns) — all
        B relaxations solved in one vmapped device program, with each
        solution's duality gap f64-certified host-side. An extension: the
        reference's SCS path is strictly one-problem-per-call
        (reference: src/sdp.cpp:88-303); batched loop-closure candidate
        vetting is the TPU-native use case. Returns a list of B
        ``sdp.Solution``.
        """
        from clipper_tpu.solvers import sdp
        return sdp.solve_batched(Ms, Cs, params or sdp.Params())

    # ------------------------------------------------------------------
    # accessors (reference: src/clipper.cpp:117-166)
    # ------------------------------------------------------------------

    def get_solution(self) -> Solution:
        return self._soln

    def get_initial_associations(self) -> np.ndarray:
        return np.asarray(self._A)

    def get_selected_associations(self) -> np.ndarray:
        """reference: src/clipper.cpp:124-127."""
        return utils.select_inlier_associations(self._soln, self._A)

    def get_affinity_matrix(self) -> jnp.ndarray:
        """Symmetric M with identity diagonal (reference: src/clipper.cpp:131-136).

        On the sparse path this densifies ON DEMAND (the accessor's return
        type is dense by contract); solve() itself never does.
        """
        self._require_matrices()
        if self._cap is not None:
            return self._densify_cap()[0] + jnp.eye(self._m(),
                                                    dtype=self.dtype)
        if self._M is None:
            return jnp.asarray(self._M_sparse.toarray(), self.dtype) + \
                jnp.eye(self._bs_info["m"], dtype=self.dtype)
        return self._M + jnp.eye(self._M.shape[0], dtype=self.dtype)

    def get_constraint_matrix(self) -> jnp.ndarray:
        """Symmetric C with identity diagonal (reference: src/clipper.cpp:140-145).

        Densifies on demand on the sparse path (see get_affinity_matrix).
        """
        self._require_matrices()
        if self._cap is not None:
            return self._densify_cap()[1] + jnp.eye(self._m(),
                                                    dtype=self.dtype)
        if self._C is None:
            return jnp.asarray(self._C_sparse.toarray(), self.dtype) + \
                jnp.eye(self._bs_info["m"], dtype=self.dtype)
        return self._C + jnp.eye(self._C.shape[0], dtype=self.dtype)

    def set_matrix_data(self, M, C, A=None) -> None:
        """Inject dense affinity/constraint matrices directly.

        The reference keeps the strict upper triangle (diagonal stripped)
        (reference: src/clipper.cpp:149-158); internally we store the full
        symmetric zero-diagonal form.
        """
        M = jnp.asarray(M, self.dtype)
        C = jnp.asarray(C, self.dtype)
        Mu = jnp.triu(M, k=1)
        Cu = jnp.triu(C, k=1)
        self._M = Mu + Mu.T
        self._C = Cu + Cu.T
        self._cap = None
        self._clear_sparse()
        if A is not None:
            self._A = as_association(A)

    def set_sparse_matrix_data(self, M, C, A=None, *, tile: int = 128,
                               max_occupancy: float = 0.5,
                               storage_dtype=None) -> None:
        """Inject upper-triangular (no diagonal) sparse or dense matrices.

        reference: src/clipper.cpp:162-166 (matrices must be upper triangular
        with unset diagonal).

        scipy.sparse input STAYS sparse: the matrices are symmetrized
        sparsely and converted to occupied-tile device storage
        (ops.blocksparse.from_scipy) — when tile occupancy is under
        ``max_occupancy``, :meth:`solve` runs over the tiles and a dense
        (m, m) is never materialized, answering the reference's sparse
        input surface (include/clipper/clipper.h:139-143) at TPU tile
        granularity. Dense/array input takes the dense path as before.

        storage_dtype: tile storage dtype (default: int8 in f32 working
        precision — same quantized-hot-loop / full-precision-polish
        contract as the pool engines; f64 working precision stores f64).
        """
        import scipy.sparse as sp

        if not sp.issparse(M):
            M = _densify(M)
            C = _densify(C)
            self.set_matrix_data(M + M.T, C + C.T, A)
            return

        from clipper_tpu.ops import blocksparse
        M = sp.triu(sp.csr_matrix(M), k=1)
        C = sp.triu(sp.csr_matrix(C), k=1)
        M_sym = (M + M.T).tocsr()
        C_sym = (C + C.T).tocsr()
        if storage_dtype is None:
            storage_dtype = (jnp.float64 if self.dtype == jnp.float64
                             else jnp.int8)
        bs, info = blocksparse.from_scipy(
            M_sym, C_sym, tile=tile, storage_dtype=storage_dtype,
            max_occupancy=max_occupancy)
        if bs is None:
            # high occupancy: dense storage is the right representation;
            # fall back to the dense facade path
            del info
            self.set_matrix_data(jnp.asarray(M_sym.toarray(), self.dtype),
                                 jnp.asarray(C_sym.toarray(), self.dtype), A)
            return
        self._M_sparse, self._C_sparse = M_sym, C_sym
        self._bs, self._bs_info = bs, info
        self._M = self._C = None
        if A is not None:
            self._A = as_association(A)

    def set_parallelize(self, parallelize: bool) -> None:
        """No-op, kept for API parity (reference: include/clipper/clipper.h:148).

        On TPU the affinity build is always data-parallel via XLA.
        """

    # ------------------------------------------------------------------

    def _m(self) -> int:
        if self._M is not None:
            return self._M.shape[0]
        if self._cap is not None:
            return self._A.shape[0]
        return self._bs_info["m"]

    def _densify_cap(self):
        """Dense (M, C) rebuilt on demand for the matrix accessors on the
        capacity path — guarded: the whole point of the capacity engines is
        never materializing (m, m) at 100k scale."""
        m = self._m()
        if m > 16384:
            raise RuntimeError(
                f"get_*_matrix would materialize a dense ({m}, {m}) — the "
                "capacity engine exists to avoid exactly that; use "
                "get_selected_associations / the Solution instead")
        M, C, _ = build_affinity(self.invariant, self._cap["D1"],
                                 self._cap["D2"], self._A,
                                 affinityeps=self.params.affinityeps,
                                 dtype=self.dtype)
        return M, C

    def _clear_sparse(self):
        self._M_sparse = self._C_sparse = None
        self._bs = self._bs_info = None

    def _require_matrices(self):
        if ((self._M is None or self._C is None) and self._bs_info is None
                and self._cap is None):
            raise RuntimeError(
                "no affinity/constraint matrices; call "
                "score_pairwise_consistency or set_matrix_data first")


def _densify(X) -> np.ndarray:
    if hasattr(X, "toarray"):   # scipy.sparse
        return np.asarray(X.toarray())
    return np.asarray(X)


# API-parity alias matching the reference class name.
CLIPPER = Clipper
