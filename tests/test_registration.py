"""End-to-end bunny registration at high outlier ratios.

The reference's headline accuracy operating point: m=1000 associations at
90% outliers on bun10k (reference: examples/matlab/ex4_bunny.m:17-49,
notebook cells 3-4). Requirement: precision/recall parity with the
reference algorithm (SURVEY.md §6 target: within 1%).

We assert (a) absolute quality bars and (b) *algorithmic parity*: the JAX
solver selects the same inliers as a NumPy transliteration of the reference
loop on identical inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.bench import data, harness
from clipper_tpu.solvers.msrc import find_dense_clique, round_solution
from test_solver import np_reference_solver


@pytest.fixture(scope="module")
def bunny():
    return harness.load_bunny()


def _solve_problem(pcd0, m, rho, seed, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    pcd1, A, Agt = harness.make_problem(pcd0, m, rho, rng)
    inv = harness.default_invariant()
    D1 = jnp.asarray(pcd0, dtype)
    D2 = jnp.asarray(pcd1, dtype)
    Aj = jnp.asarray(A, jnp.int32)
    M, C = ct.score_pairwise_consistency(inv, D1, D2, Aj, affinityeps=1e-4)
    u0 = np.random.default_rng(seed + 1).uniform(size=m)
    return M, C, u0, A, Agt


def test_bunny_90pct_outliers_quality(bunny):
    """m=512 @ 90% outliers: high precision and recall."""
    ps, rs = [], []
    for seed in range(3):
        M, C, u0, A, Agt = _solve_problem(bunny, 512, 0.9, seed)
        u, F, _ = find_dense_clique(M, C, jnp.asarray(u0), ct.Params())
        mask = np.asarray(round_solution(u, F, ct.Rounding.DSD_HEU))
        p, r = data.get_precision_recall(A[mask], Agt)
        ps.append(p)
        rs.append(r)
    assert np.mean(ps) >= 0.95, f"precision {ps}"
    assert np.mean(rs) >= 0.60, f"recall {rs}"


def test_parity_with_reference_selection(bunny):
    """Same inlier selection as the reference algorithm on identical input."""
    for seed in (0, 1):
        M, C, u0, A, Agt = _solve_problem(bunny, 256, 0.9, seed)
        Mn, Cn = np.asarray(M), np.asarray(C)

        u_np, F_np, _ = np_reference_solver(Mn, Cn, u0)
        omega = int(np.floor(F_np + 0.5))
        sel_np = set(np.argsort(-u_np)[:omega])

        u_jx, F_jx, _ = find_dense_clique(M, C, jnp.asarray(u0), ct.Params(),
                                          fuse_md=False)
        mask = np.asarray(round_solution(u_jx, F_jx, ct.Rounding.DSD_HEU))
        sel_jx = set(np.flatnonzero(mask))

        assert sel_jx == sel_np, f"seed {seed}: {sel_jx ^ sel_np}"


def test_fp32_matches_fp64_selection(bunny):
    """The TPU-throughput dtype (fp32) must select the same inliers."""
    M, C, u0, A, Agt = _solve_problem(bunny, 256, 0.9, 7)
    u64, F64, _ = find_dense_clique(M, C, jnp.asarray(u0), ct.Params())
    m64 = np.asarray(round_solution(u64, F64, ct.Rounding.DSD_HEU))

    M32, C32 = M.astype(jnp.float32), C.astype(jnp.float32)
    u32, F32, _ = find_dense_clique(M32, C32,
                                    jnp.asarray(u0, jnp.float32), ct.Params())
    m32 = np.asarray(round_solution(u32, F32, ct.Rounding.DSD_HEU))

    p64, r64 = data.get_precision_recall(A[m64], Agt)
    p32, r32 = data.get_precision_recall(A[m32], Agt)
    # statistical parity: within 2% P/R of the fp64 path
    assert abs(p64 - p32) <= 0.02
    assert abs(r64 - r32) <= 0.02
