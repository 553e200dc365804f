"""Heterogeneous-m bucketed batching: exactness of padding + bucket routing."""

import jax.numpy as jnp
import numpy as np

import clipper_tpu as ct
from clipper_tpu.parallel import buckets, pool


def scene(rng, n, ni, m):
    D1 = rng.uniform(size=(n, 3))
    th = rng.uniform(0, np.pi)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    D2 = D1 @ R.T + rng.normal(0, 0.002, size=(n, 3))
    A = np.zeros((m, 2), dtype=np.int32)
    A[:ni, 0] = A[:ni, 1] = np.arange(ni)
    A[ni:, 0] = rng.integers(0, n, m - ni)
    A[ni:, 1] = rng.integers(0, n, m - ni)
    return D2.astype(np.float32), A, rng.uniform(size=m).astype(np.float32)


INV = ct.EuclideanDistance(ct.EuclideanDistanceParams(sigma=0.015,
                                                      epsilon=0.05))


def test_bucket_size():
    assert buckets.bucket_size(1, 128) == 128
    assert buckets.bucket_size(128, 128) == 128
    assert buckets.bucket_size(129, 128) == 256
    assert buckets.bucket_size(2048, 128) == 2048


def test_bucketed_matches_direct_pool():
    """Mixed m in (60..500) routed through 128/256/512 buckets must select
    the same inliers as a direct (unpadded) pool solve of each problem."""
    rng = np.random.default_rng(33)
    n = 120
    D1 = rng.uniform(size=(n, 3)).astype(np.float32)
    sizes = [(60, 18), (100, 22), (128, 25), (200, 30), (300, 34), (500, 40)]
    problems = []
    for m, ni in sizes:
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = (D1 @ R.T + rng.normal(0, 0.002, size=(n, 3))).astype(np.float32)
        A = np.zeros((m, 2), dtype=np.int32)
        A[:ni, 0] = A[:ni, 1] = np.arange(ni)
        A[ni:, 0] = rng.integers(0, n, m - ni)
        A[ni:, 1] = rng.integers(0, n, m - ni)
        u0 = rng.uniform(size=m).astype(np.float32)
        problems.append((D2, A, u0))

    bp = buckets.make_bucketed_pipeline(INV, ct.Params(), lanes=4, window=4)
    solns = bp(D1, problems)
    assert len(solns) == len(problems)

    for i, ((D2, A, u0), (m, ni)) in enumerate(zip(problems, sizes)):
        pp = pool.make_pool_pipeline(INV, ct.Params(), lanes=4, window=4)
        direct = pp(jnp.asarray(D1), jnp.asarray(D2)[None],
                    jnp.asarray(A)[None], jnp.asarray(u0)[None])
        got = np.flatnonzero(np.asarray(solns[i].mask))
        want = np.flatnonzero(np.asarray(direct.mask[0]))
        assert solns[i].mask.shape == (m,)
        # padding is mathematically inert but not bit-exact: f32 reduction
        # order differs at the padded width, so a knife-edge straggler can
        # swap at the omega cut (observed: 1 of 30). Selected sets must be
        # near-identical and the quality gates identical.
        assert len(set(got) ^ set(want)) <= 2, (i, got, want)
        sel = set(got)
        assert len(sel & set(range(ni))) >= ni - 3, (i, sel)
        assert len(sel - set(range(ni))) <= 2, (i, sel)


def test_bucketed_batch_padding_dummies_inert():
    """W=3 problems in one bucket pad to W=4: the dummy must not perturb
    real solutions or appear in the output."""
    rng = np.random.default_rng(5)
    n = 80
    D1 = rng.uniform(size=(n, 3)).astype(np.float32)
    problems = [scene(rng, n, 20, 128) for _ in range(3)]
    # scene() generated fresh D2 against ITS OWN rng draws of D1; rebuild
    # properly: use D1-based scenes
    problems = []
    for _ in range(3):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = (D1 @ R.T + rng.normal(0, 0.002, size=(n, 3))).astype(np.float32)
        A = np.zeros((128, 2), dtype=np.int32)
        A[:20, 0] = A[:20, 1] = np.arange(20)
        A[20:, 0] = rng.integers(0, n, 108)
        A[20:, 1] = rng.integers(0, n, 108)
        problems.append((D2, A, rng.uniform(size=128).astype(np.float32)))
    bp = buckets.make_bucketed_pipeline(INV, ct.Params(), lanes=4, window=4)
    solns = bp(D1, problems)
    assert len(solns) == 3
    for i in range(3):
        sel = set(np.flatnonzero(np.asarray(solns[i].mask)))
        assert len(sel & set(range(20))) >= 17, (i, sel)


def test_bucketed_tri_layout_passthrough():
    """pool kwargs (layout='tri', tri_probes, d_scale) flow through the
    bucketed dispatcher; bucket sizes are 128-multiples so the triangle
    layout always applies."""
    rng = np.random.default_rng(3)
    n = 64
    D1 = rng.uniform(size=(n, 3)).astype(np.float32)
    problems = []
    for _ in range(3):
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        D2 = (D1 @ R.T + rng.normal(0, 0.002, size=(n, 3))).astype(np.float32)
        A = np.zeros((128, 2), dtype=np.int32)
        A[:20, 0] = A[:20, 1] = np.arange(20)
        A[20:, 0] = rng.integers(0, n, 108)
        A[20:, 1] = rng.integers(0, n, 108)
        problems.append((D2, A, rng.uniform(size=128).astype(np.float32)))
    bp = buckets.make_bucketed_pipeline(INV, ct.Params(), lanes=4, window=2,
                                        layout="tri", tri_probes=4,
                                        d_scale=0.15,
                                        storage_dtype=jnp.int8,
                                        power_steps=2)
    solns = bp(D1, problems)
    assert len(solns) == 3
    for i in range(3):
        sel = set(np.flatnonzero(np.asarray(solns[i].mask)))
        assert len(sel & set(range(20))) >= 17, (i, sel)
