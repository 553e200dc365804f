"""Benchmark-harness data utilities tests (PLY, GT correspondences, P/R)."""

import numpy as np
import pytest

from clipper_tpu.bench import data


def test_read_bun10k():
    pts = data.read_ply(data.BUN10K)
    # the bundled Stanford bunny has 9,992 vertices (SURVEY.md §2)
    assert pts.shape == (9992, 3)
    assert np.isfinite(pts).all()


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3))
    for binary in (True, False):
        p = tmp_path / f"t_{binary}.ply"
        data.write_ply(p, pts, binary=binary)
        back = data.read_ply(p)
        np.testing.assert_allclose(back, pts, atol=1e-12)


def test_scale_to_cube():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(50, 3)) * np.array([10.0, 2.0, 1.0])
    s = data.scale_to_cube(pts, 1.0)
    assert abs((s.max(0) - s.min(0)).max() - 1.0) < 1e-12


def test_bounded_noise():
    rng = np.random.default_rng(2)
    eta = data.generate_bounded_normal_noise(rng, 5000, 0.01, 5.54 * 0.01)
    assert eta.shape == (5000, 3)
    assert (np.linalg.norm(eta, axis=1) <= 5.54 * 0.01 + 1e-15).all()
    assert abs(eta.std() - 0.01) < 0.002


def test_gt_correspondences_identity():
    rng = np.random.default_rng(3)
    pts = rng.uniform(size=(200, 3))
    noisy = pts + data.generate_bounded_normal_noise(rng, 200, 0.001, 0.005)
    A = data.distance_based_correspondences(pts, noisy, 1, 0.01, True)
    # nearly all points should match their own noisy copy
    assert A.shape[0] >= 195
    assert (A[:, 0] == A[:, 1]).mean() > 0.97


def test_synthetic_correspondences():
    rng = np.random.default_rng(4)
    Agood = np.stack([np.arange(100), np.arange(100)], 1).astype(np.int32)
    A, Agt = data.generate_synthetic_correspondences(rng, 500, 500, Agood,
                                                     m=200, rho=0.9)
    assert A.shape == (200, 2)
    assert Agt.shape == (20, 2)
    good = {(int(a), int(b)) for a, b in Agood}
    # outliers occupy the first no rows and are not GT pairs
    for a, b in A[:180]:
        assert (int(a), int(b)) not in good
    # P/R of the putative set itself
    p, r = data.get_precision_recall(A, Agt)
    assert abs(p - 0.1) < 1e-12
    assert abs(r - 1.0) < 1e-12


def test_native_ply_matches_python():
    """C++ PLY reader returns bit-identical points to the Python parser."""
    from clipper_tpu.bench import data

    py = data._read_ply_py(data.BUN10K)
    nat = data._read_ply_native(data.BUN10K)
    if nat is None:
        import pytest
        pytest.skip("native library unavailable")
    assert nat.shape == py.shape
    assert (nat == py).all()


def test_native_ply_ascii(tmp_path):
    """ascii PLY path of the native reader (with extra properties)."""
    from clipper_tpu.bench import data

    p = tmp_path / "tri.ply"
    p.write_text("""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
property uchar red
end_header
0 1 2 255
3.5 -4 5 0
-1 0 0.25 7
""")
    pts = data.read_ply(p)
    expected = np.array([[0, 1, 2], [3.5, -4, 5], [-1, 0, 0.25]])
    np.testing.assert_allclose(pts, expected)
    nat = data._read_ply_native(p)
    if nat is not None:
        np.testing.assert_allclose(nat, expected)
