"""clipperpy-compat layer: the reference bindings' usage patterns must work
verbatim (reference: examples/python/ex4_bunny.ipynb usage, py_clipper.cpp)."""

import numpy as np
import pytest

import clipper_tpu.compat as clipperpy

from test_affinity import make_scene


def test_clipperpy_style_end_to_end():
    # this is exactly the notebook's usage pattern
    iparams = clipperpy.invariants.EuclideanDistanceParams()
    iparams.sigma = 0.01
    iparams.epsilon = 0.06
    invariant = clipperpy.invariants.EuclideanDistance(iparams)

    params = clipperpy.Params()
    clipper = clipperpy.CLIPPER(invariant, params)

    model, data = make_scene()
    clipper.score_pairwise_consistency(model, data, np.empty((0, 2)))
    clipper.solve()

    soln = clipper.get_solution()
    assert soln.score > 2.5
    assert len(soln.nodes) == 3
    Ain = clipper.get_selected_associations()
    np.testing.assert_array_equal(Ain[:, 0], Ain[:, 1])

    A = clipper.get_initial_associations()
    assert A.shape == (12, 2)
    M = clipper.get_affinity_matrix()
    C = clipper.get_constraint_matrix()
    assert M.shape == (12, 12)
    np.testing.assert_array_equal(np.diag(C), np.ones(12))


def test_mutable_params_snapshot():
    params = clipperpy.Params()
    params.rounding = clipperpy.DSD_HEU
    params.maxoliters = 500
    frozen = params.freeze()
    assert frozen.maxoliters == 500
    assert "tol_u" in repr(params)


def test_mc_and_sdp_params():
    mc = clipperpy.MCParams()
    mc.time_limit = 60
    assert mc.freeze().time_limit == 60
    sdp = clipperpy.SDPParams()
    sdp.max_iters = 123
    assert sdp.freeze().max_iters == 123


def test_utils_namespace():
    A = clipperpy.utils.create_all_to_all(3, 2)
    assert A.shape == (6, 2)
    assert clipperpy.utils.k2ij(0, 4) == (0, 1)


def test_dsd_namespace():
    from test_dsd import golden_matrix, TRUE_NODES
    assert clipperpy.dsd.solve(golden_matrix()) == TRUE_NODES


def test_point_normal_invariant_namespace():
    ip = clipperpy.invariants.PointNormalDistanceParams()
    ip.sigp = 0.4
    inv = clipperpy.invariants.PointNormalDistance(ip)
    assert inv.params.sigp == 0.4


def test_compat_utils_surface():
    """Every reference utils binding exists and behaves
    (reference: bindings/python/py_clipper.cpp:87-99, src/utils.cpp)."""
    import clipper_tpu.compat.utils as cu
    import numpy as np

    v = cu.randvec(16, seed=0)
    assert v.shape == (16,) and (0 <= v).all() and (v < 1).all()
    x = np.array([3.0, 1.0, 4.0, 1.5, 9.0])
    assert set(cu.find_indices_of_k_largest(x, 2)) == {4, 2}
    assert cu.find_indices_where_above_threshold(x, 2.0) == [0, 2, 4]
    sel = cu.select_from_indicator(x, np.array([1, 0, 1, 0, 0], bool))
    assert list(sel) == [3.0, 4.0]
