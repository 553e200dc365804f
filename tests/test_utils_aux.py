"""Aux utils: checkpoint save/load, stage timers, transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clipper_tpu as ct
from clipper_tpu.utils import Timer, checkpoint
from clipper_tpu.utils.profiling import StageTimer
from clipper_tpu.utils.transforms import kabsch_se3, transform_rmse


def test_solution_checkpoint_roundtrip(tmp_path, key):
    from test_affinity import make_scene
    model, data = make_scene()
    c = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    c.score_pairwise_consistency(model, data)
    soln = c.solve(key=key)

    path = tmp_path / "soln.npz"
    checkpoint.save_solution(path, soln)
    back = checkpoint.load_solution(path)
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(soln.u))
    np.testing.assert_array_equal(np.asarray(back.mask), np.asarray(soln.mask))
    assert float(back.score) == float(soln.score)

    # warm-start from the checkpointed iterate reproduces the same selection
    soln2 = c.solve(u0=back.u)
    assert (np.asarray(soln2.mask) == np.asarray(soln.mask)).all()


def test_stage_timer():
    st = StageTimer()
    with st.stage("a"):
        pass
    with st.stage("b"):
        pass
    rep = st.report()
    assert set(rep) == {"total", "a", "b"}
    assert rep["total"] >= rep["a"]


def test_named_timer():
    t = Timer("x")
    t.start()
    dt = t.stop()
    assert dt >= 0
    t2 = t + Timer("x")
    assert t2.count == 1


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(0)
    P = rng.normal(size=(50, 3))
    th = 0.7
    R_true = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1]])
    t_true = np.array([1.0, -2.0, 0.5])
    Q = P @ R_true.T + t_true
    R, t = kabsch_se3(jnp.asarray(P), jnp.asarray(Q))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-8)
    assert float(transform_rmse(jnp.asarray(P), jnp.asarray(Q), R, t)) < 1e-8


def test_kabsch_weighted_ignores_outliers():
    rng = np.random.default_rng(1)
    P = rng.normal(size=(40, 3))
    R_true = np.eye(3)
    t_true = np.array([0.5, 0.5, 0.5])
    Q = P + t_true
    Q[0] += 100.0  # gross outlier
    w = np.ones(40)
    w[0] = 0.0
    R, t = kabsch_se3(jnp.asarray(P), jnp.asarray(Q), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-8)
