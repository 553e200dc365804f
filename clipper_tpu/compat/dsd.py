"""clipperpy.dsd-compatible namespace
(reference: bindings/python/py_clipper.cpp:103-112; note the reference has a
binding bug that registers the utils module under the dsd name — this is the
intended surface)."""

from clipper_tpu.solvers.dsd import solve  # noqa: F401
