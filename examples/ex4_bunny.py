"""Example 4: Stanford-bunny registration at 90% outliers.

Port of the reference example (reference: examples/matlab/ex4_bunny.m and
examples/python/ex4_bunny.ipynb): m=1000 putative associations on bun10k with
90% outliers; solve, report precision/recall, and recover the SE(3) transform
from the selected inliers. Also demonstrates a CUSTOM invariant written in
jnp — traced and fused into the pipeline at zero overhead (the reference's
custom Python invariant costs ~6 s for 1000 associations vs ms in C++;
notebook cell 12).

Run: python examples/ex4_bunny.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import clipper_tpu as ct
from clipper_tpu.bench import data, harness
from clipper_tpu.utils.transforms import kabsch_se3


class MyCustomEuclidean(ct.PairwiseInvariant):
    """A user-defined invariant in pure jnp: same math as the builtin."""

    def __init__(self, sigma=0.015, epsilon=0.05):
        self.sigma, self.epsilon = sigma, epsilon

    def __call__(self, ai, aj, bi, bj):
        l1 = jnp.linalg.norm(ai - aj, axis=-1)
        l2 = jnp.linalg.norm(bi - bj, axis=-1)
        c = jnp.abs(l1 - l2)
        return jnp.where(c < self.epsilon,
                         jnp.exp(-0.5 * c * c / self.sigma ** 2), 0.0)


def main():
    m, rho = 1000, 0.90
    rng = np.random.default_rng(0)
    pcd0 = harness.load_bunny()
    pcd1, A, Agt = harness.make_problem(pcd0, m, rho, rng)

    clipper = ct.Clipper(harness.default_invariant(), ct.Params())
    t0 = time.perf_counter()
    clipper.score_pairwise_consistency(pcd0.T, pcd1.T, A)
    soln = clipper.solve(key=jax.random.PRNGKey(0))
    t = time.perf_counter() - t0

    Ain = clipper.get_selected_associations()
    p, r = data.get_precision_recall(Ain, Agt)
    print(f"built-in invariant: {Ain.shape[0]} inliers of {m} putative "
          f"({rho*100:.0f}% outliers) in {t*1e3:.1f} ms "
          f"-> precision {p*100:.1f}%  recall {r*100:.1f}%")

    R, tvec = kabsch_se3(jnp.asarray(pcd0[Ain[:, 0]]),
                         jnp.asarray(pcd1[Ain[:, 1]]))
    print("recovered R ~ I:", np.allclose(np.asarray(R), np.eye(3), atol=0.01),
          " |t| =", f"{np.linalg.norm(np.asarray(tvec)):.4f}")

    # custom jnp invariant: identical answer, no per-pair Python overhead
    clipper2 = ct.Clipper(MyCustomEuclidean(), ct.Params())
    t0 = time.perf_counter()
    clipper2.score_pairwise_consistency(pcd0.T, pcd1.T, A)
    soln2 = clipper2.solve(key=jax.random.PRNGKey(0))
    t2 = time.perf_counter() - t0
    Ain2 = clipper2.get_selected_associations()
    p2, r2 = data.get_precision_recall(Ain2, Agt)
    print(f"custom jnp invariant: precision {p2*100:.1f}% recall {r2*100:.1f}% "
          f"in {t2*1e3:.1f} ms (reference custom-Python path: ~6000 ms)")


if __name__ == "__main__":
    main()
