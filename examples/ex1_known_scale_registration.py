"""Example 1: synthetic known-scale point-cloud registration.

Port of the reference example (reference: examples/matlab/ex1_knownscalepointcloud.m):
a 4-point model, an SE(3)-transformed partial view, all-to-all putative
associations, Euclidean-distance invariant, MSRC solve, and SE(3) recovery.

Run: python examples/ex1_known_scale_registration.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

import clipper_tpu as ct
from clipper_tpu.utils.transforms import kabsch_se3, transform_rmse


def main():
    model = np.array([[0, 2, 0, 2],
                      [0, 0, 3, 2],
                      [0, 0, 0, 0]], dtype=np.float64)

    th = np.pi / 8
    R_true = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1]])
    t_true = np.array([5.0, 3.0, 0.0])
    data = R_true.T @ (model - t_true[:, None])
    data = data[:, :3]  # partial view: one point unobserved

    clipper = ct.Clipper(ct.EuclideanDistance(), ct.Params())
    clipper.score_pairwise_consistency(model, data)  # all-to-all hypothesis
    soln = clipper.solve(key=jax.random.PRNGKey(0))

    A_in = clipper.get_selected_associations()
    print(f"selected {A_in.shape[0]} associations "
          f"(score {float(soln.score):.3f}, {int(soln.ifinal)} outer iters):")
    print(A_in)

    # recover the transform data -> model from the selected correspondences
    P = data.T[A_in[:, 1]]
    Q = model.T[A_in[:, 0]]
    R, t = kabsch_se3(P, Q)
    rmse = float(transform_rmse(P, Q, R, t))
    print(f"recovered rotation error: "
          f"{np.rad2deg(np.arccos(np.clip((np.trace(np.asarray(R).T @ R_true)-1)/2, -1, 1))):.4f} deg, "
          f"translation error: {np.linalg.norm(np.asarray(t) - t_true):.6f}, "
          f"rmse {rmse:.2e}")


if __name__ == "__main__":
    main()
