"""Rigid-transform estimation from selected correspondences.

The reference library leaves SE(3) recovery to examples (Open3D
point-to-point in the ex4 notebook; SVD/Procrustes on plane parameters in
reference: examples/matlab/ex3_planecloud.m:100-115). We ship it as a
first-class jittable op: weighted Kabsch/Umeyama alignment via SVD.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def kabsch_se3(P: jnp.ndarray, Q: jnp.ndarray,
               weights: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-fit rotation R and translation t with R @ P_i + t ~= Q_i.

    Args:
        P: (n, 3) source points.
        Q: (n, 3) target points.
        weights: optional (n,) nonnegative weights (e.g. the solver's u —
            confidence weighting from the characteristic vector).

    Returns:
        (R, t): (3, 3) rotation (det +1) and (3,) translation.
    """
    if weights is None:
        weights = jnp.ones(P.shape[0], P.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-30)

    mu_p = jnp.sum(P * w[:, None], axis=0)
    mu_q = jnp.sum(Q * w[:, None], axis=0)
    Pc = P - mu_p
    Qc = Q - mu_q

    H = (Pc * w[:, None]).T @ Qc
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], P.dtype)).at[2, 2].set(det)
    R = Vt.T @ D @ U.T
    t = mu_q - R @ mu_p
    return R, t


def transform_rmse(P: jnp.ndarray, Q: jnp.ndarray, R: jnp.ndarray,
                   t: jnp.ndarray) -> jnp.ndarray:
    """RMSE of R @ P + t vs Q."""
    resid = (P @ R.T + t) - Q
    return jnp.sqrt(jnp.mean(jnp.sum(resid * resid, axis=-1)))
