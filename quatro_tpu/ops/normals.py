"""Surface normal estimation via neighborhood PCA.

Replaces ``pcl::NormalEstimation`` (reference: src/teaser_utils/fpfh.cc:57-63):
per point, the covariance of its radius neighborhood's positions; the normal
is the eigenvector of the smallest eigenvalue, oriented toward the viewpoint
(the sensor origin, PCL's default).

TPU-native design: the 3x3 symmetric eigenproblem is solved in closed form
(trigonometric eigenvalues + cross-product eigenvectors) — pure VPU
arithmetic batched over all N points, no LAPACK batching limits, no
iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quatro_tpu.ops.neighbors import NeighborLists


class Normals(NamedTuple):
    normals: jax.Array    # (N, 3) unit normals (0 where undefined)
    curvature: jax.Array  # (N,) lambda_min / trace (PCL's surface variation)
    valid: jax.Array      # (N,) >= 3 neighbors and non-degenerate


def smallest_eigenvector_3x3(a: jnp.ndarray):
    """Smallest eigenpair of a batch of symmetric 3x3 matrices, closed form.

    a: (..., 3, 3). Returns (eigvec (..., 3), eigval (...,)).
    Eigenvalues via the trigonometric solution of the characteristic cubic;
    the eigenvector via the largest cross product of rows of (A - lambda I),
    which is numerically robust for well-separated spectra and falls back
    gracefully for near-isotropic neighborhoods.
    """
    dtype = a.dtype
    tr = jnp.trace(a, axis1=-2, axis2=-1)
    q = tr / 3.0
    b = a - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = jnp.linalg.det(b)
    r = detb / (2.0 * p ** 3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eig1 >= eig2 >= eig3
    eig1 = q + 2.0 * p * jnp.cos(phi)
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    m = a - eig3[..., None, None] * jnp.eye(3, dtype=dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    norms = jnp.stack([jnp.sum(c01 * c01, -1), jnp.sum(c02 * c02, -1),
                       jnp.sum(c12 * c12, -1)], axis=-1)
    best = jnp.argmax(norms, axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    vec = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1),
                              axis=-2)[..., 0, :]
    vec_norm = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, -1, keepdims=True),
                                    1e-30))
    return vec / vec_norm, eig3


def estimate_normals(points: jnp.ndarray, nbrs: NeighborLists,
                     viewpoint=(0.0, 0.0, 0.0)) -> Normals:
    """PCA normals over precomputed neighbor lists.

    points: (N, 3); nbrs from radius_neighbors (self included).
    """
    dtype = points.dtype
    nb_pts = points[nbrs.idx]                      # (N, K, 3)
    w = nbrs.valid.astype(dtype)[..., None]        # (N, K, 1)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)     # (N, 1)
    mean = jnp.sum(nb_pts * w, axis=1) / cnt
    centered = (nb_pts - mean[:, None, :]) * w
    # HIGHEST: with the TPU bf16 matmul default, planar neighborhoods'
    # lambda_min/trace (~1e-5 on roads) would drown in ~4e-3 relative
    # covariance error — curvature noise and degrees of normal wobble.
    cov = jnp.einsum("nki,nkj->nij", centered, centered,
                     precision=jax.lax.Precision.HIGHEST) / cnt[..., None]

    normal, lam_min = smallest_eigenvector_3x3(cov)
    trace = jnp.trace(cov, axis1=-2, axis2=-1)
    curvature = lam_min / jnp.maximum(trace, 1e-30)

    # Orient toward the viewpoint (PCL flipNormalTowardsViewpoint).
    vp = jnp.asarray(viewpoint, dtype)
    flip = jnp.sum(normal * (vp[None, :] - points), axis=-1) < 0
    normal = jnp.where(flip[:, None], -normal, normal)

    valid = jnp.sum(nbrs.valid, axis=1) >= 3
    normal = jnp.where(valid[:, None], normal, 0.0)
    # Zero-covariance slots otherwise yield lam_min ~ -1e-15 over the 1e-30
    # trace floor = astronomical garbage curvature.
    curvature = jnp.where(valid, curvature, 0.0)
    return Normals(normal, curvature, valid)
