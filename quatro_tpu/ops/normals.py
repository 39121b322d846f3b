"""Surface normal estimation via neighborhood PCA.

Replaces ``pcl::NormalEstimation`` (reference: src/teaser_utils/fpfh.cc:57-63):
per point, the covariance of its radius neighborhood's positions; the normal
is the eigenvector of the smallest eigenvalue, oriented toward the viewpoint
(the sensor origin, PCL's default).

TPU-native design: the 3x3 symmetric eigenproblem is solved in closed form
(trigonometric eigenvalues + cross-product eigenvectors) — pure VPU
arithmetic batched over all N points, no LAPACK batching limits, no
iteration. All internal state is structure-of-arrays: per-point scalars as
(N,)/(N, K) lane-aligned arrays and the covariance as its six unique
entries, never (N, K, 3) / (N, 3, 3) tensors — on TPU a minor dimension of
3 is physically padded to 128 lanes, so the AoS formulation reads/writes
~42x the logical bytes (measured: 6.5 GB -> ~0.1 GB for this stage).
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


def smallest_eigenpair_sym3(a11, a12, a13, a22, a23, a33):
    """Smallest eigenpair of symmetric 3x3 matrices given as six component
    arrays (any common shape). Returns ((v1, v2, v3) unit eigenvector
    components, eigval) — the structure-of-arrays core of
    smallest_eigenvector_3x3.

    Eigenvalues via the trigonometric solution of the characteristic cubic;
    the eigenvector via the largest cross product of rows of (A - lambda I),
    which is numerically robust for well-separated spectra and falls back
    gracefully for near-isotropic neighborhoods.
    """
    tr = a11 + a22 + a33
    q = tr / 3.0
    b11, b22, b33 = a11 - q, a22 - q, a33 - q
    p2 = (b11 * b11 + b22 * b22 + b33 * b33
          + 2.0 * (a12 * a12 + a13 * a13 + a23 * a23)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = (b11 * (b22 * b33 - a23 * a23)
            - a12 * (a12 * b33 - a23 * a13)
            + a13 * (a12 * a23 - b22 * a13))
    r = jnp.clip(detb / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # rows of M = A - eig3*I
    m11, m22, m33 = a11 - eig3, a22 - eig3, a33 - eig3
    # cross products of row pairs (r0, r1), (r0, r2), (r1, r2)
    def cross(u1, u2, u3, v1, v2, v3):
        return (u2 * v3 - u3 * v2, u3 * v1 - u1 * v3, u1 * v2 - u2 * v1)

    c01 = cross(m11, a12, a13, a12, m22, a23)
    c02 = cross(m11, a12, a13, a13, a23, m33)
    c12 = cross(a12, m22, a23, a13, a23, m33)

    def nrm2(c):
        return c[0] * c[0] + c[1] * c[1] + c[2] * c[2]

    n01, n02, n12 = nrm2(c01), nrm2(c02), nrm2(c12)
    best12 = n12 >= jnp.maximum(n01, n02)
    best02 = (n02 >= n01) & ~best12
    vec = tuple(jnp.where(best12, c12[i],
                          jnp.where(best02, c02[i], c01[i]))
                for i in range(3))
    inv = jax.lax.rsqrt(jnp.maximum(nrm2(vec), 1e-30))
    return tuple(v * inv for v in vec), eig3


def smallest_eigenvector_3x3(a: jnp.ndarray):
    """Matrix-shaped wrapper over smallest_eigenpair_sym3.

    a: (..., 3, 3) symmetric. Returns (eigvec (..., 3), eigval (...,)).
    Prefer the component API in hot code — (..., 3, 3) arrays pad both
    minor dims on TPU (3 -> 8 sublanes x 3 -> 128 lanes).
    """
    (v1, v2, v3), eig3 = smallest_eigenpair_sym3(
        a[..., 0, 0], a[..., 0, 1], a[..., 0, 2],
        a[..., 1, 1], a[..., 1, 2], a[..., 2, 2])
    return jnp.stack([v1, v2, v3], axis=-1), eig3


def estimate_normals(points: jnp.ndarray, nbrs: NeighborLists,
                     viewpoint=(0.0, 0.0, 0.0)) -> Normals:
    """PCA normals over precomputed neighbor lists.

    points: (N, 3); nbrs from radius_neighbors (self included).
    """
    dtype = points.dtype
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    w = nbrs.valid.astype(dtype)                   # (N, K)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)     # (N,)

    def moments(ca, ca_mean, cb, cb_mean):
        # E[(a - mean_a)(b - mean_b)] over valid neighbors
        return jnp.sum(w * (ca - ca_mean[:, None]) * (cb - cb_mean[:, None]),
                       axis=1) / cnt

    xs, ys, zs = x[nbrs.idx], y[nbrs.idx], z[nbrs.idx]   # (N, K) each
    mx = jnp.sum(w * xs, axis=1) / cnt
    my = jnp.sum(w * ys, axis=1) / cnt
    mz = jnp.sum(w * zs, axis=1) / cnt
    cxx = moments(xs, mx, xs, mx)
    cxy = moments(xs, mx, ys, my)
    cxz = moments(xs, mx, zs, mz)
    cyy = moments(ys, my, ys, my)
    cyz = moments(ys, my, zs, mz)
    czz = moments(zs, mz, zs, mz)

    (n1, n2, n3), lam_min = smallest_eigenpair_sym3(
        cxx, cxy, cxz, cyy, cyz, czz)
    trace = cxx + cyy + czz
    curvature = lam_min / jnp.maximum(trace, 1e-30)

    # Orient toward the viewpoint (PCL flipNormalTowardsViewpoint).
    vp = jnp.asarray(viewpoint, dtype)
    flip = (n1 * (vp[0] - x) + n2 * (vp[1] - y) + n3 * (vp[2] - z)) < 0
    sign = jnp.where(flip, -1.0, 1.0)
    n1, n2, n3 = n1 * sign, n2 * sign, n3 * sign

    valid = jnp.sum(nbrs.valid, axis=1) >= 3
    ok = valid.astype(dtype)
    normal = jnp.stack([n1 * ok, n2 * ok, n3 * ok], axis=-1)
    # Zero-covariance slots otherwise yield lam_min ~ -1e-15 over the 1e-30
    # trace floor = astronomical garbage curvature.
    curvature = jnp.where(valid, curvature, 0.0)
    return Normals(normal, curvature, valid)
