"""Linear-algebra extras for API parity with teaser::linalg / teaser::utils.

The reference ships these alongside the solver (include/teaser/linalg.h:
24-99 — hatmap, OpenMP vectorKron, nearest-PSD projection; and
include/teaser/utils.h:33-200 — sampling, diameter, masking helpers). None
are on Quatro's hot path, but users of the reference API expect them. The
OpenMP kron collapses to one jnp op; masking helpers operate on static
capacity + mask pairs instead of dynamic vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hatmap(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of (..., 3) vectors
    (reference: include/teaser/linalg.h:24-38)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def vector_kron(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Column-wise Kronecker product of (N, d1) x (N, d2) -> (N, d1*d2)
    (the reference's OpenMP collapse(2) loop, include/teaser/linalg.h:40-70,
    is a single outer product here)."""
    return (v1[..., :, None] * v2[..., None, :]).reshape(
        *v1.shape[:-1], v1.shape[-1] * v2.shape[-1])


def nearest_psd(a: jnp.ndarray) -> jnp.ndarray:
    """Project a symmetric matrix to the PSD cone by eigenvalue clipping
    (reference: include/teaser/linalg.h:72-99)."""
    w, v = jnp.linalg.eigh((a + a.swapaxes(-1, -2)) / 2)
    w = jnp.maximum(w, 0.0)
    return (v * w[..., None, :]) @ v.swapaxes(-1, -2)


def calculate_diameter(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """2 * max distance from the masked centroid
    (reference: include/teaser/utils.h:109-114)."""
    w = mask.astype(points.dtype)[:, None]
    cog = jnp.sum(points * w, 0) / jnp.maximum(jnp.sum(w), 1.0)
    d2 = jnp.sum((points - cog) ** 2, -1)
    return 2.0 * jnp.sqrt(jnp.max(jnp.where(mask, d2, 0.0)))


def random_sample_mask(key, mask: jnp.ndarray, num_samples: int):
    """Uniform sample (w/o replacement) of `num_samples` set bits of `mask`,
    returned as a new mask (reference randomSample, utils.h:33-58, without
    the dynamic output vector)."""
    n = mask.shape[0]
    scores = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
    thresh_idx = jnp.minimum(num_samples, jnp.sum(mask)).astype(jnp.int32)
    order = jnp.argsort(-scores)
    sel = jnp.zeros(n, bool).at[order].set(jnp.arange(n) < thresh_idx)
    return sel & mask


def mask_indices(mask: jnp.ndarray, fill: int = -1) -> jnp.ndarray:
    """Compacted indices of set bits, padded with `fill` (the static-shape
    analog of findNonzero, utils.h:192-200)."""
    n = mask.shape[0]
    iota = jnp.arange(n)
    order = jnp.argsort(jnp.where(mask, iota, n + iota))
    count = jnp.sum(mask)
    return jnp.where(iota < count, order, fill)
