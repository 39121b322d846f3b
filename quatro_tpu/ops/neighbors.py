"""Fixed-radius K-capped neighbor search.

The reference uses per-point kd-tree radius queries inside PCL's OMP normal
and FPFH estimators (reference: src/teaser_utils/fpfh.cc:58-72). Pointer
chasing a kd-tree is hostile to the TPU; at front-end scale (<=16k voxelized
points) a tiled brute-force distance matrix is a handful of MXU matmuls and
beats tree construction outright.

Design: queries are processed in tiles of `tile` rows; each tile computes a
(tile, N) squared-distance block via the Gram identity and keeps its K
nearest within the radius with one top_k. `lax.map` over tiles bounds peak
memory at tile*N floats.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class NeighborLists(NamedTuple):
    idx: jax.Array    # (N, K) int32 neighbor indices (self included first)
    valid: jax.Array  # (N, K) bool — inside radius & real point
    dist2: jax.Array  # (N, K) f32 squared distances


def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray,
                      sq_a: jnp.ndarray | None = None,
                      sq_b: jnp.ndarray | None = None) -> jnp.ndarray:
    """(Na, Nb) squared L2 distances via the Gram identity, clamped at 0.

    The cancellation-prone |a|^2 + |b|^2 - 2<a,b> form is computed with
    HIGHEST matmul precision; shared by neighbor search and descriptor
    matching so the numerics live in exactly one place."""
    if sq_a is None:
        sq_a = jnp.sum(a * a, axis=-1)
    if sq_b is None:
        sq_b = jnp.sum(b * b, axis=-1)
    gram = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(sq_a[:, None] + sq_b[None, :] - 2.0 * gram, 0.0)


@partial(jax.jit, static_argnames=("k", "tile"))
def radius_neighbors(points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                     k: int, tile: int = 512) -> NeighborLists:
    """K nearest neighbors within `radius` for every point (against itself).

    points: (N, 3), mask: (N,). N must be a multiple of `tile` (pad first).
    Self always appears (distance 0) when k >= 1.
    """
    n = points.shape[0]
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    dtype = points.dtype
    r2 = jnp.asarray(radius * radius, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    sq = jnp.sum(points * points, axis=-1)

    def one_tile(start):
        q = jax.lax.dynamic_slice_in_dim(points, start, tile)
        qsq = jax.lax.dynamic_slice_in_dim(sq, start, tile)
        qmask = jax.lax.dynamic_slice_in_dim(mask, start, tile)
        d2 = pairwise_sq_dists(q, points, sq_a=qsq, sq_b=sq)
        # masked columns get +inf, so they can never pass the radius test
        d2 = jnp.where(mask[None, :], d2, big)
        neg, idx = jax.lax.top_k(-d2, k)
        d2k = -neg
        valid = (d2k <= r2) & qmask[:, None]
        return idx.astype(jnp.int32), valid, d2k

    starts = jnp.arange(0, n, tile)
    idx, valid, d2 = jax.lax.map(one_tile, starts)
    return NeighborLists(idx.reshape(n, k), valid.reshape(n, k),
                         d2.reshape(n, k))
