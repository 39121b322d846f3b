"""Voxel-grid downsampling (centroid per occupied voxel).

The reference wraps ``pcl::VoxelGrid`` (reference: include/quatro.hpp:49-68,
invoked at examples/run_global_registration.cpp:206-207), which computes the
centroid of the points in each occupied leaf.

TPU-native design: no hash map — integer voxel coordinates pack into one
int32 key, a single sort groups points by voxel, and segment-sums produce
centroids. Static output capacity + mask replaces the dynamically sized
filtered cloud.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Cells per axis for the packed voxel key (3 x 10 bits < int32). At the
# default 0.3 m leaf this spans 307 m per axis — beyond any LiDAR return.
_GRID = 1024


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray,
                     voxel_size: float, capacity: int):
    """Centroid-per-voxel downsampling.

    points: (N, 3); mask: (N,). Returns (out_points (capacity, 3),
    out_mask (capacity,)). Voxels beyond `capacity` (in voxel-key order)
    are dropped.
    """
    n = points.shape[0]
    dtype = points.dtype
    inv = jnp.asarray(1.0 / voxel_size, dtype)

    minb = jnp.min(jnp.where(mask[:, None], points,
                             jnp.asarray(jnp.inf, dtype)), axis=0)
    coords = jnp.clip(jnp.floor((points - minb) * inv).astype(jnp.int32),
                      0, _GRID - 1)
    key = (coords[:, 0] * _GRID + coords[:, 1]) * _GRID + coords[:, 2]
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)  # masked sort last

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = points[order]
    valid_s = mask[order]

    is_new = jnp.concatenate([jnp.ones(1, bool),
                              key_s[1:] != key_s[:-1]]) & valid_s
    rank = jnp.cumsum(is_new) - 1                     # voxel id per point
    in_cap = valid_s & (rank < capacity) & (rank >= 0)
    seg = jnp.where(in_cap, rank, capacity)           # overflow -> dump slot

    sums = jax.ops.segment_sum(
        jnp.where(in_cap[:, None], pts_s, 0.0), seg,
        num_segments=capacity + 1)[:capacity]
    counts = jax.ops.segment_sum(in_cap.astype(dtype), seg,
                                 num_segments=capacity + 1)[:capacity]
    out_mask = counts > 0
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(out_mask[:, None], centroids, 0.0), out_mask
