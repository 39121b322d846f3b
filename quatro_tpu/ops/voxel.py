"""Voxel-grid downsampling (centroid per occupied voxel).

The reference wraps ``pcl::VoxelGrid`` (reference: include/quatro.hpp:49-68,
invoked at examples/run_global_registration.cpp:206-207), which computes the
centroid of the points in each occupied leaf.

TPU-native design: no hash map — integer voxel coordinates pack into a
two-word (hi, lo) key, one lexicographic sort groups points by voxel, and
segment-sums produce centroids. Static output capacity + mask replaces the
dynamically sized filtered cloud.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Cells per axis. 15 bits per axis split across two int32 key words
# (hi = x, lo = y * _GRID + z < 2^30), so no axis ever clips into a
# neighbor: at a 0.3 m leaf this spans 9.8 km, at 0.01 m still 327 m.
_GRID = 1 << 15


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray,
                     voxel_size: float, capacity: int):
    """Centroid-per-voxel downsampling.

    points: (N, 3); mask: (N,). Returns (out_points (capacity, 3),
    out_mask (capacity,)).

    Points beyond _GRID cells from the min corner (pathological: >9.8 km
    extent at the default 0.3 m leaf) are dropped rather than wrapped or
    merged into boundary voxels.

    Overflow policy: when more than `capacity` voxels are occupied, the
    voxels with the MOST points win. Point count is a property of the world
    geometry (surface area / range), so both scans of a pair keep largely
    the SAME structure — truncating in voxel-key order instead would keep a
    per-scan axis-aligned slab (keys are relative to each scan's own min
    corner), which destroys cross-scan overlap exactly when capacity binds.
    """
    n = points.shape[0]
    dtype = points.dtype
    inv = jnp.asarray(1.0 / voxel_size, dtype)

    minb = jnp.min(jnp.where(mask[:, None], points,
                             jnp.asarray(jnp.inf, dtype)), axis=0)
    coords_f = jnp.floor((points - minb) * inv)
    coords_f = jnp.where(mask[:, None], coords_f, 0.0)  # no inf-inf NaNs
    in_grid = mask & jnp.all((coords_f >= 0) & (coords_f < _GRID), axis=1)
    coords = coords_f.astype(jnp.int32)

    big = jnp.iinfo(jnp.int32).max
    key_hi = jnp.where(in_grid, coords[:, 0], big)       # masked sort last
    key_lo = jnp.where(in_grid, coords[:, 1] * _GRID + coords[:, 2], big)

    order = jnp.lexsort((key_lo, key_hi))                # primary: key_hi
    hi_s = key_hi[order]
    lo_s = key_lo[order]
    pts_s = points[order]
    valid_s = in_grid[order]

    is_new = jnp.concatenate(
        [jnp.ones(1, bool),
         (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]) & valid_s
    rank = jnp.cumsum(is_new) - 1                     # voxel id per point
    rank = jnp.where(valid_s, rank, n - 1)            # park masked points

    # per-voxel point counts at full resolution (<= n distinct voxels)
    counts_all = jax.ops.segment_sum(valid_s.astype(jnp.int32), rank,
                                     num_segments=n)
    # top-`capacity` voxels by count; ties broken toward lower voxel id
    _, chosen = jax.lax.top_k(counts_all, min(capacity, n))
    slot_of_voxel = jnp.full((n,), capacity, jnp.int32).at[chosen].set(
        jnp.arange(chosen.shape[0], dtype=jnp.int32))

    seg = jnp.where(valid_s, slot_of_voxel[rank], capacity)
    in_cap = seg < capacity
    sums = jax.ops.segment_sum(
        jnp.where(in_cap[:, None], pts_s, 0.0), seg,
        num_segments=capacity + 1)[:capacity]
    counts = jax.ops.segment_sum(in_cap.astype(dtype), seg,
                                 num_segments=capacity + 1)[:capacity]
    out_mask = counts > 0
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(out_mask[:, None], centroids, 0.0), out_mask
