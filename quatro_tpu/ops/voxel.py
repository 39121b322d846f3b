"""Voxel-grid downsampling (centroid per occupied voxel).

The reference wraps ``pcl::VoxelGrid`` (reference: include/quatro.hpp:49-68,
invoked at examples/run_global_registration.cpp:206-207), which computes the
centroid of the points in each occupied leaf.

TPU-native design (round 3, scatter-free): on TPU every random-access
gather/scatter element costs a tile-sized DMA (~8 ns measured), so the
former argsort -> gather -> segment_sum -> scatter chain spent ~19 ms per
131k-point cloud almost entirely in data movement. This version moves data
exclusively through ONE sorting network and regular scans:

  1. one ``lax.sort`` over a single 30-bit voxel key carries the payloads
     (voxel-corner-relative fractional coordinates + validity) through the
     sort network — no index materialization, no gathers;
  2. run-length bookkeeping (per-voxel counts, run starts) via compare /
     cumsum / flipped-cummin scans — regular memory access only;
  3. per-voxel centroid sums via global cumsum DIFFERENCES at run
     boundaries. Summing corner-relative fractions (|f| < leaf) keeps the
     global cumsum magnitude ~1e4 smaller than raw coordinates would be;
     worst-case f32 prefix-difference error is ~1e-2 leaf units (~3 mm at
     the 0.3 m default — well under sensor noise; pinned in
     tests/test_ops.py against the float64 oracle);
  4. only V-sized (= capacity, 8192 default) gathers remain: top-k run
     starts and the final centroid/key lookups.

Static output capacity + mask replaces the dynamically sized filtered
cloud.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Cells per axis: 10 bits each, packed into one non-negative int32 key.
# At a 0.3 m leaf this spans 307 m — comfortably beyond LiDAR range; points
# outside are dropped (pathological clouds only).
_BITS = 10
_GRID = 1 << _BITS


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray,
                     voxel_size: float, capacity: int):
    """Centroid-per-voxel downsampling.

    points: (N, 3); mask: (N,). Returns (out_points (capacity, 3),
    out_mask (capacity,)).

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
    x, y, z = points[:, 0], points[:, 1], points[:, 2]

    minb = jnp.min(jnp.where(mask[:, None], points,
                             jnp.asarray(jnp.inf, dtype)), axis=0)
    cx = jnp.floor((x - minb[0]) * inv)
    cy = jnp.floor((y - minb[1]) * inv)
    cz = jnp.floor((z - minb[2]) * inv)
    in_grid = (mask & (cx >= 0) & (cx < _GRID) & (cy >= 0) & (cy < _GRID)
               & (cz >= 0) & (cz < _GRID))
    cx = jnp.where(in_grid, cx, 0.0)
    cy = jnp.where(in_grid, cy, 0.0)
    cz = jnp.where(in_grid, cz, 0.0)
    key = (cx.astype(jnp.int32) << (2 * _BITS)) \
        + (cy.astype(jnp.int32) << _BITS) + cz.astype(jnp.int32)
    key = jnp.where(in_grid, key, jnp.iinfo(jnp.int32).max)  # invalid last

    # Corner-relative fractions in leaf units: bounded [0, 1), so the
    # global prefix sums below stay small enough for f32 differences.
    fx = jnp.where(in_grid, (x - minb[0]) * inv - cx, 0.0)
    fy = jnp.where(in_grid, (y - minb[1]) * inv - cy, 0.0)
    fz = jnp.where(in_grid, (z - minb[2]) * inv - cz, 0.0)

    key_s, fx_s, fy_s, fz_s, valid_s = jax.lax.sort(
        (key, fx, fy, fz, in_grid.astype(jnp.float32)), num_keys=1)
    valid_b = valid_s > 0

    pos = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate([jnp.ones(1, bool),
                              key_s[1:] != key_s[:-1]]) & valid_b
    # next run start after each position (inclusive scan from the right);
    # the sentinel handles the final run.
    start_pos = jnp.where(is_new, pos, n)
    next_start = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.where(jnp.concatenate([is_new[1:], jnp.ones(1, bool)]),
                  pos + 1, n))))
    # run length at run-start positions (garbage elsewhere, masked by
    # is_new); invalid tail never starts a run.
    run_len = jnp.where(is_new, next_start - start_pos, 0)

    # top-`capacity` voxels by occupancy; ties toward lower position
    # (= lower voxel key, matching the previous implementation).
    k = min(capacity, n)
    counts_top, starts_top = jax.lax.top_k(run_len, k)

    csx = jnp.cumsum(fx_s)
    csy = jnp.cumsum(fy_s)
    csz = jnp.cumsum(fz_s)

    def run_sum(cs):
        ends = starts_top + counts_top            # exclusive end
        hi = cs[jnp.clip(ends - 1, 0, n - 1)]
        lo = jnp.where(starts_top > 0, cs[jnp.maximum(starts_top - 1, 0)],
                       0.0)
        return hi - lo

    out_mask = counts_top > 0
    cnt = jnp.maximum(counts_top, 1).astype(dtype)
    kk = key_s[jnp.minimum(starts_top, n - 1)]
    kx = (kk >> (2 * _BITS)).astype(dtype)
    ky = ((kk >> _BITS) & (_GRID - 1)).astype(dtype)
    kz = (kk & (_GRID - 1)).astype(dtype)
    leaf = jnp.asarray(voxel_size, dtype)
    ox = minb[0] + (kx + run_sum(csx) / cnt) * leaf
    oy = minb[1] + (ky + run_sum(csy) / cnt) * leaf
    oz = minb[2] + (kz + run_sum(csz) / cnt) * leaf

    if k < capacity:
        pad = capacity - k
        ox = jnp.concatenate([ox, jnp.zeros(pad, dtype)])
        oy = jnp.concatenate([oy, jnp.zeros(pad, dtype)])
        oz = jnp.concatenate([oz, jnp.zeros(pad, dtype)])
        out_mask = jnp.concatenate([out_mask, jnp.zeros(pad, bool)])

    out = jnp.stack([jnp.where(out_mask, ox, 0.0),
                     jnp.where(out_mask, oy, 0.0),
                     jnp.where(out_mask, oz, 0.0)], axis=-1)
    return out, out_mask
