"""Voxel-grid downsampling (centroid per occupied voxel).

The reference wraps ``pcl::VoxelGrid`` (reference: include/quatro.hpp:49-68,
invoked at examples/run_global_registration.cpp:206-207), which computes the
centroid of the points in each occupied leaf.

TPU-native design (round 3 v2, movement-minimized): every N-sized irregular
op (sort operand, scatter, top_k) costs milliseconds per cloud at batch 64
(tools/microbench_ops.py), so the whole stage is TWO lean sorts and scans:

  1. one 2-operand ``lax.sort`` over a 30-bit voxel key carrying the
     corner-relative fractional coordinates PACKED as 10-bit fixed point
     (ONE int32 payload instead of four f32 ones; ~1e-3-leaf
     quantization = 0.3 mm at the 0.3 m leaf, an order below the
     documented ~1e-2-leaf f32 budget);
  2. run-length bookkeeping (per-voxel counts, run starts) via compare /
     cumsum / flipped-cummin scans — regular memory access only;
  3. per-voxel centroid sums via global cumsum DIFFERENCES at run
     boundaries (fractions are bounded by the leaf, keeping the prefix
     magnitudes small; pinned in tests/test_ops.py vs a float64 oracle);
  4. occupancy ranking via ONE single-operand sort of a packed
     (clamped-count-descending << 17 | position) key — replacing
     ``lax.top_k`` (measured ~2x the cost of a 1-op sort);
  5. only V-sized (= capacity, 8192 default) gathers remain.

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
# Fraction fixed-point bits. 15 bits (~9 um at a 0.3 m leaf) ride in TWO
# int32 payloads ((fx<<15|fy), fz). Round 4 shipped 10 bits in ONE payload;
# the advisor flagged that the 0.2 mm quantization step measurably flipped
# planar-aliasing knife-edge poses under the default single-hypothesis
# config (a 4 cm pose became 1.96 m), so the extra sort operand
# (+~0.05 ms/cloud, CLAUDE.md cost model) buys back default-config
# robustness.
_FBITS = 15
_FSCALE = float(1 << _FBITS)
_CBITS = 14                      # clamped occupancy bits in the rank key
_PBITS = 17                      # position bits in the rank key


def _u(c: int) -> "jnp.ndarray":
    import numpy as _np
    return jnp.asarray(_np.uint32(c))


def _part1by2(v: "jnp.ndarray") -> "jnp.ndarray":
    """Spread the low 10 bits of v so consecutive bits land 3 apart
    (Morton interleave component). uint32 internally — the magic masks
    have the sign bit patterns of int32."""
    v = v.astype(jnp.uint32) & _u(0x3FF)
    v = (v | (v << 16)) & _u(0xFF0000FF)
    v = (v | (v << 8)) & _u(0x0300F00F)
    v = (v | (v << 4)) & _u(0x030C30C3)
    v = (v | (v << 2)) & _u(0x09249249)
    return v.astype(jnp.int32)           # 30-bit result: sign-safe


def _compact1by2(v: "jnp.ndarray") -> "jnp.ndarray":
    """Inverse of _part1by2."""
    v = v.astype(jnp.uint32) & _u(0x09249249)
    v = (v | (v >> 2)) & _u(0x030C30C3)
    v = (v | (v >> 4)) & _u(0x0300F00F)
    v = (v | (v >> 8)) & _u(0xFF0000FF)
    v = (v | (v >> 16)) & _u(0x3FF)
    return v.astype(jnp.int32)


@partial(jax.jit, static_argnames=("capacity", "active_cap"))
def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray,
                     voxel_size: float, capacity: int,
                     active_cap: int | None = None):
    """Centroid-per-voxel downsampling.

    points: (N, 3); mask: (N,). Returns (out_points (capacity, 3),
    out_mask (capacity,)).

    Overflow policy: when more than `capacity` voxels are occupied, the
    voxels with the MOST points win (ties toward lower position = lower
    voxel key). Point count is a property of the world geometry, so both
    scans of a pair keep largely the SAME structure — truncating in
    voxel-key order instead would keep a per-scan axis-aligned slab,
    which destroys cross-scan overlap exactly when capacity binds.

    active_cap: static bound on the number of VALID input points. The
    Morton sort pushes invalid entries to the end (sentinel keys), so
    every post-sort op (run-length scans, prefix sums, occupancy
    ranking) runs on the [:active_cap] prefix only — measured round 5:
    the segment clouds this stage consumes carry 5-11% valid points in a
    131072-point capacity, so capacity-sized scans were mostly moving
    sentinels. If MORE than active_cap points are valid, the excess
    (highest Morton keys, a spatial corner) is silently dropped — size
    it with headroom (pipeline default: PipelineConfig.max_segment_points
    = 65536 against typical KITTI-scale segment counts of 30-60k).
    """
    n = points.shape[0]
    assert n <= (1 << _PBITS), "rank-key packing supports up to 131072 pts"
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
    # MORTON (z-curve) key: interleaved cell bits keep the sorted voxel
    # order 3-D-local, so consecutive output voxels form compact blocks —
    # the FPFH/normals pair kernels' per-tile bounding boxes then skip
    # far more tile pairs than with an x-major key, whose 256-voxel tiles
    # were thin full-extent x-slabs (ops/pallas_frontend.py).
    key = (_part1by2(cx.astype(jnp.int32) )
           + (_part1by2(cy.astype(jnp.int32)) << 1)
           + (_part1by2(cz.astype(jnp.int32)) << 2))
    sentinel = jnp.iinfo(jnp.int32).max
    key = jnp.where(in_grid, key, sentinel)  # invalid last

    # Corner-relative fractions in leaf units, 15-bit fixed point, packed
    # into TWO int32 payloads ((fx<<15)|fy, fz) — a 3-operand sort.
    fx = jnp.where(in_grid, (x - minb[0]) * inv - cx, 0.0)
    fy = jnp.where(in_grid, (y - minb[1]) * inv - cy, 0.0)
    fz = jnp.where(in_grid, (z - minb[2]) * inv - cz, 0.0)
    # Clip in FLOAT before the integer cast: clipping after the cast
    # cannot recover a negative (fx/fy/fz are >= 0 in exact f32, but the
    # guard must actually guard).
    fmax = jnp.asarray(float((1 << _FBITS) - 1), dtype)
    qx = jnp.clip(fx * _FSCALE, 0.0, fmax).astype(jnp.int32)
    qy = jnp.clip(fy * _FSCALE, 0.0, fmax).astype(jnp.int32)
    qz = jnp.clip(fz * _FSCALE, 0.0, fmax).astype(jnp.int32)
    pf_xy = (qx << _FBITS) + qy

    key_s, pfxy_s, qz_s = jax.lax.sort((key, pf_xy, qz), num_keys=1)
    if active_cap is not None and active_cap < n:
        key_s = key_s[:active_cap]
        pfxy_s = pfxy_s[:active_cap]
        qz_s = qz_s[:active_cap]
        n = active_cap
    valid_b = key_s != sentinel
    inv_fscale = jnp.asarray(1.0 / _FSCALE, dtype)
    fmask = (1 << _FBITS) - 1
    fx_s = ((pfxy_s >> _FBITS).astype(dtype) + 0.5) * inv_fscale
    fy_s = ((pfxy_s & fmask).astype(dtype) + 0.5) * inv_fscale
    fz_s = (qz_s.astype(dtype) + 0.5) * inv_fscale
    vf = valid_b.astype(dtype)
    fx_s, fy_s, fz_s = fx_s * vf, fy_s * vf, fz_s * vf

    pos = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate([jnp.ones(1, bool),
                              key_s[1:] != key_s[:-1]]) & valid_b
    start_pos = jnp.where(is_new, pos, n)
    next_start = jax.lax.cummin(
        jnp.where(jnp.concatenate([is_new[1:], jnp.ones(1, bool)]),
                  pos + 1, n), reverse=True)
    run_len = jnp.where(is_new, next_start - start_pos, 0)

    # top-`capacity` voxels by occupancy via ONE packed 1-op sort:
    # (clamped 16383-count << 17 | position) ascending == count descending,
    # ties toward lower position (same policy the top_k version had).
    k = min(capacity, n)
    rank_key = jnp.where(
        is_new,
        ((jnp.asarray((1 << _CBITS) - 1, jnp.int32)
          - jnp.minimum(run_len, (1 << _CBITS) - 1)) << _PBITS) + pos,
        sentinel)
    (rank_s,) = jax.lax.sort((rank_key,), num_keys=1)
    # Re-sort the selected voxels back to POSITION (= voxel-key) order:
    # the output is then spatially ordered (Morton blocks), which is
    # what lets the FPFH/normals pair kernels skip far-apart tiles via
    # per-tile bounding boxes (ops/pallas_frontend.py::_tile_bounds). The
    # (capacity,)-sized sort is noise next to the N-sized ones.
    sel_pos = jnp.where(rank_s[:k] != sentinel,
                        rank_s[:k] & ((1 << _PBITS) - 1), n)
    (sel_pos,) = jax.lax.sort((sel_pos,), num_keys=1)
    got = sel_pos < n
    starts_top = jnp.where(got, sel_pos, 0)
    counts_top = jnp.where(got, jnp.take(run_len, starts_top), 0)

    # one 3-row cumsum pass instead of three N-sized scans
    cs3 = jnp.cumsum(jnp.stack([fx_s, fy_s, fz_s]), axis=1)

    # TWO consolidated (3, V) gathers instead of six 1-D ones (a V-sized
    # gather from an N array costs ~0.1 ms each at production shapes)
    ends = starts_top + counts_top                # exclusive end
    hi3 = jnp.take(cs3, jnp.clip(ends - 1, 0, n - 1), axis=1)
    lo3 = jnp.where(starts_top[None, :] > 0,
                    jnp.take(cs3, jnp.maximum(starts_top - 1, 0), axis=1),
                    0.0)
    sums3 = hi3 - lo3

    out_mask = counts_top > 0
    cnt = jnp.maximum(counts_top, 1).astype(dtype)
    kk = key_s[jnp.minimum(starts_top, n - 1)]
    kx = _compact1by2(kk).astype(dtype)
    ky = _compact1by2(kk >> 1).astype(dtype)
    kz = _compact1by2(kk >> 2).astype(dtype)
    leaf = jnp.asarray(voxel_size, dtype)
    ox = minb[0] + (kx + sums3[0] / cnt) * leaf
    oy = minb[1] + (ky + sums3[1] / cnt) * leaf
    oz = minb[2] + (kz + sums3[2] / cnt) * leaf

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
