"""Fused Pallas front-end: radius normals + SPFH + FPFH in VMEM.

The north-star kernels (BASELINE.md): "voxel-sampled FPFH descriptor
extraction ... as Pallas kernels over HBM-resident point clouds". The XLA
dense formulation (ops/dense_features.py — same semantics, reference:
src/teaser_utils/fpfh.cc:44-75) is semantically complete but materializes
dozens of (T, V) f32 intermediates per lax.map step in HBM: XLA's cost
analysis showed ~140 GB of HBM traffic per pair against ~3 MB of actual
input, capping the round-2 pipeline at ~2.8 pairs/s (HBM roofline ~5.8).

Here every (T, C) pair tile lives and dies in VMEM; HBM sees only the
inputs (points ~100 KB/cloud) and outputs (descriptors ~1 MB/cloud):

  kernel 1 (moments): grid (rows/T, cols/C); each cell accumulates the ten
    centered neighborhood moment sums (count, sum dx.., sum dx*dx..) of its
    row tile over one column chunk into a revisited (T, 16) output block.
    The 3x3 eigensolve on the accumulated moments is O(V) XLA work.
  kernel 2 (SPFH): same grid; Darboux angles per in-radius pair and the
    3 x 11-bin histogram accumulated as 33 masked row reductions, all on
    VMEM-resident (T, C) temporaries. Output (T, 48): 33 bins + pair count.
  kernel 3 (FPFH): FPFH_i = sum_j SPFH_j / d2_ij over in-radius pairs ==
    a masked-weight matmul per tile: (T, C) weights @ (C, 33) SPFH on the
    MXU, accumulated over column chunks.

Numerical contract: identical formulas to dense_features (shared reference
semantics), but per-chunk accumulation reorders the f32 sums — equivalence
tests use tolerances, not bit equality. All matmuls request HIGHEST / f32
accumulation per the repo precision convention (docs/architecture.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quatro_tpu.ops.fpfh import FPFH_DIM, NUM_BINS
from quatro_tpu.ops.normals import Normals, smallest_eigenpair_sym3

# Row-tile and column-chunk sizes. (T, C) f32 temporaries are 2 MB; the
# SPFH kernel keeps ~a dozen alive — inside the raised 100 MB VMEM budget
# (_BIG_VMEM below). Doubling both from 256/512 quarters the grid-step
# count, which dominates once the bbox skip removes most tile compute.
_T = 512
_C = 1024
_TNN = 256     # NN-kernel row tile (its own size: the matcher gates on
               # multiples of 256, and its VMEM needs differ)
_BIG_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_MOM = 16      # moment output lanes: 10 used, padded to a round 16
_HIST = 48     # SPFH output lanes: 33 bins + count at 33, padded to 48


def _tile_bounds(points: jnp.ndarray, maskf: jnp.ndarray, tile: int):
    """(V/tile, 8) per-tile AABBs of the VALID points: [min xyz, pad,
    max xyz, pad]. Empty tiles get [+inf, -inf] bounds (never in radius)."""
    v = points.shape[0]
    p = points.reshape(v // tile, tile, 3)
    m = (maskf > 0).reshape(v // tile, tile, 1)
    big = jnp.asarray(jnp.inf, points.dtype)
    lo = jnp.min(jnp.where(m, p, big), axis=1)
    hi = jnp.max(jnp.where(m, p, -big), axis=1)
    pad = jnp.zeros((v // tile, 1), points.dtype)
    return jnp.concatenate([lo, pad, hi, pad], axis=1)


def _bbox_in_radius(rbb, cbb, r2):
    """True when the two tile AABBs are within sqrt(r2): per-dim gap =
    max(0, lo_a - hi_b, lo_b - hi_a), summed in squares. Scalar SMEM math
    that skips the O(T*C) tile body for far-apart tiles — voxel output is
    spatially ordered (x-major key order), so most tile pairs are far
    beyond the 0.5-0.75 m feature radii. rbb/cbb are the FULL (tiles, 8)
    SMEM tables (Mosaic requires whole-array scalar blocks); this tile's
    rows are selected by program id."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    gap2 = jnp.asarray(0.0, jnp.float32)
    for d in range(3):
        g = jnp.maximum(rbb[i, d] - cbb[j, 4 + d],
                        cbb[j, d] - rbb[i, 4 + d])
        g = jnp.maximum(g, 0.0)
        gap2 = gap2 + g * g
    # inf - inf = nan for empty tiles: nan <= r2 is False -> skipped
    return gap2 <= r2


def _pair_geometry(rows_ref, colsT_ref):
    """(T, C) component offsets dx = x_i - x_j and squared distance from a
    (T, 3) row block and a (3, C) transposed column block."""
    dx = rows_ref[:, 0:1] - colsT_ref[0:1, :]
    dy = rows_ref[:, 1:2] - colsT_ref[1:2, :]
    dz = rows_ref[:, 2:3] - colsT_ref[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    return (dx, dy, dz), d2


def _moments_kernel(r2: float, lim, rbb, cbb, rows, colsT, mrow, mcol,
                    out):
    """Accumulate the ten centered moment sums of this row tile over one
    column chunk. out: (T, _MOM) revisited across the column grid axis.
    lim: (1, 2) SMEM [row-tile, col-chunk] active counts — grid cells past
    the last valid point are skipped (clouds rarely fill their static
    capacity; the fixture scans occupy ~2k of 8192 voxel slots); rbb/cbb
    are per-tile AABBs — tile pairs farther apart than the radius skip
    the body entirely (the voxel order is spatial)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    @pl.when((i < lim[0, 0]) & (j < lim[0, 1])
             & _bbox_in_radius(rbb, cbb, r2))
    def _():  # noqa: E306
        (dx, dy, dz), d2 = _pair_geometry(rows, colsT)
        a = mrow[:] * mcol[:] * (d2 <= r2).astype(dx.dtype)

        def rsum(v):
            return jnp.sum(v, axis=1, keepdims=True)

        cols = [rsum(a), rsum(a * dx), rsum(a * dy), rsum(a * dz),
                rsum(a * dx * dx), rsum(a * dx * dy), rsum(a * dx * dz),
                rsum(a * dy * dy), rsum(a * dy * dz), rsum(a * dz * dz)]
        upd = jnp.concatenate(
            cols + [jnp.zeros((dx.shape[0], _MOM - len(cols)), dx.dtype)],
            axis=1)
        out[:] = out[:] + upd


def _spfh_kernel(r2: float, lim, rbb, cbb, rows, colsT, nrows, ncolsT,
                 mrow, mcol, out):
    """Darboux-angle histogram of this row tile over one column chunk.
    out: (T, _HIST) = [33 bin sums | pair count | pad], revisited.
    lim: (1, 2) SMEM active [row-tile, col-chunk] counts; rbb/cbb as in
    _moments_kernel."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    @pl.when((i < lim[0, 0]) & (j < lim[0, 1])
             & _bbox_in_radius(rbb, cbb, r2))
    def _():
        _spfh_body(r2, rows, colsT, nrows, ncolsT, mrow, mcol, out)


def _spfh_body(r2, rows, colsT, nrows, ncolsT, mrow, mcol, out):
    (dx, dy, dz), d2 = _pair_geometry(rows, colsT)
    both = mrow[:] * mcol[:]
    ok = (both > 0) & (d2 <= r2) & (d2 > 1e-12)          # skip self

    n_i = (nrows[:, 0:1], nrows[:, 1:2], nrows[:, 2:3])
    n_j = (ncolsT[0:1, :], ncolsT[1:2, :], ncolsT[2:3, :])

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    # pair_features semantics (ops/fpfh.py): d points i -> j = -offset
    d = (-dx, -dy, -dz)
    inv_dist = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
    angle1 = dot(n_i, d) * inv_dist
    angle2 = dot(n_j, d) * inv_dist
    swap = jnp.abs(angle1) < jnp.abs(angle2)
    n1s = tuple(jnp.where(swap, n_j[i], n_i[i]) for i in range(3))
    n2s = tuple(jnp.where(swap, n_i[i], n_j[i]) for i in range(3))
    ds = tuple(jnp.where(swap, -d[i], d[i]) for i in range(3))
    f3 = jnp.where(swap, -angle2, angle1)
    vv = cross(ds, n1s)
    v_norm2 = dot(vv, vv)
    ok = ok & (d2 > 0) & (v_norm2 > 1e-20)
    inv = jax.lax.rsqrt(jnp.maximum(v_norm2, 1e-30))
    vv = tuple(cc * inv for cc in vv)
    ww = cross(n1s, vv)
    f2 = dot(vv, n2s)
    # f1 = atan2(y1, x1) is only ever BINNED, and Mosaic has no atan
    # lowering — so bin it geometrically: angle in [theta_k, theta_k + d)
    # iff the (x1, y1) vector rotated by -theta_k lands in the first
    # sector (y' >= 0 and x' sin d > y' cos d). Exact bin-edge semantics
    # match floor(11*(f1+pi)/(2pi)) up to f32 rounding at the edges.
    y1 = dot(ww, n2s)
    x1 = dot(n1s, n2s)

    af = ok.astype(dx.dtype)

    def bins(f, lo, hi):
        idx = jnp.floor(NUM_BINS * (f - lo) / (hi - lo)).astype(jnp.int32)
        return jnp.clip(idx, 0, NUM_BINS - 1)

    import math
    delta = 2.0 * math.pi / NUM_BINS
    sd, cd = math.sin(delta), math.cos(delta)
    cols = []
    for k in range(NUM_BINS):
        th = -math.pi + k * delta
        ck, sk = math.cos(th), math.sin(th)
        xr = x1 * ck + y1 * sk
        yr = -x1 * sk + y1 * ck
        in_k = (yr >= 0) & (xr * sd - yr * cd > 0)
        cols.append(jnp.sum(jnp.where(in_k, af, 0.0), axis=1,
                            keepdims=True))
    b2 = bins(f2, -1.0, 1.0)
    b3 = bins(f3, -1.0, 1.0)
    cols += [jnp.sum(jnp.where(b == k, af, 0.0), axis=1, keepdims=True)
             for b in (b2, b3) for k in range(NUM_BINS)]
    cols.append(jnp.sum(af, axis=1, keepdims=True))      # pair count
    upd = jnp.concatenate(
        cols + [jnp.zeros((dx.shape[0], _HIST - len(cols)), dx.dtype)],
        axis=1)
    out[:] = out[:] + upd


def _fpfh_kernel(r2: float, lim, rbb, cbb, rows, colsT, spfh_c, mrow,
                 mcol, out):
    """FPFH weighted-SPFH accumulation: (T, C) weights @ (C, 33) SPFH on
    the MXU. out: (T, FPFH_DIM) revisited across the column grid axis.
    lim: (1, 2) SMEM active [row-tile, col-chunk] counts; rbb/cbb as in
    _moments_kernel."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    @pl.when((i < lim[0, 0]) & (j < lim[0, 1])
             & _bbox_in_radius(rbb, cbb, r2))
    def _():
        _, d2 = _pair_geometry(rows, colsT)
        both = mrow[:] * mcol[:]
        w = jnp.where((both > 0) & (d2 <= r2) & (d2 > 1e-12),
                      1.0 / jnp.maximum(d2, 1e-12), 0.0)
        # f32 MXU accumulation (repo precision convention): descriptor
        # bins must not absorb bf16 contraction noise.
        out[:] = out[:] + jax.lax.dot_general(
            w, spfh_c[:], dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)


def _tiles(v: int):
    """Per-call tile sizes: the static _T/_C clamped to the cloud
    capacity (small configs run V=512-2048)."""
    return min(_T, v), min(_C, v)


def _grid_specs(v: int):
    """Common (rows, cols) grid + block specs for the pair-tile kernels."""
    t, c = _tiles(v)
    grid = (v // t, v // c)
    lim = pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                       memory_space=pltpu.SMEM)
    # bbox tables live WHOLE in SMEM (the in-radius predicate is scalar
    # math consumed by pl.when; Mosaic scalar blocks must span the array)
    rbb = pl.BlockSpec((v // t, 8), lambda i, j: (0, 0),
                       memory_space=pltpu.SMEM)
    cbb = pl.BlockSpec((v // c, 8), lambda i, j: (0, 0),
                       memory_space=pltpu.SMEM)
    row3 = pl.BlockSpec((t, 3), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    colT = pl.BlockSpec((3, c), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)
    mrow = pl.BlockSpec((t, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    mcol = pl.BlockSpec((1, c), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)
    return grid, lim, rbb, cbb, row3, colT, mrow, mcol


def _active_limits(maskf: jnp.ndarray) -> jnp.ndarray:
    """(1, 2) int32 [active row tiles, active col chunks]: tiles past the
    LAST valid entry are skipped by the kernels. Correct for any mask
    pattern (holes inside the prefix still participate); callers that pack
    valid entries first (voxel_downsample does) get the full win."""
    n = maskf.shape[0]
    t, c = _tiles(n)
    iota = jnp.arange(n, dtype=jnp.int32)
    last = jnp.max(jnp.where(maskf > 0, iota + 1, 0))
    return jnp.stack([(last + t - 1) // t,
                      (last + c - 1) // c]).astype(jnp.int32)[None, :]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def moment_sums_pallas(points: jnp.ndarray, maskf: jnp.ndarray,
                       radius: float, interpret: bool = False):
    """Ten centered neighborhood moment sums per point, (V, _MOM) f32.

    points: (V, 3) f32; maskf: (V,) f32 0/1. V % lcm(_T, _C) == 0.
    Columns: [count, s_dx, s_dy, s_dz, s_dxdx, s_dxdy, s_dxdz, s_dydy,
    s_dydz, s_dzdz, 0...] where dx = x_i - x_j over in-radius valid pairs
    (self included, as in dense_normals).
    """
    v = points.shape[0]
    t, c = _tiles(v)
    assert v % t == 0 and v % c == 0, f"V={v} vs tiles ({t},{c})"
    grid, lim, rbb, cbb, row3, colT, mrow, mcol = _grid_specs(v)
    out_spec = pl.BlockSpec((t, _MOM), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_moments_kernel, radius * radius),
        grid=grid,
        in_specs=[lim, rbb, cbb, row3, colT, mrow, mcol],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((v, _MOM), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_active_limits(maskf), _tile_bounds(points, maskf, t),
      _tile_bounds(points, maskf, c), points, points.T, maskf[:, None],
      maskf[None, :])


def normals_from_moments(points: jnp.ndarray, mask: jnp.ndarray,
                         mom: jnp.ndarray,
                         viewpoint=(0.0, 0.0, 0.0)) -> Normals:
    """Closed-form 3x3 eigensolve on accumulated moment sums — O(V) XLA
    work, identical math to dense_normals (ops/dense_features.py:90-115)."""
    dtype = points.dtype
    c = mom[:, 0]
    cnt = jnp.maximum(c, 1.0)
    mdx, mdy, mdz = mom[:, 1] / cnt, mom[:, 2] / cnt, mom[:, 3] / cnt
    cxx = mom[:, 4] / cnt - mdx * mdx
    cxy = mom[:, 5] / cnt - mdx * mdy
    cxz = mom[:, 6] / cnt - mdx * mdz
    cyy = mom[:, 7] / cnt - mdy * mdy
    cyz = mom[:, 8] / cnt - mdy * mdz
    czz = mom[:, 9] / cnt - mdz * mdz

    (n1, n2, n3), lam_min = smallest_eigenpair_sym3(
        cxx, cxy, cxz, cyy, cyz, czz)
    trace = cxx + cyy + czz
    curvature = lam_min / jnp.maximum(trace, 1e-30)

    vp = jnp.asarray(viewpoint, dtype)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    flip = (n1 * (vp[0] - x) + n2 * (vp[1] - y) + n3 * (vp[2] - z)) < 0
    sign = jnp.where(flip, -1.0, 1.0)

    valid = (c >= 3) & mask
    ok = valid.astype(dtype)
    normal = jnp.stack([n1 * sign * ok, n2 * sign * ok, n3 * sign * ok],
                       axis=-1)
    curvature = jnp.where(valid, curvature, 0.0)
    return Normals(normal, curvature, valid)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def frontend_normals(points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                     interpret: bool = False) -> Normals:
    """Drop-in for dense_normals: PCA normals over true radius
    neighborhoods, moment pass in VMEM."""
    maskf = mask.astype(points.dtype)
    mom = moment_sums_pallas(points, maskf, radius, interpret=interpret)
    return normals_from_moments(points, mask, mom)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def spfh_pallas(points: jnp.ndarray, normals: jnp.ndarray,
                pair_maskf: jnp.ndarray, radius: float,
                interpret: bool = False):
    """Raw SPFH bin sums + pair counts: (V, 33) and (V,) f32."""
    v = points.shape[0]
    t, c = _tiles(v)
    assert v % t == 0 and v % c == 0, f"V={v} vs tiles ({t},{c})"
    grid, lim, rbb, cbb, row3, colT, mrow, mcol = _grid_specs(v)
    out_spec = pl.BlockSpec((t, _HIST), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    hist = pl.pallas_call(
        functools.partial(_spfh_kernel, radius * radius),
        grid=grid,
        in_specs=[lim, rbb, cbb, row3, colT, row3, colT, mrow, mcol],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((v, _HIST), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_active_limits(pair_maskf), _tile_bounds(points, pair_maskf, t),
      _tile_bounds(points, pair_maskf, c), points, points.T, normals,
      normals.T, pair_maskf[:, None], pair_maskf[None, :])
    return hist[:, :FPFH_DIM], hist[:, FPFH_DIM]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def frontend_fpfh(points: jnp.ndarray, normals: jnp.ndarray,
                  normal_valid: jnp.ndarray, mask: jnp.ndarray,
                  radius: float, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for dense_fpfh: (V, 33) FPFH descriptors, SPFH + weighted
    sum both in VMEM. Same PCL normalization conventions."""
    v = points.shape[0]
    pair_maskf = (mask & normal_valid).astype(points.dtype)
    raw, cnt = spfh_pallas(points, normals, pair_maskf, radius,
                           interpret=interpret)
    spfh = raw * (100.0 / jnp.maximum(cnt, 1.0))[:, None]

    t, c = _tiles(v)
    grid, lim, rbb, cbb, row3, colT, mrow, mcol = _grid_specs(v)
    spfh_spec = pl.BlockSpec((c, FPFH_DIM), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((t, FPFH_DIM), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    fpfh = pl.pallas_call(
        functools.partial(_fpfh_kernel, radius * radius),
        grid=grid,
        in_specs=[lim, rbb, cbb, row3, colT, spfh_spec, mrow, mcol],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((v, FPFH_DIM), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_active_limits(pair_maskf), _tile_bounds(points, pair_maskf, t),
      _tile_bounds(points, pair_maskf, c), points, points.T, spfh,
      pair_maskf[:, None], pair_maskf[None, :])

    out = []
    for s in range(0, FPFH_DIM, NUM_BINS):
        block = fpfh[:, s:s + NUM_BINS]
        total = jnp.maximum(jnp.sum(block, axis=-1, keepdims=True), 1e-12)
        out.append(block * (100.0 / total))
    return jnp.concatenate(out, axis=-1)


def _nn_kernel(lim, rows_d, cols_d, rows_m, cols_m, idx_out,
               d2_out):
    """Running nearest neighbor of each row descriptor over one column
    CHUNK (grid axis 1); out blocks are revisited across chunks. The full
    (V, 33) column set in VMEM pads 33 -> 128 lanes and, with the (T, V)
    distance tile, blew the 16 MB VMEM budget at V=8192 — chunking keeps
    the footprint ~6 MB. rows_d: (T, D); cols_d: (C, D) chunk; masks
    (T, 1)/(1, C) f32; idx_out/d2_out: (T, 1). lim: (1, 2) SMEM active
    (row-tile, col-chunk) counts — skipping is EXACT either way: a
    skipped row tile's outputs are masked by the caller, and a skipped
    column chunk contains only masked columns (all-big distances that
    could never win). Round 5: only ~2-3k of 8192 voxel slots are
    occupied on real scans, so ~half the column chunks carry no valid
    candidate.

    Tie semantics match XLA argmin (first minimum): chunks are visited in
    ascending order and only a STRICTLY smaller distance replaces the
    running minimum; within a chunk the lowest tied column index wins.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        idx_out[:] = jnp.zeros_like(idx_out)
        d2_out[:] = jnp.full_like(d2_out, 3.4e38)

    @pl.when((i < lim[0, 0]) & (j < lim[0, 1]))
    def _():
        a = rows_d[:]
        b = cols_d[:]
        big = jnp.asarray(3.4e38, jnp.float32)
        # ||a-b||^2 = |a|^2 - 2ab + |b|^2; f32 accumulation (descriptor
        # bins are 0..100, bf16 would blur near-ties the crosscheck
        # relies on).
        cross = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        d2 = jnp.maximum(jnp.sum(a * a, axis=1, keepdims=True) - 2.0 * cross
                         + jnp.sum(b * b, axis=1)[None, :], 0.0)
        ok = (rows_m[:] > 0) & (cols_m[:] > 0)
        d2 = jnp.where(ok, d2, big)
        dmin = jnp.min(d2, axis=1, keepdims=True)
        c = d2.shape[1]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        imin = jnp.min(jnp.where(d2 <= dmin, col_ids, c), axis=1,
                       keepdims=True)
        imin = jnp.minimum(imin, c - 1) + j * c
        better = dmin < d2_out[:]
        idx_out[:] = jnp.where(better, imin, idx_out[:])
        d2_out[:] = jnp.where(better, dmin, d2_out[:])


def _nn2_kernel(lim, rows_d, cols_d, rows_m, cols_m, i1_out, d1_out,
                i2_out, d2_out):
    """Two nearest neighbors per row (see _nn_kernel for the chunking and
    skip-exactness story). The second-NN exists for matcher RECALL on
    degenerate-descriptor pairs: round-5 on-chip failure dissection found
    hard pairs whose 1st-NN candidate set carried 1-9 GT-consistent
    matches in ~500 — the true match is often the SECOND neighbor when
    FPFH bins sit on quantization edges. Healthy pairs are unaffected
    (mutual-NN semantics use the first neighbor only; seconds enter only
    the starvation-fallback union, ops/matching.py)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        i1_out[:] = jnp.zeros_like(i1_out)
        d1_out[:] = jnp.full_like(d1_out, 3.4e38)
        i2_out[:] = jnp.zeros_like(i2_out)
        d2_out[:] = jnp.full_like(d2_out, 3.4e38)

    @pl.when((i < lim[0, 0]) & (j < lim[0, 1]))
    def _():
        a = rows_d[:]
        b = cols_d[:]
        big = jnp.asarray(3.4e38, jnp.float32)
        cross = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
        d2 = jnp.maximum(jnp.sum(a * a, axis=1, keepdims=True) - 2.0 * cross
                         + jnp.sum(b * b, axis=1)[None, :], 0.0)
        ok = (rows_m[:] > 0) & (cols_m[:] > 0)
        d2 = jnp.where(ok, d2, big)
        c = d2.shape[1]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        cd1 = jnp.min(d2, axis=1, keepdims=True)
        loc1 = jnp.min(jnp.where(d2 <= cd1, col_ids, c), axis=1,
                       keepdims=True)
        loc1c = jnp.minimum(loc1, c - 1)
        ci1 = loc1c + j * c
        d2x = jnp.where(col_ids == loc1c, big, d2)   # drop the 1st ELEMENT
        cd2 = jnp.min(d2x, axis=1, keepdims=True)
        loc2 = jnp.min(jnp.where(d2x <= cd2, col_ids, c), axis=1,
                       keepdims=True)
        ci2 = jnp.minimum(loc2, c - 1) + j * c

        rd1, ri1 = d1_out[:], i1_out[:]
        rd2, ri2 = d2_out[:], i2_out[:]
        # merge two sorted pairs into the global top-2 (running first on
        # ties — earlier chunks hold lower column ids)
        w1 = cd1 < rd1
        nd1 = jnp.where(w1, cd1, rd1)
        ni1 = jnp.where(w1, ci1, ri1)
        # the loser of the first slot competes for the second
        ld = jnp.where(w1, rd1, cd1)
        li = jnp.where(w1, ri1, ci1)
        nd2, ni2 = ld, li
        rep = rd2 < nd2
        nd2 = jnp.where(rep, rd2, nd2)
        ni2 = jnp.where(rep, ri2, ni2)
        rep = cd2 < nd2
        nd2 = jnp.where(rep, cd2, nd2)
        ni2 = jnp.where(rep, ci2, ni2)
        i1_out[:] = ni1
        d1_out[:] = nd1
        i2_out[:] = ni2
        d2_out[:] = nd2


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors2_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                              mask_a: jnp.ndarray, mask_b: jnp.ndarray,
                              interpret: bool = False):
    """Top-2 neighbors of each A row in B: (i1, d1, i2, d2), each (Na,).

    Same tiling/limits as nearest_neighbors_pallas. Invalid rows get
    index 0 / +max on both slots; when B has < 2 valid columns the second
    slot is 0 / +max.
    """
    na, d = desc_a.shape
    nb = desc_b.shape[0]
    assert na % _TNN == 0, f"Na={na} must be a multiple of {_TNN}"
    chunk = min(nb, 2048)
    assert nb % chunk == 0, f"Nb={nb} must be a multiple of {chunk}"
    grid = (na // _TNN, nb // chunk)
    lim_spec = pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((_TNN, d), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((chunk, d), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    mrow = pl.BlockSpec((_TNN, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    mcol = pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)
    out_i = pl.BlockSpec((_TNN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    maskf_a = mask_a.astype(desc_a.dtype)
    i1, d1, i2, d2 = pl.pallas_call(
        _nn2_kernel,
        grid=grid,
        in_specs=[lim_spec, row_spec, col_spec, mrow, mcol],
        out_specs=(out_i, out_i, out_i, out_i),
        out_shape=(jax.ShapeDtypeStruct((na, 1), jnp.int32),
                   jax.ShapeDtypeStruct((na, 1), jnp.float32),
                   jax.ShapeDtypeStruct((na, 1), jnp.int32),
                   jax.ShapeDtypeStruct((na, 1), jnp.float32)),
        interpret=interpret,
    )(_nn_active_limits(maskf_a, mask_b, chunk), desc_a, desc_b,
      maskf_a[:, None], mask_b.astype(desc_b.dtype)[None, :])
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    d1 = jnp.where(mask_a, d1[:, 0], big)
    d2 = jnp.where(mask_a, d2[:, 0], big)
    return (jnp.where(mask_a, i1[:, 0], 0), d1,
            jnp.where(mask_a, i2[:, 0], 0), d2)


def _nn_active_rows(maskf: jnp.ndarray) -> jnp.ndarray:
    """(1, 1) int32 active _TNN-row-tile count (the NN kernel's own row
    tiling — _active_limits uses the pair-kernel tile sizes)."""
    n = maskf.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    last = jnp.max(jnp.where(maskf > 0, iota + 1, 0))
    return ((last + _TNN - 1) // _TNN).astype(jnp.int32)[None, None]


def _nn_active_limits(maskf_a: jnp.ndarray, mask_b: jnp.ndarray,
                      chunk: int) -> jnp.ndarray:
    """(1, 2) int32: active row-tile count and active column-chunk count
    (see _nn_kernel — both skips are exact)."""
    na = maskf_a.shape[0]
    nb = mask_b.shape[0]
    ia = jnp.arange(na, dtype=jnp.int32)
    ib = jnp.arange(nb, dtype=jnp.int32)
    last_a = jnp.max(jnp.where(maskf_a > 0, ia + 1, 0))
    last_b = jnp.max(jnp.where(mask_b, ib + 1, 0))
    return jnp.stack([(last_a + _TNN - 1) // _TNN,
                      (last_b + chunk - 1) // chunk]).astype(
        jnp.int32)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                             mask_a: jnp.ndarray, mask_b: jnp.ndarray,
                             interpret: bool = False):
    """Per-row nearest neighbor of A in B: (idx (Na,) int32, d2 (Na,) f32).

    Drop-in for ops.matching._nearest_neighbors. The XLA row-blocked path
    materializes ~0.5 GB of (T, V) distance tiles per pair in HBM; here B
    (~1 MB at 8192 x 33) stays VMEM-resident across row tiles and HBM sees
    only descriptors in, indices out. Invalid rows get index 0 / +max
    (matching the XLA path: argmin over an all-big row returns 0).
    """
    na, d = desc_a.shape
    nb = desc_b.shape[0]
    assert na % _TNN == 0, f"Na={na} must be a multiple of {_TNN}"
    chunk = min(nb, 2048)
    assert nb % chunk == 0, f"Nb={nb} must be a multiple of {chunk}"
    grid = (na // _TNN, nb // chunk)
    lim_spec = pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((_TNN, d), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((chunk, d), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    mrow = pl.BlockSpec((_TNN, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    mcol = pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)
    out_i = pl.BlockSpec((_TNN, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    maskf_a = mask_a.astype(desc_a.dtype)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[lim_spec, row_spec, col_spec, mrow, mcol],
        out_specs=(out_i, out_i),
        out_shape=(jax.ShapeDtypeStruct((na, 1), jnp.int32),
                   jax.ShapeDtypeStruct((na, 1), jnp.float32)),
        interpret=interpret,
    )(_nn_active_limits(maskf_a, mask_b, chunk), desc_a, desc_b,
      maskf_a[:, None], mask_b.astype(desc_b.dtype)[None, :])
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    d2 = jnp.where(mask_a, d2[:, 0], big)
    return jnp.where(mask_a, idx[:, 0], 0), d2


def use_pallas_frontend_default() -> bool:
    return jax.default_backend() == "tpu"
