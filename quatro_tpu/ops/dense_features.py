"""Fused dense front-end: radius normals + FPFH without neighbor lists.

Replaces the radius_neighbors -> estimate_normals -> radius_neighbors ->
compute_fpfh chain (PCL semantics: src/teaser_utils/fpfh.cc:44-75) for the
pipeline hot path. The K-capped NeighborLists formulation (ops/neighbors.py,
kept for the ICP/odometry paths and as the reference-shaped API) gathers
O(V*K) neighbor payloads; on TPU every gathered index costs a tile-sized
DMA (~8 ns measured), which made FPFH alone ~140 ms per cloud at V=8192.

Dense design: process query points in row tiles. Each tile materializes
nothing but (T, V) elementwise arrays — pair offsets dx/dy/dz, squared
distance, the radius mask — and reduces them on the spot:

  pass 1 (normals): neighborhood first/second CENTERED moments from the
    pair offsets (dx = x_i - x_j, so all products are radius-bounded — no
    catastrophic cancellation against |p|^2 ~ 6e3 m^2), then the
    closed-form 3x3 eigensolver from ops.normals on six (V,) arrays.
  pass 2 (SPFH): Darboux angles per in-radius pair, binned by 33 masked
    row reductions (multi-output reduce fusion — one sweep over the tile).
  pass 3 (FPFH): FPFH_i = sum_j (1/d2_ij) SPFH_j over in-radius pairs is
    exactly a masked-weight MATMUL: (T, V) weight tile @ (V, 33) SPFH —
    MXU work instead of 33 gathers.

Semantics vs the K-capped path: this computes TRUE radius neighborhoods
(no top-K truncation), which is closer to PCL than ops/neighbors.py; on
K-unsaturated clouds the two agree exactly (pinned in tests/test_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from quatro_tpu.ops.fpfh import FPFH_DIM, NUM_BINS, _bin_index
from quatro_tpu.ops.normals import Normals, smallest_eigenpair_sym3


def _pair_tile(points_t, start, tile, points, mask, mask_t):
    """Common (T, V) pair geometry for one row tile: component offsets,
    squared distance, and the validity product (row valid & col valid)."""
    xs = tuple(jax.lax.dynamic_slice_in_dim(c, start, tile)[:, None]
               for c in points_t)
    dx = xs[0] - points_t[0][None, :]
    dy = xs[1] - points_t[1][None, :]
    dz = xs[2] - points_t[2][None, :]
    d2 = dx * dx + dy * dy + dz * dz
    mrow = jax.lax.dynamic_slice_in_dim(mask_t, start, tile)
    both = mrow[:, None] & mask[None, :]
    return xs, (dx, dy, dz), d2, both


@partial(jax.jit, static_argnames=("radius", "tile"))
def dense_normals(points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                  tile: int = 256, viewpoint=(0.0, 0.0, 0.0)) -> Normals:
    """PCA normals over true radius neighborhoods, tiled dense.

    points: (V, 3), mask: (V,). V must be a multiple of `tile`.
    Matches estimate_normals(points, radius_neighbors(...)) semantics with
    K = infinity (self included; >= 3 neighbors required for validity).
    """
    v = points.shape[0]
    assert v % tile == 0, f"V={v} must be a multiple of tile={tile}"
    dtype = points.dtype
    r2 = jnp.asarray(radius * radius, dtype)
    pt = (points[:, 0], points[:, 1], points[:, 2])

    def one_tile(start):
        _, (dx, dy, dz), d2, both = _pair_tile(pt, start, tile, mask,
                                               mask, mask)
        a = (both & (d2 <= r2)).astype(dtype)
        c = jnp.sum(a, axis=1)
        sdx = jnp.sum(a * dx, axis=1)
        sdy = jnp.sum(a * dy, axis=1)
        sdz = jnp.sum(a * dz, axis=1)
        sxx = jnp.sum(a * dx * dx, axis=1)
        sxy = jnp.sum(a * dx * dy, axis=1)
        sxz = jnp.sum(a * dx * dz, axis=1)
        syy = jnp.sum(a * dy * dy, axis=1)
        syz = jnp.sum(a * dy * dz, axis=1)
        szz = jnp.sum(a * dz * dz, axis=1)
        return c, sdx, sdy, sdz, sxx, sxy, sxz, syy, syz, szz

    starts = jnp.arange(0, v, tile)
    mom = jax.lax.map(one_tile, starts)
    c, sdx, sdy, sdz, sxx, sxy, sxz, syy, syz, szz = (
        m.reshape(v) for m in mom)

    cnt = jnp.maximum(c, 1.0)
    # E[(p_j - mu)(p_j - mu)] = E[(d - E d)(d - E d)] since d = p_i - p_j
    mdx, mdy, mdz = sdx / cnt, sdy / cnt, sdz / cnt
    cxx = sxx / cnt - mdx * mdx
    cxy = sxy / cnt - mdx * mdy
    cxz = sxz / cnt - mdx * mdz
    cyy = syy / cnt - mdy * mdy
    cyz = syz / cnt - mdy * mdz
    czz = szz / cnt - mdz * mdz

    (n1, n2, n3), lam_min = smallest_eigenpair_sym3(
        cxx, cxy, cxz, cyy, cyz, czz)
    trace = cxx + cyy + czz
    curvature = lam_min / jnp.maximum(trace, 1e-30)

    vp = jnp.asarray(viewpoint, dtype)
    flip = (n1 * (vp[0] - pt[0]) + n2 * (vp[1] - pt[1])
            + n3 * (vp[2] - pt[2])) < 0
    sign = jnp.where(flip, -1.0, 1.0)

    valid = (c >= 3) & mask
    ok = valid.astype(dtype)
    normal = jnp.stack([n1 * sign * ok, n2 * sign * ok, n3 * sign * ok],
                       axis=-1)
    curvature = jnp.where(valid, curvature, 0.0)
    return Normals(normal, curvature, valid)


@partial(jax.jit, static_argnames=("radius", "tile"))
def dense_fpfh(points: jnp.ndarray, normals: jnp.ndarray,
               normal_valid: jnp.ndarray, mask: jnp.ndarray, radius: float,
               tile: int = 256) -> jnp.ndarray:
    """FPFH descriptors (V, 33) over true radius neighborhoods, tiled dense.

    Same SPFH/FPFH two-pass semantics as ops.fpfh (PCL convention: each
    11-bin block of SPFH sums to 100 over valid pairs; FPFH is the
    1/d2-weighted neighbor SPFH sum, renormalized per block).
    """
    v = points.shape[0]
    assert v % tile == 0, f"V={v} must be a multiple of tile={tile}"
    dtype = points.dtype
    r2 = jnp.asarray(radius * radius, dtype)
    pt = (points[:, 0], points[:, 1], points[:, 2])
    nt = (normals[:, 0], normals[:, 1], normals[:, 2])
    pair_mask = mask & normal_valid

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def spfh_tile(start):
        xs, (dx, dy, dz), d2, both = _pair_tile(pt, start, tile, pair_mask,
                                                pair_mask, pair_mask)
        ok = both & (d2 <= r2) & (d2 > 1e-12)          # skip self
        n_i = tuple(jax.lax.dynamic_slice_in_dim(c, start, tile)[:, None]
                    for c in nt)
        n_j = tuple(c[None, :] for c in nt)
        # pair_features semantics (ops/fpfh.py): d points i -> j = -offset
        d = (-dx, -dy, -dz)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-30))
        angle1 = dot(n_i, d) / dist
        angle2 = dot(n_j, d) / dist
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
        f1 = jnp.arctan2(dot(ww, n2s), dot(n1s, n2s))

        af = ok.astype(dtype)
        b1 = _bin_index(f1, -jnp.pi, jnp.pi)
        b2 = _bin_index(f2, -1.0, 1.0)
        b3 = _bin_index(f3, -1.0, 1.0)
        cols = [jnp.sum(jnp.where(b == k, af, 0.0), axis=1)
                for b in (b1, b2, b3) for k in range(NUM_BINS)]
        return jnp.sum(af, axis=1), jnp.stack(cols, axis=-1)  # (T,), (T, 33)

    starts = jnp.arange(0, v, tile)
    cnt, raw = jax.lax.map(spfh_tile, starts)
    cnt = cnt.reshape(v)
    spfh = raw.reshape(v, FPFH_DIM) * (100.0 / jnp.maximum(cnt, 1.0))[:, None]

    def fpfh_tile(start):
        _, _, d2, both = _pair_tile(pt, start, tile, pair_mask,
                                    pair_mask, pair_mask)
        w = jnp.where(both & (d2 <= r2) & (d2 > 1e-12),
                      1.0 / jnp.maximum(d2, 1e-12), 0.0)
        # HIGHEST: bf16 contraction would add ~1% noise per descriptor bin,
        # flipping nearest-neighbor matches between close descriptors.
        return jnp.matmul(w, spfh, precision=jax.lax.Precision.HIGHEST)

    fpfh = jax.lax.map(fpfh_tile, starts).reshape(v, FPFH_DIM)

    out = []
    for s in range(0, FPFH_DIM, NUM_BINS):
        block = fpfh[:, s:s + NUM_BINS]
        total = jnp.maximum(jnp.sum(block, axis=-1, keepdims=True), 1e-12)
        out.append(block * (100.0 / total))
    return jnp.concatenate(out, axis=-1)
