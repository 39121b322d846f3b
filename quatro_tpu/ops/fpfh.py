"""FPFH (Fast Point Feature Histogram) 33-D descriptors.

Replaces ``pcl::FPFHEstimationOMP`` (reference: include/teaser_utils/fpfh.h:
25-87, src/teaser_utils/fpfh.cc:44-75; invoked at fpfh_manager.hpp:113,121)
with the same two-pass SPFH/FPFH semantics:

  pass 1 (SPFH): for each point i and radius-neighbor j != i, compute the
  Darboux-frame angle triple (f1, f2, f3) between the oriented normals and
  the connecting line, and histogram each into 11 bins (3 x 11 = 33).

  pass 2 (FPFH): FPFH(i) = sum_j SPFH(j) / dist^2(i, j), then each 11-bin
  sub-histogram is normalized to sum 100 (PCL convention — the self term
  drops out under normalization).

TPU-native design: both passes are structure-of-arrays (N, K) tensor ops —
coordinates and normals travel as separate component arrays, the Darboux
angles are pure VPU elementwise work on them, and binning is 11 masked
reductions per feature (the one-hot formulation materialized (N, K, 11)
tensors whose minor dim pads to 128 lanes on TPU — 12x the logical bytes).
No per-point loops, no kd-tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quatro_tpu.ops.neighbors import NeighborLists

NUM_BINS = 11
FPFH_DIM = 3 * NUM_BINS


def pair_features(p1, n1, p2, n2):
    """Darboux angle features between oriented point-normal pairs.

    Vectorized port of pcl::computePairFeatures semantics. p1, n1, p2, n2
    are component TUPLES (x, y, z), each element broadcastable to a common
    shape. Returns (f1, f2, f3, valid) with f1 in [-pi, pi], f2, f3 in
    [-1, 1].
    """
    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    d = tuple(p2[i] - p1[i] for i in range(3))
    d2 = dot(d, d)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-30))
    valid = d2 > 0

    angle1 = dot(n1, d) / dist
    angle2 = dot(n2, d) / dist
    # swap source/target so the source normal makes the smaller angle with d
    swap = jnp.abs(angle1) < jnp.abs(angle2)
    n1s = tuple(jnp.where(swap, n2[i], n1[i]) for i in range(3))
    n2s = tuple(jnp.where(swap, n1[i], n2[i]) for i in range(3))
    ds = tuple(jnp.where(swap, -d[i], d[i]) for i in range(3))
    f3 = jnp.where(swap, -angle2, angle1)

    v = cross(ds, n1s)
    v_norm2 = dot(v, v)
    valid = valid & (v_norm2 > 1e-20)
    inv = jax.lax.rsqrt(jnp.maximum(v_norm2, 1e-30))
    v = tuple(c * inv for c in v)
    w = cross(n1s, v)
    f2 = dot(v, n2s)
    f1 = jnp.arctan2(dot(w, n2s), dot(n1s, n2s))
    return f1, f2, f3, valid


def _bin_index(f, lo, hi):
    idx = jnp.floor(NUM_BINS * (f - lo) / (hi - lo)).astype(jnp.int32)
    return jnp.clip(idx, 0, NUM_BINS - 1)


def _histogram11(bins: jnp.ndarray, incr: jnp.ndarray) -> list:
    """Sum `incr` into 11 bins along axis 1: list of 11 (N,) columns.

    Fuses to 11 masked reductions over the (N, K) inputs — no (N, K, 11)
    one-hot tensor is ever materialized.
    """
    return [jnp.sum(jnp.where(bins == b, incr, 0.0), axis=1)
            for b in range(NUM_BINS)]


def compute_spfh(points: jnp.ndarray, normals: jnp.ndarray,
                 nbrs: NeighborLists,
                 normal_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-point SPFH histograms (N, 33); each 11-block sums to 100 over
    valid neighbor pairs (PCL's hist_incr = 100/num_pairs).

    normal_valid (N,): pairs involving a point whose normal estimation
    failed are excluded — PCL emits NaN descriptors there and filters them;
    a zeroed normal would otherwise bin garbage angles as real counts."""
    dtype = points.dtype
    idx = nbrs.idx
    p_i = tuple(points[:, c][:, None] for c in range(3))       # (N, 1) x3
    n_i = tuple(normals[:, c][:, None] for c in range(3))
    p_j = tuple(points[:, c][idx] for c in range(3))           # (N, K) x3
    n_j = tuple(normals[:, c][idx] for c in range(3))

    f1, f2, f3, ok = pair_features(p_i, n_i, p_j, n_j)
    pair_ok = ok & nbrs.valid & (nbrs.dist2 > 1e-12)  # skip self
    if normal_valid is not None:
        pair_ok &= normal_valid[:, None] & normal_valid[idx]
    pair_ok = pair_ok.astype(dtype)

    b1 = _bin_index(f1, -jnp.pi, jnp.pi)
    b2 = _bin_index(f2, -1.0, 1.0)
    b3 = _bin_index(f3, -1.0, 1.0)

    cnt = jnp.maximum(jnp.sum(pair_ok, axis=1), 1.0)[:, None]   # (N, 1)
    incr = pair_ok * (100.0 / cnt)                              # (N, K)
    cols = (_histogram11(b1, incr) + _histogram11(b2, incr)
            + _histogram11(b3, incr))
    return jnp.stack(cols, axis=-1)                             # (N, 33)


def compute_fpfh(points: jnp.ndarray, normals: jnp.ndarray,
                 nbrs: NeighborLists,
                 normal_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """FPFH descriptors (N, 33): inverse-squared-distance weighted SPFH sum
    over neighbors, each 11-bin block normalized to 100.

    normal_valid (N,): neighbors with failed normals contribute neither
    angle pairs nor their (garbage) SPFH rows to the weighted sum."""
    dtype = points.dtype
    spfh = compute_spfh(points, normals, nbrs, normal_valid)  # (N, 33)
    w_ok = nbrs.valid & (nbrs.dist2 > 1e-12)
    if normal_valid is not None:
        w_ok &= normal_valid[nbrs.idx]
    w = jnp.where(w_ok, 1.0 / jnp.maximum(nbrs.dist2, 1e-12), 0.0)  # (N, K)

    # Weighted neighbor sum per descriptor dimension: 33 gathers of (N,)
    # columns + fused multiply-reduce. The former einsum over a gathered
    # (N, K, 33) tensor padded 33 -> 128 lanes and dominated this stage's
    # HBM traffic. Elementwise f32 VPU products keep full precision (the
    # old HIGHEST-precision contraction concern applied to the MXU path).
    spfh_t = spfh.T                              # (33, N): rows lane-aligned
    cols = []
    for dim in range(FPFH_DIM):
        nb_col = spfh_t[dim][nbrs.idx]           # (N, K)
        cols.append(jnp.sum(w * nb_col, axis=1))
    fpfh = jnp.stack(cols, axis=-1).astype(dtype)  # (N, 33)

    out = []
    for s in range(0, FPFH_DIM, NUM_BINS):
        block = fpfh[:, s:s + NUM_BINS]
        total = jnp.maximum(jnp.sum(block, axis=-1, keepdims=True), 1e-12)
        out.append(block * (100.0 / total))
    return jnp.concatenate(out, axis=-1)
