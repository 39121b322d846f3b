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

TPU-native design: both passes are dense (N, K)-shaped tensor ops — the
angle computation is pure VPU elementwise work and binning is a one-hot
matmul; no per-point loops, no kd-tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quatro_tpu.ops.neighbors import NeighborLists

NUM_BINS = 11
FPFH_DIM = 3 * NUM_BINS


def pair_features(p1, n1, p2, n2):
    """Darboux angle features between oriented point-normal pairs.

    Vectorized port of pcl::computePairFeatures semantics: inputs broadcast
    over leading dims; returns (f1, f2, f3, valid) with f1 in [-pi, pi],
    f2, f3 in [-1, 1].
    """
    d = p2 - p1
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-30))
    valid = jnp.sum(d * d, axis=-1) > 0

    angle1 = jnp.sum(n1 * d, axis=-1) / dist
    angle2 = jnp.sum(n2 * d, axis=-1) / dist
    # swap source/target so the source normal makes the smaller angle with d
    swap = jnp.abs(angle1) < jnp.abs(angle2)
    n1s = jnp.where(swap[..., None], n2, n1)
    n2s = jnp.where(swap[..., None], n1, n2)
    ds = jnp.where(swap[..., None], -d, d)
    f3 = jnp.where(swap, -angle2, angle1)

    v = jnp.cross(ds, n1s)
    v_norm2 = jnp.sum(v * v, axis=-1)
    valid = valid & (v_norm2 > 1e-20)
    v = v / jnp.sqrt(jnp.maximum(v_norm2, 1e-30))[..., None]
    w = jnp.cross(n1s, v)
    f2 = jnp.sum(v * n2s, axis=-1)
    f1 = jnp.arctan2(jnp.sum(w * n2s, axis=-1), jnp.sum(n1s * n2s, axis=-1))
    return f1, f2, f3, valid


def _bin_index(f, lo, hi):
    idx = jnp.floor(NUM_BINS * (f - lo) / (hi - lo)).astype(jnp.int32)
    return jnp.clip(idx, 0, NUM_BINS - 1)


def compute_spfh(points: jnp.ndarray, normals: jnp.ndarray,
                 nbrs: NeighborLists,
                 normal_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-point SPFH histograms (N, 33); each 11-block sums to 100 over
    valid neighbor pairs (PCL's hist_incr = 100/num_pairs).

    normal_valid (N,): pairs involving a point whose normal estimation
    failed are excluded — PCL emits NaN descriptors there and filters them;
    a zeroed normal would otherwise bin garbage angles as real counts."""
    dtype = points.dtype
    nb_pts = points[nbrs.idx]        # (N, K, 3)
    nb_nrm = normals[nbrs.idx]
    p1 = points[:, None, :]
    n1 = normals[:, None, :]

    f1, f2, f3, ok = pair_features(p1, n1, nb_pts, nb_nrm)
    pair_ok = ok & nbrs.valid & (nbrs.dist2 > 1e-12)  # skip self
    if normal_valid is not None:
        pair_ok &= normal_valid[:, None] & normal_valid[nbrs.idx]
    pair_ok = pair_ok.astype(dtype)

    b1 = jax.nn.one_hot(_bin_index(f1, -jnp.pi, jnp.pi), NUM_BINS, dtype=dtype)
    b2 = jax.nn.one_hot(_bin_index(f2, -1.0, 1.0), NUM_BINS, dtype=dtype)
    b3 = jax.nn.one_hot(_bin_index(f3, -1.0, 1.0), NUM_BINS, dtype=dtype)

    cnt = jnp.maximum(jnp.sum(pair_ok, axis=1), 1.0)[:, None]   # (N, 1)
    incr = (pair_ok * (100.0 / cnt))[..., None]                 # (N, K, 1)
    h1 = jnp.sum(b1 * incr, axis=1)
    h2 = jnp.sum(b2 * incr, axis=1)
    h3 = jnp.sum(b3 * incr, axis=1)
    return jnp.concatenate([h1, h2, h3], axis=-1)


def compute_fpfh(points: jnp.ndarray, normals: jnp.ndarray,
                 nbrs: NeighborLists,
                 normal_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """FPFH descriptors (N, 33): inverse-squared-distance weighted SPFH sum
    over neighbors, each 11-bin block normalized to 100.

    normal_valid (N,): neighbors with failed normals contribute neither
    angle pairs nor their (garbage) SPFH rows to the weighted sum."""
    dtype = points.dtype
    spfh = compute_spfh(points, normals, nbrs, normal_valid)  # (N, 33)
    nb_spfh = spfh[nbrs.idx]                                  # (N, K, 33)
    w_ok = nbrs.valid & (nbrs.dist2 > 1e-12)
    if normal_valid is not None:
        w_ok &= normal_valid[nbrs.idx]
    w = jnp.where(w_ok, 1.0 / jnp.maximum(nbrs.dist2, 1e-12), 0.0)  # (N, K)
    # HIGHEST: bf16 contraction would add ~1% noise per descriptor bin,
    # flipping nearest-neighbor matches between close descriptors.
    fpfh = jnp.einsum("nk,nkd->nd", w.astype(dtype), nb_spfh,
                      precision=jax.lax.Precision.HIGHEST)

    out = []
    for s in range(0, FPFH_DIM, NUM_BINS):
        block = fpfh[:, s:s + NUM_BINS]
        total = jnp.maximum(jnp.sum(block, axis=-1, keepdims=True), 1e-12)
        out.append(block * (100.0 / total))
    return jnp.concatenate(out, axis=-1)
