"""Segmented-scan metadata: the ``quatro/cloud_info`` message equivalent.

The reference publishes per-scan segmentation metadata for downstream LiDAR
odometry (reference: msg/cloud_info.msg:1-11, populated in
include/imageProjection.hpp:162-167,296-306,434-469): per-ring start/end
indices into the segmented cloud, per-point ground flags, column indices and
ranges, and the scan's start/end orientation. Here it is a pytree computed
from the projection result — no ROS, same information.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quatro_tpu.config import LidarConfig
from quatro_tpu.preprocessing.projection import ProjectionResult


class ScanMetadata(NamedTuple):
    start_ring_index: jax.Array     # (R,) first segmented-pixel rank per ring
    end_ring_index: jax.Array       # (R,) last segmented-pixel rank per ring
    segmented_ground_flag: jax.Array  # (R, C) bool per pixel
    segmented_col_ind: jax.Array    # (R, C) int32 column index
    segmented_range: jax.Array      # (R, C) f32 range (0 where not segmented)
    start_orientation: jax.Array    # () f32
    end_orientation: jax.Array      # () f32
    orientation_diff: jax.Array     # () f32


def compute_scan_metadata(points: jnp.ndarray, mask: jnp.ndarray,
                          proj: ProjectionResult,
                          lidar: LidarConfig = LidarConfig()) -> ScanMetadata:
    """Build cloud_info-equivalent metadata from a segmentation result.

    'Segmented' pixels = valid sub-cluster pixels plus ground pixels (the
    reference's segMsg covers both, include/imageProjection.hpp:441-466).
    """
    rows, cols = proj.range_image.shape
    occupied = proj.owner >= 0
    own = jnp.maximum(proj.owner, 0)
    ground_pix = jnp.zeros((rows, cols), bool)
    if proj.ground is not None:
        ground_pix = occupied & proj.ground[own]
    # Segmented pixels = pixels of ACCEPTED sub-clusters only (label_image
    # also labels infeasible clusters that the reference routes to
    # outlierCloud and excludes from segMsg) + ground pixels downsampled to
    # every 5th column away from the image borders, exactly as the
    # reference's cloudSegmentation does (include/imageProjection.hpp:
    # 434-452: ground enters segmentedCloud iff j%5==0 or j<=5 or
    # j>=Horizon_SCAN-5).
    col_ind = jnp.broadcast_to(jnp.arange(cols, dtype=jnp.int32),
                               (rows, cols))
    ground_ds = ground_pix & ((col_ind % 5 == 0) | (col_ind <= 5)
                              | (col_ind >= cols - 5))
    seg_pix = (occupied & proj.valid_segments[own]) | ground_ds

    per_row_count = jnp.sum(seg_pix, axis=1)
    row_end = jnp.cumsum(per_row_count)
    row_start_rank = row_end - per_row_count
    # reference offsets: start = running -1 + 5, end = running -1 - 5
    start_ring = (row_start_rank - 1 + 5).astype(jnp.int32)
    end_ring = (row_end - 1 - 5).astype(jnp.int32)

    rng = jnp.where(seg_pix, proj.range_image, 0.0)

    # start/end orientation (include/imageProjection.hpp:296-306): first and
    # last valid point of the scan.
    n = points.shape[0]
    iota = jnp.arange(n)
    first = jnp.argmax(mask)
    last = n - 1 - jnp.argmax(mask[::-1])
    start_o = -jnp.arctan2(points[first, 1], points[first, 0])
    end_o = -jnp.arctan2(points[last, 1], points[last, 0]) + 2 * jnp.pi
    diff = end_o - start_o
    end_o = jnp.where(diff > 3 * jnp.pi, end_o - 2 * jnp.pi,
                      jnp.where(diff < jnp.pi, end_o + 2 * jnp.pi, end_o))
    return ScanMetadata(
        start_ring_index=start_ring,
        end_ring_index=end_ring,
        segmented_ground_flag=ground_ds,
        segmented_col_ind=jnp.where(seg_pix, col_ind, 0),
        segmented_range=rng,
        start_orientation=start_o,
        end_orientation=end_o,
        orientation_diff=end_o - start_o)
