"""Core data types: padded point sets and registration solutions.

The reference moves data between four cloud representations — PCL, Eigen,
teaser::PointCloud and ROS messages (reference: include/conversion.hpp:12-57,
include/teaser/geometry.h:26-70).  Here there is exactly one: a fixed-capacity
``PointBatch`` pytree of ``points (..., N, 3) f32`` + ``mask (..., N) bool``.
Static capacity + mask replaces every dynamically sized cloud so that all
downstream stages are shape-static under ``jax.jit`` and batchable with
``jax.vmap``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PointBatch:
    """A padded, masked set of 3-D points.

    points: (..., N, 3) float array. Padded rows are zero.
    mask:   (..., N) bool array; True where the row is a real point.
    """

    points: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def count(self) -> jax.Array:
        """Number of valid points (traced int32)."""
        return jnp.sum(self.mask, axis=-1).astype(jnp.int32)

    @staticmethod
    def from_numpy(xyz: np.ndarray, capacity: Optional[int] = None,
                   dtype=jnp.float32) -> "PointBatch":
        """Pack an (M, 3) numpy array into a capacity-N PointBatch.

        Overflow (M > capacity) is truncated — callers pick capacities large
        enough for their sensor (see PipelineConfig).
        """
        xyz = np.asarray(xyz, dtype=np.float32).reshape(-1, 3)
        m = xyz.shape[0]
        n = capacity if capacity is not None else m
        m = min(m, n)
        pts = np.zeros((n, 3), dtype=np.float32)
        pts[:m] = xyz[:m]
        mask = np.zeros((n,), dtype=bool)
        mask[:m] = True
        return PointBatch(points=jnp.asarray(pts, dtype=dtype),
                          mask=jnp.asarray(mask))

    def to_numpy(self) -> np.ndarray:
        """Return only the valid points as an (M, 3) numpy array (host sync)."""
        pts = np.asarray(self.points)
        mask = np.asarray(self.mask)
        return pts[mask]

    def masked_points(self, fill: float = 0.0) -> jax.Array:
        """Points with padded rows forced to `fill`."""
        return jnp.where(self.mask[..., None], self.points,
                         jnp.asarray(fill, self.points.dtype))


@struct.dataclass
class RegistrationSolution:
    """Result of one registration solve.

    Mirrors ``Quatro::RegistrationSolution`` (reference:
    include/quatro.hpp:161-168) plus masked inlier bookkeeping from the
    driver (include/quatro.hpp:919-935).  All fields are per-pair; under
    ``vmap`` they gain a leading batch axis, and ``valid`` implements the
    per-pair failure masking the reference lacks (a failed pair must not
    poison its batch — SURVEY.md §5).
    """

    valid: jax.Array          # () bool — False iff the clique degenerated
    scale: jax.Array          # () f32 — always 1 in the reference pipeline
    rotation: jax.Array       # (3, 3) f32
    translation: jax.Array    # (3,) f32
    # Masks over the N_corr correspondence slots:
    max_clique_mask: jax.Array    # (N,) bool — inliers after clique selection
    final_inlier_mask: jax.Array  # (N,) bool — inliers after COTE
    num_rotation_inliers: jax.Array  # () int32
    gnc_iterations: jax.Array        # () int32 — GNC-TLS iterations used
    gnc_cost: jax.Array              # () f32 — final GNC cost

    def transform(self) -> jax.Array:
        """Compose the 4x4 homogeneous transform [R|t; 0 1]
        (reference: include/quatro.hpp:933-935). Batch-safe: a vmapped
        solution (leading axes on rotation/translation) yields
        (..., 4, 4)."""
        dtype = self.rotation.dtype
        batch = self.rotation.shape[:-2]
        out = jnp.zeros((*batch, 4, 4), dtype)
        out = out.at[..., :3, :3].set(self.rotation)
        out = out.at[..., :3, 3].set(self.translation)
        return out.at[..., 3, 3].set(1.0)
