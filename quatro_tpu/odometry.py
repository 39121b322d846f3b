"""Sequential (odometry / loop-closure sweep) registration runner.

Replaces ``FPFHManager``'s stateful per-pair orchestration
(reference: include/fpfh_manager.hpp:25-238):

* descriptor reuse between consecutive frames — the previous target's
  voxels/descriptors become the next source (``swapTgt2Src`` semantics,
  fpfh_manager.hpp:74-77,111-118) so each new frame pays feature
  extraction exactly once;
* feature-pair caching to disk so parameter sweeps skip re-extraction
  (``saveFeaturePair``/``loadFeaturePair``, fpfh_manager.hpp:179-232 —
  .npz here; ``quatro_tpu.io.pcd.save/load_feature_pair`` provides the
  reference's exact concatenated-PCD format for cache interchange).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from quatro_tpu.config import PipelineConfig
from quatro_tpu.ops.matching import match_features
from quatro_tpu.pipeline import extract_features, preprocess
from quatro_tpu.solver.quatro import register_correspondences
from quatro_tpu.solver.verify import alignment_overlap
from quatro_tpu.types import PointBatch, RegistrationSolution


@struct.dataclass
class FrameFeatures:
    """Extracted per-frame features (the cacheable unit); a pytree so it
    passes straight through jit."""
    voxels: jnp.ndarray       # (V, 3)
    voxel_mask: jnp.ndarray   # (V,)
    descriptors: jnp.ndarray  # (V, 33)
    desc_mask: jnp.ndarray    # (V,)


class OdometryRunner:
    """Streaming pair registration with one feature extraction per frame."""

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        self.config = config
        self._prev: Optional[FrameFeatures] = None
        self._extract = jax.jit(self._extract_impl)
        self._register = jax.jit(self._register_impl)
        self._register_batch = jax.jit(jax.vmap(self._register_verify_impl))

    def _extract_impl(self, points, mask):
        seg, _ = preprocess(points, mask, self.config)
        vox, desc, dmask, _ = extract_features(points, seg, self.config)
        return vox.points, vox.mask, desc, dmask

    def _register_impl(self, src: FrameFeatures, tgt: FrameFeatures):
        f = self.config.fpfh
        corr = match_features(
            src.voxels, tgt.voxels, src.descriptors, tgt.descriptors,
            src.desc_mask, tgt.desc_mask,
            capacity=f.max_correspondences,
            use_crosscheck=f.use_crosscheck,
            use_tuple_test=f.use_tuple_test, tuple_scale=f.tuple_scale,
            trials_per_corr=f.tuple_trials_per_corr, seed=f.tuple_seed)
        sol = register_correspondences(corr.src_xyz, corr.tgt_xyz, corr.mask,
                                       self.config.solver)
        return sol, corr

    def _register_verify_impl(self, src: FrameFeatures, tgt: FrameFeatures):
        sol, _ = self._register_impl(src, tgt)
        overlap = alignment_overlap(
            src.voxels, src.voxel_mask, tgt.voxels, tgt.voxel_mask,
            sol.rotation, sol.translation,
            radius=2.0 * self.config.voxel_size)
        return sol, overlap

    def extract(self, scan: PointBatch) -> FrameFeatures:
        v, vm, d, dm = self._extract(scan.points, scan.mask)
        return FrameFeatures(v, vm, d, dm)

    def step(self, scan: PointBatch) -> Optional[RegistrationSolution]:
        """Feed the next frame; returns the solution vs the previous frame
        (None for the first). The new frame's features are computed once and
        reused as the next step's source (swapTgt2Src semantics)."""
        feats = self.extract(scan)
        sol = None
        if self._prev is not None:
            sol, _ = self._register(self._prev, feats)
        self._prev = feats
        return sol

    def register_pair(self, src: FrameFeatures,
                      tgt: FrameFeatures) -> RegistrationSolution:
        sol, _ = self._register(src, tgt)
        return sol

    def register_pairs(self, src: FrameFeatures, tgt: FrameFeatures
                       ) -> Tuple[RegistrationSolution, jnp.ndarray]:
        """Batched pair registration + overlap verification in ONE jitted
        vmap dispatch: every leaf of src/tgt carries a leading batch axis.
        Returns (solutions, overlaps (B,)); overlap is the geometric
        acceptance score of solver/verify.py. Single-pair solves are
        dispatch-bound (~1.4 ms each on chip), so trajectory edge plans
        should go through here 16+ at a time."""
        return self._register_batch(src, tgt)

    def reset(self):
        self._prev = None


def save_frame_features(path: str, feats: FrameFeatures) -> None:
    """Cache features to .npz (replaces the PCD pair cache,
    fpfh_manager.hpp:179-198)."""
    np.savez_compressed(
        path, voxels=np.asarray(feats.voxels),
        voxel_mask=np.asarray(feats.voxel_mask),
        descriptors=np.asarray(feats.descriptors),
        desc_mask=np.asarray(feats.desc_mask))


def load_frame_features(path: str) -> FrameFeatures:
    if not os.path.exists(path):
        raise FileNotFoundError(f"[odometry]: feature cache missing: {path}")
    z = np.load(path)
    return FrameFeatures(jnp.asarray(z["voxels"]),
                         jnp.asarray(z["voxel_mask"]),
                         jnp.asarray(z["descriptors"]),
                         jnp.asarray(z["desc_mask"]))


def run_odometry_files(paths, config: PipelineConfig = PipelineConfig(),
                       capacity: Optional[int] = None,
                       n_workers: int = 4, queue_depth: int = 8):
    """Stream a sequence of KITTI .bin scans through the odometry runner.

    Uses the native async prefetch loader (quatro_tpu.native.ScanLoader) so
    disk IO for frame k+1..k+queue_depth overlaps the device solve for frame
    k; falls back to synchronous numpy loading without a C toolchain.

    Yields (frame_index, RegistrationSolution | None) per frame.
    """
    capacity = capacity or config.max_raw_points
    runner = OdometryRunner(config)

    def _numpy_stream():
        from quatro_tpu.io.kitti import load_kitti_bin
        for p in paths:
            xyz = load_kitti_bin(p)
            pb = PointBatch.from_numpy(xyz, capacity)
            yield np.asarray(pb.points), np.asarray(pb.mask)

    try:
        from quatro_tpu.native import ScanLoader
        stream = ScanLoader(paths, capacity=capacity, n_workers=n_workers,
                            queue_depth=queue_depth)
    except (OSError, RuntimeError):
        stream = _numpy_stream()

    try:
        for i, (pts, mask) in enumerate(stream):
            sol = runner.step(PointBatch(jnp.asarray(pts), jnp.asarray(mask)))
            yield i, sol
    finally:
        close = getattr(stream, "close", None)
        if close:
            close()
