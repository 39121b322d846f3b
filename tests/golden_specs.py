"""Pinned pair specifications for the golden-pose regression fixtures.

Shared by tools/make_golden_poses.py (writes tests/golden_poses.npz from
the current code) and tests/test_golden_poses.py (asserts every future
change keeps each pose inside a tolerance band). Stands in for the
reference's KITTI configure-time fixture (reference: CMakeLists.txt:57-58)
— no real data exists in this container, so frozen ray-cast worlds with
exact ground truth are the regression anchor instead (VERDICT r3 item 6).

Scale note: specs run at VLP-16 scale (32k raw / 2048 voxels) so the
whole suite fits the quick-test budget; full-scale accuracy is tracked by
the evaluate harness (RESULTS.md). `for_lidar` scales the FPFH radii —
the KITTI defaults starve VLP-16 descriptors (RESULTS.md wide-baseline
section).
"""

from __future__ import annotations

RAW_CAPACITY = 32768

# Band design (round 4, after measuring drift under op-level changes):
# these sparse VLP-16 fixtures wobble by up to ~1.8 deg / ~1 m under ANY
# numerics change while remaining GT-correct, so a tight per-pose band
# cannot separate noise from regression. The gate therefore has two
# tiers: a WIDE per-pair drift band that catches catastrophic silent
# changes (planar aliasing = metres of translation), and TIGHT AGGREGATE
# (median-across-fixtures) vs-GT bands that catch systematic accuracy
# regression, which single-pair wobble cannot hide behind.
ROT_BAND_DEG = 3.0
TRANS_BAND_M = 1.5
MEDIAN_GT_ROT_DEG = 1.0
MEDIAN_GT_TRANS_M = 0.6

# Correctness floor vs exact ground truth (the loop-closure tier).
GT_ROT_MAX_DEG = 5.0
GT_TRANS_MAX_M = 2.0

GOLDEN_SPECS = (
    dict(name="level_a", seed=101, yaw_deg=38.0, translation=(2.5, -1.2, 0.04),
         terrain=None, dynamic_fraction=0.0, tilt_deg=0.0,
         ground_alignment=False, num_hypotheses=1),
    dict(name="level_b", seed=102, yaw_deg=-121.0, translation=(4.0, 2.0, 0.0),
         terrain=None, dynamic_fraction=0.0, tilt_deg=0.0,
         ground_alignment=False, num_hypotheses=1),
    dict(name="level_hyp4", seed=103, yaw_deg=165.0,
         translation=(1.0, 3.5, 0.05), terrain=None, dynamic_fraction=0.0,
         tilt_deg=0.0, ground_alignment=False, num_hypotheses=4),
    dict(name="terrain", seed=104, yaw_deg=72.0, translation=(3.0, 0.5, 0.1),
         terrain=(0.05, 0.3), dynamic_fraction=0.0, tilt_deg=0.0,
         ground_alignment=False, num_hypotheses=1),
    dict(name="terrain_dynamic", seed=105, yaw_deg=-45.0,
         translation=(2.0, -2.0, 0.05), terrain=(0.05, 0.3),
         dynamic_fraction=0.4, tilt_deg=0.0, ground_alignment=False,
         num_hypotheses=4),
    dict(name="tilt_ground_align", seed=106, yaw_deg=95.0,
         translation=(2.8, 1.0, 0.0), terrain=None, dynamic_fraction=0.0,
         tilt_deg=5.0, ground_alignment=True, num_hypotheses=1),
)


def build_pair(spec, cache_dir=None):
    """(src_xyz, tgt_xyz, gt 4x4) for a spec — deterministic."""
    import numpy as np

    from quatro_tpu.config import LidarConfig
    from quatro_tpu.io.synthetic import Terrain, make_scan_pair

    lidar = LidarConfig.preset("VLP-16")
    terrain = None
    if spec["terrain"] is not None:
        slope, amp = spec["terrain"]
        terrain = Terrain(slope_x=slope, amp=amp)
    src, tgt, gt = make_scan_pair(
        seed=spec["seed"], yaw_deg=spec["yaw_deg"],
        translation=tuple(spec["translation"]), lidar=lidar,
        terrain=terrain, dynamic_fraction=spec["dynamic_fraction"],
        cache_dir=cache_dir)
    if spec["tilt_deg"] > 0.0:
        from quatro_tpu.eval import _tilt_pair
        rng = np.random.default_rng(spec["seed"] + 777)
        src, tgt, gt = _tilt_pair(src, tgt, gt, spec["tilt_deg"], rng)
    return src, tgt, gt


def build_config(spec):
    import dataclasses

    from quatro_tpu.config import PipelineConfig

    cfg = PipelineConfig.for_lidar("VLP-16", max_raw_points=RAW_CAPACITY,
                                   max_voxels=2048)
    cfg = dataclasses.replace(
        cfg,
        fpfh=dataclasses.replace(cfg.fpfh, max_correspondences=512),
        solver=dataclasses.replace(
            cfg.solver, num_hypotheses=spec["num_hypotheses"]),
        ground_alignment=dataclasses.replace(
            cfg.ground_alignment, enabled=spec["ground_alignment"]))
    return cfg


def register_spec(spec, cache_dir=None):
    """Run the full pipeline on a spec; returns (rot, trans, valid, gt)."""
    import jax.numpy as jnp
    import numpy as np

    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch

    src, tgt, gt = build_pair(spec, cache_dir=cache_dir)
    cfg = build_config(spec)
    res = register_scan_pair(PointBatch.from_numpy(src, RAW_CAPACITY),
                             PointBatch.from_numpy(tgt, RAW_CAPACITY), cfg)
    return (np.asarray(res.solution.rotation),
            np.asarray(res.solution.translation),
            bool(np.asarray(res.solution.valid)), gt)
