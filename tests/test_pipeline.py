"""Integration: synthetic scan pair -> features -> match -> solve -> GT
(test pyramid level 3; replaces the reference's KITTI-pair roslaunch check,
SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quatro_tpu.config import PipelineConfig, replace
from quatro_tpu.io.synthetic import make_scan_pair
from quatro_tpu.pipeline import register_features
from quatro_tpu.types import PointBatch
from quatro_tpu.utils.se3 import rotation_geodesic_error


@pytest.fixture(scope="module")
def scan_pair():
    return make_scan_pair(seed=11, yaw_deg=20.0,
                          translation=(2.5, 1.0, 0.05))


def _nonground(xyz, sensor_height=1.723, margin=0.3):
    """Crude ground strip for the front-end-only slice (Patchwork arrives in
    the preprocessing phase)."""
    return xyz[xyz[:, 2] > -sensor_height + margin]


@pytest.mark.slow
def test_front_end_slice_recovers_transform(scan_pair):
    src_xyz, tgt_xyz, gt = scan_pair
    cfg = PipelineConfig(max_voxels=8192)
    src = PointBatch.from_numpy(_nonground(src_xyz), capacity=65536)
    tgt = PointBatch.from_numpy(_nonground(tgt_xyz), capacity=65536)

    res = register_features(src, tgt, cfg)
    sol = res.solution
    assert bool(sol.valid)
    n_corr = int(np.asarray(res.correspondences.mask).sum())
    assert n_corr >= 10, f"too few correspondences: {n_corr}"

    rot_err = float(rotation_geodesic_error(jnp.asarray(gt[:3, :3]),
                                            sol.rotation))
    trans_err = float(np.linalg.norm(np.asarray(sol.translation)
                                     - gt[:3, 3]))
    assert rot_err < 0.05, f"rotation error {rot_err} rad"
    assert trans_err < 0.5, f"translation error {trans_err} m"


@pytest.mark.slow  # quick-set coverage of this path: the golden-pose
# gate registers six full raw-scan pipelines (tests/test_golden_poses.py)
def test_full_pipeline_with_preprocessing(scan_pair):
    """Raw scans -> Patchwork -> projection -> voxel -> FPFH -> solve
    (the reference's complete main() flow on the toy pair)."""
    from quatro_tpu.pipeline import register_scan_pair

    src_xyz, tgt_xyz, gt = scan_pair
    cfg = PipelineConfig(max_voxels=8192)
    src = PointBatch.from_numpy(src_xyz, capacity=131072)
    tgt = PointBatch.from_numpy(tgt_xyz, capacity=131072)

    res = register_scan_pair(src, tgt, cfg)
    sol = res.solution
    assert bool(sol.valid)
    n_corr = int(np.asarray(res.correspondences.mask).sum())
    assert n_corr >= 10, f"too few correspondences: {n_corr}"

    rot_err = float(rotation_geodesic_error(jnp.asarray(gt[:3, :3]),
                                            sol.rotation))
    trans_err = float(np.linalg.norm(np.asarray(sol.translation)
                                     - gt[:3, 3]))
    assert rot_err < 0.05, f"rotation error {rot_err} rad"
    assert trans_err < 0.6, f"translation error {trans_err} m"


def test_preprocess_subclustering_toggle(scan_pair):
    """use_subclustering=False must keep the full Patchwork non-ground set
    (the rejection stage is a speed booster, reference README.md:102-104)."""
    import jax.numpy as jnp
    from quatro_tpu.pipeline import preprocess
    from quatro_tpu.preprocessing.patchwork import estimate_ground

    src_xyz, _, _ = scan_pair
    pb = PointBatch.from_numpy(src_xyz, capacity=131072)
    cfg_on = PipelineConfig(max_voxels=8192)
    cfg_off = replace(cfg_on, use_subclustering=False)

    seg_on, _ = preprocess(pb.points, pb.mask, cfg_on)
    seg_off, _ = preprocess(pb.points, pb.mask, cfg_off)
    pw = estimate_ground(pb.points, pb.mask, cfg_on.patchwork)

    np.testing.assert_array_equal(np.asarray(seg_off), np.asarray(pw.nonground))
    # the rejection stage can only shrink the kept set
    assert int(jnp.sum(seg_on)) <= int(jnp.sum(seg_off))
    assert int(jnp.sum(seg_on)) > 0


@pytest.mark.slow
def test_odometry_runner_honors_icp_and_ground_alignment(scan_pair):
    """The same PipelineConfig must mean the same pipeline regardless of
    entry point: OdometryRunner.register_pair must apply ICP refinement and
    ground alignment exactly like pipeline.register_scan_pair (they
    previously were silently ignored on the odometry path)."""
    from quatro_tpu.config import (FPFHConfig, GroundAlignmentConfig,
                                   IcpConfig)
    from quatro_tpu.odometry import OdometryRunner
    from quatro_tpu.pipeline import register_scan_pair

    src_xyz, tgt_xyz, gt = scan_pair
    cfg = PipelineConfig(
        max_voxels=4096, fpfh=FPFHConfig(max_correspondences=512),
        icp=IcpConfig(enabled=True, iterations=4, hold_iterations=2),
        ground_alignment=GroundAlignmentConfig(enabled=True))
    src = PointBatch.from_numpy(src_xyz, cfg.max_raw_points)
    tgt = PointBatch.from_numpy(tgt_xyz, cfg.max_raw_points)

    res = register_scan_pair(src, tgt, cfg)
    runner = OdometryRunner(cfg)
    fs, ft = runner.extract(src), runner.extract(tgt)
    assert fs.raw_voxels is not None and fs.level is not None
    sol = runner.register_pair(fs, ft)

    np.testing.assert_allclose(np.asarray(sol.rotation),
                               np.asarray(res.solution.rotation), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.translation),
                               np.asarray(res.solution.translation),
                               atol=1e-3)
    # and the result is actually good
    ang = np.rad2deg(float(rotation_geodesic_error(
        sol.rotation, jnp.asarray(gt[:3, :3].astype(np.float32)))))
    assert ang < 1.0
    assert np.linalg.norm(np.asarray(sol.translation) - gt[:3, 3]) < 0.3


def test_solution_transform_is_batch_safe(scan_pair):
    """transform() on a vmapped RegistrationSolution (the documented
    register_pairs path) must yield (B, 4, 4), not crash."""
    import jax
    from quatro_tpu.io.synthetic import make_correspondences
    from quatro_tpu.solver import register_correspondences
    from quatro_tpu.config import SolverConfig

    pairs = [make_correspondences(seed=s, n_inliers=30, n_outliers=98)
             for s in range(3)]
    src = jnp.stack([jnp.asarray(p[0]) for p in pairs])
    tgt = jnp.stack([jnp.asarray(p[1]) for p in pairs])
    mask = jnp.ones(src.shape[:2], bool)
    sols = jax.vmap(lambda s, t, m: register_correspondences(
        s, t, m, SolverConfig()))(src, tgt, mask)
    T = np.asarray(sols.transform())
    assert T.shape == (3, 4, 4)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (3, 1)),
                               atol=0)
    for k, p in enumerate(pairs):
        np.testing.assert_allclose(T[k], p[2], atol=0.05)
