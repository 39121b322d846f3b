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
