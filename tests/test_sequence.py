"""Trajectory-level test: odometry drift must shrink after loop closing."""

import numpy as np
import pytest

from quatro_tpu.config import FPFHConfig, LidarConfig, PipelineConfig
from quatro_tpu.sequence import make_synthetic_sequence, run_sequence


@pytest.mark.slow
def test_sequence_loop_closing_reduces_ate(tmp_path):
    cfg = PipelineConfig(lidar=LidarConfig.preset("VLP-16"),
                         max_voxels=2048,
                         fpfh=FPFHConfig(max_correspondences=512))
    scans, gt = make_synthetic_sequence(num_poses=12, seed=1, radius=6.0,
                                        config=cfg, raw_capacity=32768,
                                        cache_dir=str(tmp_path))
    res = run_sequence(scans, cfg, gt_poses=gt, loop_radius=5.0)
    assert res.edges_valid >= res.edges_total * 0.7, \
        f"{res.edges_valid}/{res.edges_total} edges valid"
    assert np.isfinite(res.ate_after)
    assert res.ate_after < 1.0, f"ATE after closing {res.ate_after}"
    assert res.ate_after <= res.ate_before + 0.05, \
        f"closing made it worse: {res.ate_before} -> {res.ate_after}"
