"""Evaluation harness smoke tests (small scale, CPU)."""

import numpy as np

from quatro_tpu.config import FPFHConfig, LidarConfig, PipelineConfig
from quatro_tpu.eval import evaluate_loop_closures, evaluate_scaling


def test_loop_closure_eval_small():
    lidar = LidarConfig.preset("VLP-16")
    cfg = PipelineConfig(lidar=lidar, max_voxels=2048,
                         fpfh=FPFHConfig.for_lidar(
                             lidar, max_correspondences=256))
    report = evaluate_loop_closures(n_pairs=6, config=cfg,
                                    raw_capacity=32768, trans_range=4.0)
    s = report.summary()
    assert s["n_pairs"] == 6
    assert s["success_rate"] >= 5 / 6, s


def test_loop_closure_eval_tilted_with_ground_alignment():
    """Non-level platforms (random per-scan roll/pitch): ground alignment
    must keep the success rate and beat yaw-only on rotation error."""
    from quatro_tpu.config import GroundAlignmentConfig

    lidar = LidarConfig.preset("VLP-16")
    base = PipelineConfig(lidar=lidar, max_voxels=2048,
                          fpfh=FPFHConfig.for_lidar(
                              lidar, max_correspondences=256))
    kw = dict(n_pairs=5, raw_capacity=32768, trans_range=4.0, tilt_deg=5.0)
    cfg = PipelineConfig(**{**base.__dict__,
                            "ground_alignment":
                            GroundAlignmentConfig(enabled=True)})
    rep = evaluate_loop_closures(config=cfg, **kw)
    rep0 = evaluate_loop_closures(config=base, **kw)
    s = rep.summary()
    assert s["success_rate"] >= 4 / 5, s
    med = np.median([p.rot_err_deg for p in rep.pairs])
    med0 = np.median([p.rot_err_deg for p in rep0.pairs])
    assert med < med0, (med, med0)
    # ±5 deg per-scan tilt (up to ~8.6 deg relative): yaw-only carries
    # several degrees of it; leveling leaves ~1 deg on the sparse VLP-16
    assert med < 1.5, med
    assert med0 > 2.0, med0


def test_fpfh_for_lidar_scaling():
    dense = LidarConfig.preset("Velodyne-64-HDE")
    sparse = LidarConfig.preset("VLP-16")
    f_dense = FPFHConfig.for_lidar(dense)
    f_sparse = FPFHConfig.for_lidar(sparse)
    # 64-beam keeps the reference defaults; 16-beam scales up ~2x
    assert f_dense.normal_radius == 0.5 and f_dense.fpfh_radius == 0.75
    assert 0.9 < f_sparse.normal_radius < 1.3
    assert f_sparse.fpfh_radius > f_sparse.normal_radius


def test_scaling_eval_runs():
    res = evaluate_scaling(batch_per_device=2, device_counts=[1, 2],
                           n_corr=128, iters=2)
    assert 1 in res and 2 in res
    assert res[1]["pairs_per_s"] > 0


def test_outlier_robustness_sweep_small():
    from quatro_tpu.eval import evaluate_outlier_robustness
    res = evaluate_outlier_robustness(outlier_rates=[0.5, 0.9],
                                      n_trials=6, n_corr=128)
    assert set(res) == {0.5, 0.9}
    for rate, stats in res.items():
        assert stats["n_trials"] == 6
        assert stats["success_rate"] >= 5 / 6, (rate, stats)
