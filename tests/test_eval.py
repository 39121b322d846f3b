"""Evaluation harness smoke tests (small scale, CPU)."""

import numpy as np
import pytest

from quatro_tpu.config import FPFHConfig, LidarConfig, PipelineConfig
from quatro_tpu.eval import evaluate_loop_closures, evaluate_scaling


@pytest.mark.slow  # the full evaluate harness runs on-chip every round;
# the quick set keeps the golden-pose aggregate gate instead
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_terrain_raycast_consistency():
    """Sloped+curved ground: cast points must lie ON the terrain surface
    under the scan's own ground band, and the pair's ground truth must
    carry the terrain height difference in z."""
    from quatro_tpu.io.synthetic import Scene, Terrain, make_scene, \
        raycast_scan

    ter = Terrain(slope_x=0.06, slope_y=0.02, amp=0.5, freq=0.1)
    scene = make_scene(seed=2, num_buildings=0, num_cars=0, num_poles=0,
                       terrain=ter)
    pts = raycast_scan(scene, np.array([0.0, 0.0, 1.7]), 0.0,
                       noise_std=0.0, dropout=0.0, texture_amp=0.0, seed=0)
    assert pts.shape[0] > 1000
    # all points are ground hits; world frame == sensor frame + origin here
    world = pts + np.array([0.0, 0.0, 1.7], np.float32)
    h = ter.height(world[:, 0], world[:, 1])
    err = np.abs(world[:, 2] - h)
    assert np.median(err) < 0.03, float(np.median(err))
    assert (err < 0.1).mean() > 0.98


def test_scan_pair_terrain_gt_z():
    from quatro_tpu.io.synthetic import Terrain, make_scan_pair
    ter = Terrain(slope_x=0.08)
    _, _, gt = make_scan_pair(seed=1, yaw_deg=10.0,
                              translation=(4.0, 0.0, 0.0), terrain=ter)
    # pose B sits 4 m up an 8% slope -> gt z ~ 0.32 m
    assert abs(gt[2, 3] - 0.32) < 0.05, gt[:3, 3]


def test_dynamic_clutter_moves_only_cars():
    from quatro_tpu.io.synthetic import displace_cars, make_scene
    scene = make_scene(seed=4)
    moved = displace_cars(scene, fraction=0.5, seed=9)
    delta = np.abs(moved.box_min - scene.box_min).sum(axis=1)
    assert (delta[scene.box_kind != 1] == 0).all()
    n_cars = int((scene.box_kind == 1).sum())
    assert (delta[scene.box_kind == 1] > 0).sum() == round(0.5 * n_cars)


@pytest.mark.slow
def test_loop_closure_eval_hard_world():
    """Sloped/curved terrain + 40% dynamic cars: the full pipeline must
    still register (Patchwork's elevation/flatness gates and the outlier
    rejection actually get exercised). Also checks the strict tier is
    reported."""
    lidar = LidarConfig.preset("VLP-16")
    cfg = PipelineConfig(lidar=lidar, max_voxels=2048,
                         fpfh=FPFHConfig.for_lidar(
                             lidar, max_correspondences=256))
    from quatro_tpu.io.synthetic import Terrain
    report = evaluate_loop_closures(
        n_pairs=5, config=cfg, raw_capacity=32768, trans_range=4.0,
        terrain=Terrain(slope_x=0.05, slope_y=0.02, amp=0.3, freq=0.08),
        dynamic_fraction=0.4)
    s = report.summary()
    assert "strict_success_rate" in s
    assert s["success_rate"] >= 4 / 5, s


@pytest.mark.slow
def test_overlap_sweep_smoke():
    from quatro_tpu.eval import evaluate_overlap_sweep
    lidar = LidarConfig.preset("VLP-16")
    cfg = PipelineConfig(lidar=lidar, max_voxels=2048,
                         fpfh=FPFHConfig.for_lidar(
                             lidar, max_correspondences=256))
    res = evaluate_overlap_sweep(baselines=(3.0,), n_pairs=3, config=cfg,
                                 raw_capacity=32768)
    st = res[3.0]
    assert st["n_pairs"] == 3
    assert 0.0 < st["mean_overlap"] <= 1.0
    assert st["success_rate"] >= 2 / 3, st
