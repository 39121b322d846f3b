"""Evaluation harness smoke tests (small scale, CPU)."""

import numpy as np

from quatro_tpu.config import FPFHConfig, LidarConfig, PipelineConfig
from quatro_tpu.eval import evaluate_loop_closures, evaluate_scaling


def test_loop_closure_eval_small():
    cfg = PipelineConfig(lidar=LidarConfig.preset("VLP-16"),
                         max_voxels=2048,
                         fpfh=FPFHConfig(max_correspondences=256))
    report = evaluate_loop_closures(n_pairs=6, config=cfg,
                                    raw_capacity=32768, trans_range=4.0)
    s = report.summary()
    assert s["n_pairs"] == 6
    assert s["success_rate"] >= 5 / 6, s


def test_scaling_eval_runs():
    res = evaluate_scaling(batch_per_device=2, device_counts=[1, 2],
                           n_corr=128, iters=2)
    assert 1 in res and 2 in res
    assert res[1]["pairs_per_s"] > 0
