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


@pytest.mark.slow
def test_sequence_checkpoint_resume(tmp_path, monkeypatch):
    """Kill a checkpointed run mid-trajectory; the resumed run must skip
    completed edges and reproduce the uncheckpointed result exactly."""
    import quatro_tpu.sequence as seq
    from quatro_tpu.odometry import OdometryRunner

    cfg = PipelineConfig(lidar=LidarConfig.preset("VLP-16"),
                         max_voxels=2048,
                         fpfh=FPFHConfig(max_correspondences=512))
    scans, gt = make_synthetic_sequence(num_poses=8, seed=5, radius=6.0,
                                        config=cfg, raw_capacity=32768,
                                        cache_dir=str(tmp_path / "scans"))
    ckpt = str(tmp_path / "ckpt")
    kwargs = dict(gt_poses=gt, loop_radius=5.0, checkpoint_every=2)

    kwargs["batch_size"] = 2  # edges register 2 per device dispatch here

    calls = {"n": 0}
    orig = OdometryRunner.register_pairs

    def dying_register(self, src, tgt):
        calls["n"] += 1
        if calls["n"] > 2:  # die after 2 batches = 4 edges
            raise KeyboardInterrupt("simulated kill")
        return orig(self, src, tgt)

    monkeypatch.setattr(OdometryRunner, "register_pairs", dying_register)
    with pytest.raises(KeyboardInterrupt):
        run_sequence(scans, cfg, checkpoint_dir=ckpt, **kwargs)
    monkeypatch.setattr(OdometryRunner, "register_pairs", orig)

    # resume: features come from disk, the 4 checkpointed edges are skipped
    calls_resume = {"n": 0}
    orig_extract = OdometryRunner.extract

    def counting_register(self, src, tgt):
        calls_resume["n"] += 1
        return orig(self, src, tgt)

    monkeypatch.setattr(OdometryRunner, "extract",
                        lambda self, s: pytest.fail("re-extracted features"))
    monkeypatch.setattr(OdometryRunner, "register_pairs", counting_register)
    res = run_sequence(scans, cfg, checkpoint_dir=ckpt, **kwargs)
    monkeypatch.setattr(OdometryRunner, "register_pairs", orig)
    monkeypatch.setattr(OdometryRunner, "extract", orig_extract)

    assert calls_resume["n"] == -(-(res.edges_total - 4) // 2)

    # and the resumed result equals a fresh un-checkpointed run
    fresh = run_sequence(scans, cfg, **kwargs)
    np.testing.assert_allclose(res.poses, fresh.poses, atol=1e-5)
    assert res.edges_valid == fresh.edges_valid

    # a stale checkpoint from a different plan must be ignored, not resumed
    res2 = run_sequence(scans[:6], cfg, gt_poses=gt[:6], loop_radius=5.0,
                        checkpoint_dir=ckpt, checkpoint_every=2)
    assert res2.edges_total < res.edges_total


def test_checkpoint_fingerprints_are_scoped():
    """Feature caches survive solver-only changes (no wasted re-extraction)
    but are invalidated by extraction changes; the edge log is additionally
    invalidated by solver or gating changes (no mixed gating policies)."""
    from quatro_tpu.config import SolverConfig, replace
    from quatro_tpu.sequence import _edge_fingerprint, _feature_fingerprint

    base = PipelineConfig()
    solver_changed = replace(base, solver=SolverConfig(noise_bound=0.5))
    extract_changed = replace(base, voxel_size=0.4)

    assert _feature_fingerprint(base) == _feature_fingerprint(solver_changed)
    assert _feature_fingerprint(base) != _feature_fingerprint(extract_changed)

    assert _edge_fingerprint(base, 5, 0.35) != \
        _edge_fingerprint(solver_changed, 5, 0.35)
    assert _edge_fingerprint(base, 5, 0.35) != \
        _edge_fingerprint(extract_changed, 5, 0.35)
    assert _edge_fingerprint(base, 5, 0.35) != _edge_fingerprint(base, 50, 0.35)
    assert _edge_fingerprint(base, 5, 0.35) != _edge_fingerprint(base, 5, 0.0)
    assert _edge_fingerprint(base, 5, 0.35) == _edge_fingerprint(base, 5, 0.35)


@pytest.mark.slow
def test_run_odometry_files_streams(tmp_path):
    from quatro_tpu.io.kitti import save_kitti_bin
    from quatro_tpu.odometry import run_odometry_files

    cfg = PipelineConfig(lidar=LidarConfig.preset("VLP-16"),
                         max_voxels=2048, max_raw_points=32768,
                         fpfh=FPFHConfig(max_correspondences=512))
    # 8 poses -> 45 deg consecutive viewpoint deltas: hard enough to be a
    # real registration, easy enough that most pairs should lock in.
    scans, gt = make_synthetic_sequence(num_poses=8, seed=3, radius=6.0,
                                        config=cfg, raw_capacity=32768,
                                        cache_dir=str(tmp_path))
    paths = []
    for i, sc in enumerate(scans):
        pts = np.asarray(sc.points)[np.asarray(sc.mask)]
        p = str(tmp_path / f"{i:06d}.bin")
        save_kitti_bin(p, pts)
        paths.append(p)

    sols = dict(run_odometry_files(paths, cfg))
    assert sols[0] is None
    assert len(sols) == len(paths)

    good = 0
    for k in range(1, len(paths)):
        sol = sols[k]
        assert sol is not None, f"frame {k} produced no solution"
        # step() registers prev (source) -> current (target): the solution
        # maps prev-frame points into the current sensor frame, so its yaw
        # is yaw_{k-1} - yaw_k.
        gt_dyaw = gt[k - 1, 3] - gt[k, 3]
        est_yaw = float(np.arctan2(np.asarray(sol.rotation)[1, 0],
                                   np.asarray(sol.rotation)[0, 0]))
        err = np.degrees(abs(np.arctan2(np.sin(est_yaw - gt_dyaw),
                                        np.cos(est_yaw - gt_dyaw))))
        if bool(sol.valid) and err < 10.0:
            good += 1
    # streaming mechanics must deliver every frame; the registration itself
    # gets the same 70% bar as the loop-closing test on this geometry
    assert good >= 0.7 * (len(paths) - 1), f"only {good}/{len(paths)-1} good"


@pytest.mark.slow
def test_windowed_odometry_matches_frame_by_frame(tmp_path):
    """run_odometry_windowed (2 device calls per W frames) must produce
    the same poses as the frame-by-frame OdometryRunner.step path —
    including across window boundaries and a padded tail window
    (VERDICT r3 item 3)."""
    import jax
    import jax.numpy as jnp
    from quatro_tpu.odometry import OdometryRunner, run_odometry_windowed
    from quatro_tpu.sequence import make_synthetic_sequence
    from quatro_tpu.types import PointBatch

    cfg = PipelineConfig(lidar=LidarConfig.preset("VLP-16"),
                         max_voxels=2048, max_raw_points=32768,
                         fpfh=FPFHConfig(max_correspondences=512))
    scans, _ = make_synthetic_sequence(num_poses=7, seed=5, radius=6.0,
                                       config=cfg, raw_capacity=32768,
                                       cache_dir=str(tmp_path))

    runner = OdometryRunner(cfg)
    ref = [runner.step(PointBatch(jnp.asarray(s.points),
                                  jnp.asarray(s.mask))) for s in scans]

    stream = ((np.asarray(s.points), np.asarray(s.mask)) for s in scans)
    # window=3 over 7 frames: two full windows + a padded tail window
    out = dict((i, s) for i, s, _ in run_odometry_windowed(
        stream, cfg, window=3))
    assert out[0] is None
    assert len(out) == len(scans)
    for k in range(1, len(scans)):
        a, b = ref[k], out[k]
        assert b is not None
        assert bool(np.asarray(a.valid)) == bool(np.asarray(b.valid))
        np.testing.assert_allclose(np.asarray(a.rotation),
                                   np.asarray(b.rotation),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.translation),
                                   np.asarray(b.translation),
                                   rtol=0, atol=1e-4)
