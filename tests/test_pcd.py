"""PCD IO + the reference's concatenated feature-pair cache format
(reference: include/fpfh_manager.hpp:179-232)."""

import numpy as np
import pytest

from quatro_tpu.io.pcd import (feature_pair_path, load_feature_pair,
                               load_pcd, save_feature_pair, save_pcd)


def test_pcd_binary_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(137, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    save_pcd(path, xyz, binary=True)
    out = load_pcd(path)
    np.testing.assert_array_equal(out, xyz)


def test_pcd_ascii_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(64, 3)).astype(np.float32) * 50.0
    path = str(tmp_path / "cloud_ascii.pcd")
    save_pcd(path, xyz, intensity=rng.random(64).astype(np.float32),
             binary=False)
    out = load_pcd(path)
    np.testing.assert_allclose(out, xyz, rtol=1e-6)


def test_pcd_reads_pcl_style_xyzi_binary(tmp_path, rng):
    # pcl::PointXYZI is stored as x y z _ intensity _ _ _ (padded to 32 B)
    # when saved by PCL; emulate the FIELDS/SIZE/COUNT header PCL writes.
    n = 21
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    inten = rng.random(n).astype(np.float32)
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("intensity", "<f4")])
    rec["x"], rec["y"], rec["z"], rec["intensity"] = (
        xyz[:, 0], xyz[:, 1], xyz[:, 2], inten)
    path = tmp_path / "pcl_xyzi.pcd"
    with open(path, "wb") as f:
        f.write((
            "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
            "FIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
            f"COUNT 1 1 1 1\nWIDTH {n}\nHEIGHT 1\n"
            f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary\n").encode())
        rec.tofile(f)
    out = load_pcd(str(path))
    np.testing.assert_array_equal(out, xyz)


def test_feature_pair_cache_roundtrip(tmp_path, rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    tgt = rng.normal(size=(50, 3)).astype(np.float32)
    mask = np.ones(50, bool)
    mask[40:] = False  # padded slots must not reach disk
    d = str(tmp_path)
    path = save_feature_pair(d, 540, 1319, src, tgt, mask)
    assert path.endswith("000540_to_001319.pcd")  # hpp:183 naming
    assert path == feature_pair_path(d, 540, 1319)
    s2, t2 = load_feature_pair(d, 540, 1319)
    np.testing.assert_array_equal(s2, src[:40])
    np.testing.assert_array_equal(t2, tgt[:40])


def test_feature_pair_cache_errors(tmp_path, rng):
    with pytest.raises(ValueError):  # unset dir, hpp:181/205
        save_feature_pair("", 0, 1, np.zeros((2, 3)), np.zeros((2, 3)))
    with pytest.raises(ValueError):
        load_feature_pair("", 0, 1)
    with pytest.raises(FileNotFoundError):  # hpp:212
        load_feature_pair(str(tmp_path), 7, 8)
    with pytest.raises(ValueError):  # midpoint split needs equal halves
        save_feature_pair(str(tmp_path), 0, 1,
                          np.zeros((3, 3)), np.zeros((2, 3)))


def test_feature_pair_cache_feeds_solver(tmp_path):
    # cache -> load -> register_correspondences recovers the transform
    import jax.numpy as jnp

    from quatro_tpu.config import SolverConfig
    from quatro_tpu.io.synthetic import make_correspondences
    from quatro_tpu.solver import register_correspondences

    src, tgt, _, gt = make_correspondences(
        seed=3, n_inliers=40, n_outliers=24, yaw_deg=25.0,
        translation=(1.5, -0.5, 0.2))
    save_feature_pair(str(tmp_path), 0, 1, src, tgt)
    s2, t2 = load_feature_pair(str(tmp_path), 0, 1)
    sol = register_correspondences(
        jnp.asarray(s2), jnp.asarray(t2), jnp.ones(len(s2), bool),
        SolverConfig())
    assert bool(sol.valid)
    yaw = float(jnp.arctan2(sol.rotation[1, 0], sol.rotation[0, 0]))
    assert abs(np.rad2deg(yaw) - 25.0) < 1.0
