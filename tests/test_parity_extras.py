"""Tests for parity extras: YAML config loading, linalg utilities, scan
metadata, FGR rotation mode."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quatro_tpu.config import PipelineConfig, SolverConfig
from quatro_tpu.config_io import load_params_yaml
from quatro_tpu.utils.linalg import (calculate_diameter, hatmap, mask_indices,
                                     nearest_psd, random_sample_mask,
                                     vector_kron)

REF_PARAMS = "/root/reference/config/params.yaml"
REF_PATCHWORK = "/root/reference/config/patchwork_params.yaml"


@pytest.mark.skipif(not os.path.exists(REF_PARAMS),
                    reason="reference configs unavailable")
def test_load_reference_yaml_files():
    """The reference's own YAML files must load unchanged."""
    cfg = load_params_yaml(REF_PARAMS, REF_PATCHWORK)
    assert cfg.lidar.name == "Velodyne-64-HDE"
    assert cfg.ground_segmentation_mode == "Patchwork"
    assert cfg.projection.neighbor_mode == "4CrossNeighbor"
    assert cfg.voxel_size == 0.3
    assert cfg.fpfh.normal_radius == 0.5
    assert cfg.fpfh.fpfh_radius == 0.75
    assert cfg.solver.noise_bound == 0.3
    assert cfg.solver.estimate_scaling is False
    assert cfg.solver.rotation_max_iterations == 50
    assert cfg.solver.rotation_gnc_factor == 1.4
    assert cfg.solver.rotation_cost_threshold == 0.00011
    assert cfg.patchwork.sensor_height == 1.723
    assert cfg.patchwork.num_min_pts == 80
    assert cfg.patchwork.num_sectors_each_zone == (16, 32, 54, 32)
    assert cfg.patchwork.elevation_thresholds == (-1.2, -0.9984, -0.851,
                                                  -0.605)
    assert cfg.patchwork.using_global_elevation is False


def test_load_yaml_partial(tmp_path):
    p = tmp_path / "p.yaml"
    p.write_text("voxel_size: 0.1\nQuatro:\n  noise_bound: 0.5\n")
    cfg = load_params_yaml(str(p))
    assert cfg.voxel_size == 0.1
    assert cfg.solver.noise_bound == 0.5
    assert cfg.fpfh.fpfh_radius == 0.75  # default preserved


def test_hatmap_cross_product(rng):
    v = rng.normal(size=(5, 3)).astype(np.float32)
    w = rng.normal(size=(5, 3)).astype(np.float32)
    hv = np.asarray(hatmap(jnp.asarray(v)))
    for i in range(5):
        np.testing.assert_allclose(hv[i] @ w[i], np.cross(v[i], w[i]),
                                   atol=1e-5)


def test_vector_kron(rng):
    a = rng.normal(size=(4, 3)).astype(np.float32)
    b = rng.normal(size=(4, 2)).astype(np.float32)
    k = np.asarray(vector_kron(jnp.asarray(a), jnp.asarray(b)))
    for i in range(4):
        np.testing.assert_allclose(k[i], np.kron(a[i], b[i]), atol=1e-5)


def test_nearest_psd(rng):
    a = rng.normal(size=(3, 3)).astype(np.float32)
    a = (a + a.T) / 2 - 1.0 * np.eye(3, dtype=np.float32)
    p = np.asarray(nearest_psd(jnp.asarray(a)))
    w = np.linalg.eigvalsh(p)
    assert (w >= -1e-5).all()


def test_diameter_and_mask_helpers(rng):
    pts = np.zeros((10, 3), np.float32)
    pts[0] = [3, 0, 0]
    pts[1] = [-3, 0, 0]
    mask = np.ones(10, bool)
    d = float(calculate_diameter(jnp.asarray(pts), jnp.asarray(mask)))
    assert 5.5 < d < 7.5

    m = jnp.asarray([False, True, False, True, True])
    idx = np.asarray(mask_indices(m))
    assert idx[:3].tolist() == [1, 3, 4] and (idx[3:] == -1).all()

    sel = random_sample_mask(jax.random.PRNGKey(0), m, 2)
    sel = np.asarray(sel)
    assert sel.sum() == 2 and not sel[0] and not sel[2]


def test_fgr_rotation_mode_recovers():
    from quatro_tpu.io.synthetic import make_correspondences
    from quatro_tpu.solver import register_correspondences
    from quatro_tpu.utils.se3 import rotation_geodesic_error

    src, tgt, gt, _ = make_correspondences(seed=4, n_inliers=60,
                                           n_outliers=140, yaw_deg=40.0)
    cfg = SolverConfig(rotation_estimation_algorithm="FGR")
    sol = register_correspondences(jnp.asarray(src), jnp.asarray(tgt),
                                   jnp.ones(src.shape[0], bool), cfg)
    assert bool(sol.valid)
    err = float(rotation_geodesic_error(jnp.asarray(gt[:3, :3]),
                                        sol.rotation))
    assert err < 0.02
    assert float(jnp.linalg.norm(sol.translation - gt[:3, 3])) < 0.2


@pytest.mark.slow
def test_scan_metadata():
    from quatro_tpu.config import LidarConfig
    from quatro_tpu.io.synthetic import make_scene, raycast_scan
    from quatro_tpu.preprocessing.projection import segment_cloud
    from quatro_tpu.preprocessing.metadata import compute_scan_metadata

    lidar = LidarConfig.preset("VLP-16")
    scene = make_scene(seed=8)
    xyz = raycast_scan(scene, np.array([0, 0, 1.723]), 0.0, lidar=lidar,
                       seed=8)
    mask = jnp.ones(xyz.shape[0], bool)
    proj = segment_cloud(jnp.asarray(xyz), mask, lidar,
                         ground_mode="LeGO-LOAM")
    md = compute_scan_metadata(jnp.asarray(xyz), mask, proj, lidar)
    assert md.start_ring_index.shape == (lidar.n_scan,)
    assert md.segmented_range.shape == (lidar.n_scan, lidar.horizon_scan)
    rngs = np.asarray(md.segmented_range)
    assert (rngs[rngs > 0] < 100).all()
    diff = float(md.orientation_diff)
    assert np.pi < diff < 3 * np.pi

    # segMsg semantics (include/imageProjection.hpp:434-452): every
    # segmented pixel is either an ACCEPTED sub-cluster point (never a
    # rejected/infeasible cluster) or a column-downsampled ground pixel.
    owner = np.asarray(proj.owner)
    seg = rngs > 0
    valid_seg = np.asarray(proj.valid_segments)
    ground = np.asarray(proj.ground)
    gflag = np.asarray(md.segmented_ground_flag)
    occ = owner >= 0
    ok_cluster = occ & valid_seg[np.maximum(owner, 0)]
    assert (seg <= (ok_cluster | gflag)).all(), \
        "segmented pixels include rejected clusters"
    cols = np.broadcast_to(np.arange(rngs.shape[1]), rngs.shape)
    in_border = (cols <= 5) | (cols >= rngs.shape[1] - 5)
    assert (gflag <= ((cols % 5 == 0) | in_border)).all(), \
        "ground pixels must be downsampled to every 5th column"
    assert gflag.any()
    # rejected-cluster pixels exist in this scene and are excluded
    outlier_pix = occ & np.asarray(proj.outliers)[np.maximum(owner, 0)]
    assert not (seg & outlier_pix & ~gflag).any()


@pytest.mark.slow
def test_estimate_scaling_recovers_similarity_transform(rng):
    """TLS scale extension: recovers (s, R, t) for tgt = s*R*src + t + noise
    with gross outliers (beyond the reference, whose estimate_scaling flag
    is inert — include/quatro.hpp:361)."""
    from quatro_tpu.solver import register_correspondences
    from quatro_tpu.solver.scale import solve_scale_tls

    s_true, yaw = 1.35, np.deg2rad(25.0)
    c, s_ = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1.0]])
    t_true = np.array([2.0, -1.0, 0.4])
    n_in, n_out = 70, 130
    src = rng.uniform(-20, 20, (n_in + n_out, 3))
    tgt = s_true * src @ rot.T + t_true + rng.normal(0, 0.02, src.shape)
    tgt[n_in:] = rng.uniform(-30, 30, (n_out, 3))
    srcj = jnp.asarray(src, jnp.float32)
    tgtj = jnp.asarray(tgt, jnp.float32)
    mask = jnp.ones(n_in + n_out, bool)

    scale, adj = solve_scale_tls(srcj, tgtj, mask, noise_bound=0.1)
    assert abs(float(scale) - s_true) < 0.02
    adj_np = np.asarray(adj)
    # inlier pairs must be mutually consistent under the recovered scale
    assert adj_np[:n_in, :n_in][~np.eye(n_in, dtype=bool)].mean() > 0.9

    cfg = SolverConfig(estimate_scaling=True, noise_bound=0.1)
    sol = register_correspondences(srcj, tgtj, mask, cfg)
    assert bool(sol.valid)
    assert abs(float(sol.scale) - s_true) < 0.02
    from quatro_tpu.utils.se3 import rotation_geodesic_error
    assert float(rotation_geodesic_error(jnp.asarray(rot, jnp.float32),
                                         sol.rotation)) < 0.01
    # solution convention: tgt ~= scale * R @ src + t
    assert float(jnp.linalg.norm(sol.translation
                                 - jnp.asarray(t_true, jnp.float32))) < 0.15


def test_rotation_geodesic_error_small_angle():
    """atan2 form must resolve sub-milliradian angles in f32 (the arccos
    form saturates near zero)."""
    from quatro_tpu.utils.se3 import rotation_geodesic_error

    for ang in (0.0, 1e-4, 5e-3):
        c, s_ = np.cos(ang), np.sin(ang)
        r = jnp.asarray(np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1.0]]),
                        jnp.float32)
        got = float(rotation_geodesic_error(jnp.eye(3, dtype=jnp.float32), r))
        assert abs(got - ang) < 3e-5
    # large angle still exact
    got = float(rotation_geodesic_error(
        jnp.eye(3, dtype=jnp.float32),
        jnp.asarray(np.diag([-1.0, -1.0, 1.0]), jnp.float32)))
    assert abs(got - np.pi) < 1e-5


@pytest.mark.slow
def test_solver_float64_fallback():
    """SURVEY §7 design stance: f32 default, f64 fallback for conditioning
    experiments (the reference computes in double throughout, e.g.
    quatro.hpp:307). The solver is dtype-polymorphic — f64 inputs under
    x64 give an f64 solve. Run in a subprocess so the global x64 switch
    cannot leak into other tests' jit caches."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from quatro_tpu.config import SolverConfig\n"
        "from quatro_tpu.io.synthetic import make_correspondences\n"
        "from quatro_tpu.solver import register_correspondences\n"
        "src, tgt, gt, _ = make_correspondences(seed=9, n_inliers=40,\n"
        "    n_outliers=200, yaw_deg=33.0, translation=(2, -1, 0.3))\n"
        "sol = register_correspondences(jnp.asarray(src, jnp.float64),\n"
        "    jnp.asarray(tgt, jnp.float64), jnp.ones(src.shape[0], bool),\n"
        "    SolverConfig())\n"
        "assert sol.rotation.dtype == jnp.float64, sol.rotation.dtype\n"
        "assert bool(sol.valid)\n"
        "T = np.asarray(sol.transform())\n"
        "yaw = np.rad2deg(np.arctan2(T[1, 0], T[0, 0]))\n"
        "assert abs(yaw - 33.0) < 0.5 and np.allclose(\n"
        "    T[:3, 3], [2, -1, 0.3], atol=0.1), (yaw, T[:3, 3])\n"
        "print('f64 OK')\n")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "f64 OK" in out.stdout
