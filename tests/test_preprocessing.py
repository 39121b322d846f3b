"""Tests for Patchwork ground segmentation and range-image clustering."""

import numpy as np
import jax.numpy as jnp
import pytest

from quatro_tpu.config import LidarConfig, PatchworkConfig, ProjectionConfig
from quatro_tpu.io.synthetic import make_scan_pair, raycast_scan, make_scene
from quatro_tpu.preprocessing.patchwork import czm_bin, estimate_ground
from quatro_tpu.preprocessing.projection import (label_components,
                                                 project_to_range_image,
                                                 segment_cloud)


@pytest.fixture(scope="module")
def scan():
    scene = make_scene(seed=3)
    xyz = raycast_scan(scene, np.array([0, 0, 1.723]), 0.0, seed=4)
    return xyz


def test_czm_bin_hand_cases():
    cfg = PatchworkConfig()
    pts = jnp.asarray([
        [3.0, 0.0, 0.0],     # zone 0, ring 0; theta=0 wraps to 2*pi ->
                             # clamped to the last sector (reference quirk,
                             # patchwork.hpp:500-501,522)
        [0.0, 3.0, 0.0],     # zone 0, theta = pi/2 -> sector 4 of 16
        [15.0, 0.0, 0.0],    # zone 1
        [30.0, 0.0, 0.0],    # zone 2
        [60.0, 0.0, 0.0],    # zone 3
        [1.0, 0.0, 0.0],     # inside min_r -> dropped
        [100.0, 0.0, 0.0],   # beyond max_r -> dropped
    ], jnp.float32)
    mask = jnp.ones(7, bool)
    pid, ok = czm_bin(pts, mask, cfg)
    pid, ok = np.asarray(pid), np.asarray(ok)
    assert ok[:5].all() and not ok[5] and not ok[6]
    assert pid[0] == 15
    assert pid[1] == 4          # theta pi/2 / (2pi/16) = 4
    z_off = [0, 32, 160, 376]   # 2*16, +4*32, +4*54
    assert z_off[1] <= pid[2] < z_off[2]
    assert z_off[2] <= pid[3] < z_off[3]
    assert pid[4] >= z_off[3]


def test_patchwork_separates_ground_on_synthetic_scan(scan):
    xyz = scan
    n = xyz.shape[0]
    res = estimate_ground(jnp.asarray(xyz), jnp.ones(n, bool))
    ground = np.asarray(res.ground)
    nonground = np.asarray(res.nonground)
    assert not (ground & nonground).any()

    # true ground: ray-cast points that landed on the z=0 world plane sit at
    # sensor-frame z ~= -1.723
    true_ground = np.abs(xyz[:, 2] + 1.723) < 0.12
    in_czm = ground | nonground
    g, t = ground[in_czm], true_ground[in_czm]
    recall = (g & t).sum() / max(t.sum(), 1)
    precision = (g & t).sum() / max(g.sum(), 1)
    assert recall > 0.9, f"ground recall {recall}"
    assert precision > 0.9, f"ground precision {precision}"


def test_patchwork_revert_reject_diagnostics(scan):
    """Revert/reject clouds (reference /revert_pc, /reject_pc topics,
    patchwork.hpp:465-475): reverted points must be classified ground,
    rejected ones nonground, and they never overlap."""
    xyz = scan
    res = estimate_ground(jnp.asarray(xyz), jnp.ones(xyz.shape[0], bool))
    ground = np.asarray(res.ground)
    nonground = np.asarray(res.nonground)
    reverted = np.asarray(res.reverted)
    rejected = np.asarray(res.rejected)
    assert not (reverted & rejected).any()
    assert (~reverted | ground).all(), "reverted must be a subset of ground"
    assert (~rejected | nonground).all(), \
        "rejected must be a subset of nonground"


def test_patchwork_masked_points_dropped(scan):
    xyz = scan
    n = xyz.shape[0]
    mask = np.ones(n, bool)
    mask[: n // 2] = False
    res = estimate_ground(jnp.asarray(xyz), jnp.asarray(mask))
    assert not np.asarray(res.ground)[: n // 2].any()
    assert not np.asarray(res.nonground)[: n // 2].any()


def test_projection_row_col_ranges(scan):
    xyz = scan
    lidar = LidarConfig()
    row, col, rng, ok, _flat, img, owner = project_to_range_image(
        jnp.asarray(xyz), jnp.ones(xyz.shape[0], bool), lidar)
    row, col, ok = np.asarray(row), np.asarray(col), np.asarray(ok)
    assert ok.mean() > 0.95
    assert (row[ok] >= 0).all() and (row[ok] < lidar.n_scan).all()
    assert (col[ok] >= 0).all() and (col[ok] < lidar.horizon_scan).all()
    img = np.asarray(img)
    occ = np.isfinite(img) & (img < 1e30)
    # ray-cast scans fill most pixels that have a return
    assert occ.mean() > 0.5
    own = np.asarray(owner)
    assert (own[occ] >= 0).all()
    # owner's range must equal the pixel range to within the packed-key
    # quantization bucket (~6 mm; see project_to_range_image)
    rr = np.asarray(rng)
    np.testing.assert_allclose(rr[own[occ]], img[occ], atol=0.01)


def test_label_components_two_blobs():
    """Two compact blobs at very different ranges -> different labels;
    within-blob pixels connected (angle criterion passes for equal ranges)."""
    lidar = LidarConfig.preset("VLP-16")
    rows, cols = lidar.n_scan, lidar.horizon_scan
    img = np.full((rows, cols), 1e30, np.float32)
    img[4:8, 100:110] = 10.0   # blob A
    img[4:8, 500:510] = 30.0   # blob B
    valid = img < 1e29
    cfg = ProjectionConfig(neighbor_mode="4Neighbor")
    labels, feasible, _ = label_components(jnp.asarray(img), jnp.asarray(valid),
                                        lidar, cfg)
    labels = np.asarray(labels)
    la = labels[4:8, 100:110]
    lb = labels[4:8, 500:510]
    assert (la == la[0, 0]).all()
    assert (lb == lb[0, 0]).all()
    assert la[0, 0] != lb[0, 0]
    feas = np.asarray(feasible)
    assert feas[la[0, 0]] and feas[lb[0, 0]]  # both 40 px >= 30


def test_label_components_small_cluster_rejected():
    lidar = LidarConfig.preset("VLP-16")
    rows, cols = lidar.n_scan, lidar.horizon_scan
    img = np.full((rows, cols), 1e30, np.float32)
    img[6, 200:204] = 5.0      # 4 px on one line -> infeasible
    img[2:10, 900:920] = 8.0   # 160 px -> feasible
    valid = img < 1e29
    cfg = ProjectionConfig(neighbor_mode="4Neighbor")
    labels, feasible, _ = label_components(jnp.asarray(img), jnp.asarray(valid),
                                        lidar, cfg)
    labels, feas = np.asarray(labels), np.asarray(feasible)
    assert not feas[labels[6, 200]]
    assert feas[labels[5, 910]]


def test_label_components_column_wraparound():
    """A cluster spanning the 0/H-1 column seam must be one component."""
    lidar = LidarConfig.preset("VLP-16")
    rows, cols = lidar.n_scan, lidar.horizon_scan
    img = np.full((rows, cols), 1e30, np.float32)
    img[4:8, 0:20] = 12.0
    img[4:8, cols - 20:] = 12.0
    valid = img < 1e29
    cfg = ProjectionConfig(neighbor_mode="4Neighbor")
    labels, _, _ = label_components(jnp.asarray(img), jnp.asarray(valid),
                                 lidar, cfg)
    labels = np.asarray(labels)
    assert labels[5, 0] == labels[5, cols - 1]


def test_segment_cloud_end_to_end(scan):
    xyz = scan
    n = xyz.shape[0]
    # Patchwork-mode: feed nonground only
    nonground = np.abs(xyz[:, 2] + 1.723) > 0.15
    res = segment_cloud(jnp.asarray(xyz), jnp.asarray(nonground))
    vs = np.asarray(res.valid_segments)
    out = np.asarray(res.outliers)
    assert vs.sum() > 500, "synthetic scene should yield sizable clusters"
    assert not (vs & out).any()
    assert not vs[~nonground].any(), "ground points must not enter segments"


def test_segment_cloud_lego_mode(scan):
    xyz = scan
    res = segment_cloud(jnp.asarray(xyz), jnp.ones(xyz.shape[0], bool),
                        ground_mode="LeGO-LOAM")
    g = np.asarray(res.ground)
    true_ground = np.abs(xyz[:, 2] + 1.723) < 0.12
    # LeGO's angle test is cruder than Patchwork: just require that the bulk
    # of detected ground is true ground and that a decent share is found.
    if g.sum() > 0:
        assert (g & true_ground).sum() / g.sum() > 0.7
    assert g.sum() > 0.2 * true_ground.sum()


def test_label_component_stats_vs_bruteforce(rng):
    """Per-component size/line stats must match a brute-force count on a
    scene with MANY components whose run-start rows are non-monotone
    across label order — the round-4 regression (a bare cummax of
    run-start rows leaked earlier runs' larger rows into later runs'
    `lines`, silently rejecting small valid clusters; 29% of segment
    points vanished before the fix)."""
    import collections

    from quatro_tpu.config import LidarConfig, ProjectionConfig
    from quatro_tpu.preprocessing.projection import label_components

    lidar = LidarConfig()
    cfg = ProjectionConfig()
    rows, cols = lidar.n_scan, lidar.horizon_scan
    # sparse random blobs at random row offsets: near-constant range so
    # the angle criterion connects everything inside a blob
    rimg = np.full((rows, cols), np.inf, np.float32)
    valid = np.zeros((rows, cols), bool)
    for k in range(120):
        r0 = rng.integers(0, rows - 6)
        c0 = rng.integers(0, cols - 8)
        h = rng.integers(1, 6)
        w = rng.integers(1, 8)
        rimg[r0:r0 + h, c0:c0 + w] = 10.0 + 0.001 * k
        valid[r0:r0 + h, c0:c0 + w] = True
    lab, feas, pixf = label_components(jnp.asarray(rimg), jnp.asarray(valid),
                                       lidar, cfg)
    lab = np.asarray(lab)
    pixf = np.asarray(pixf)

    comp = collections.defaultdict(list)
    for r in range(rows):
        for c in range(cols):
            if lab[r, c] >= 0:
                comp[lab[r, c]].append(r)
    for l, rws in comp.items():
        size = len(rws)
        lines = len(set(rws))
        expect = (size >= cfg.min_pts_for_subcluster) or (
            size >= cfg.segment_valid_point_num
            and lines >= cfg.segment_valid_line_num)
        got = bool(pixf[lab == l].all()) if expect else not pixf[lab == l].any()
        assert got, (f"component {l}: size={size} lines={lines} "
                     f"expect feasible={expect}")
