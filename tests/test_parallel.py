"""Sharding + pose-graph tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quatro_tpu.config import SolverConfig
from quatro_tpu.io.synthetic import make_correspondences
from quatro_tpu.parallel import (PoseGraphEdges, make_loop_closing_step,
                                 make_pairs_mesh, optimize_pose_graph,
                                 sharded_register_batch, wrap_angle)
from quatro_tpu.solver import register_correspondences


def test_mesh_has_8_devices():
    mesh = make_pairs_mesh()
    assert mesh.devices.size == 8


def test_sharded_register_matches_single():
    mesh = make_pairs_mesh()
    b = 8
    pairs = [make_correspondences(seed=s, n_inliers=50, n_outliers=150)
             for s in range(b)]
    src = jnp.stack([jnp.asarray(p[0]) for p in pairs])
    tgt = jnp.stack([jnp.asarray(p[1]) for p in pairs])
    mask = jnp.ones(src.shape[:2], bool)

    fn = sharded_register_batch(mesh)
    sols = fn(src, tgt, mask)
    for i in (0, 3, 7):
        single = register_correspondences(src[i], tgt[i], mask[i])
        np.testing.assert_allclose(np.asarray(sols.rotation[i]),
                                   np.asarray(single.rotation), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sols.translation[i]),
                                   np.asarray(single.translation), atol=1e-3)


def _make_loop_fixture(num_poses=9, seed=0, noise=0.01, drift=0.15):
    """Ground-truth planar trajectory + odometry edges (with drift noise)
    + one exact-ish loop closure back to pose 0."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((num_poses, 4))
    for k in range(1, num_poses):
        gt[k, 3] = gt[k - 1, 3] + 2 * np.pi / num_poses
        step = np.array([2.0, 0.3, 0.02])
        c, s = np.cos(gt[k - 1, 3]), np.sin(gt[k - 1, 3])
        gt[k, :3] = gt[k - 1, :3] + np.array(
            [c * step[0] - s * step[1], s * step[0] + c * step[1], step[2]])

    ei, ej, t_meas, yaw_meas = [], [], [], []

    def add_edge(i, j, sigma):
        c, s = np.cos(gt[i, 3]), np.sin(gt[i, 3])
        dt = gt[j, :3] - gt[i, :3]
        local = np.array([c * dt[0] + s * dt[1], -s * dt[0] + c * dt[1],
                          dt[2]])
        ei.append(i); ej.append(j)
        t_meas.append(local + rng.normal(0, sigma, 3))
        yaw_meas.append(gt[j, 3] - gt[i, 3] + rng.normal(0, sigma))

    for k in range(num_poses - 1):
        add_edge(k, k + 1, noise)
    add_edge(num_poses - 1, 0, noise)  # loop closure

    edges = PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        t_meas=jnp.asarray(np.array(t_meas), jnp.float32),
        yaw_meas=jnp.asarray(np.array(yaw_meas), jnp.float32),
        weight=jnp.ones(len(ei), jnp.float32),
        mask=jnp.ones(len(ei), bool))

    # drifted initial guess (integrate noisy odometry)
    init = gt + np.concatenate(
        [np.zeros((1, 4)), rng.normal(0, drift, (num_poses - 1, 4))])
    init[0] = gt[0]
    return gt, init.astype(np.float32), edges


def test_pose_graph_closes_loop():
    gt, init, edges = _make_loop_fixture()
    out = optimize_pose_graph(jnp.asarray(init), edges, gt.shape[0],
                              gn_iters=10, cg_iters=40)
    out = np.asarray(out)
    err_t = np.linalg.norm(out[:, :3] - gt[:, :3], axis=1)
    err_y = np.abs(np.asarray(wrap_angle(jnp.asarray(out[:, 3] - gt[:, 3]))))
    init_err = np.linalg.norm(init[:, :3] - gt[:, :3], axis=1)
    assert err_t.max() < 0.1, f"translation errors {err_t}"
    assert err_y.max() < 0.05, f"yaw errors {err_y}"
    assert err_t.mean() < 0.5 * max(init_err.mean(), 1e-6)


def test_pose_graph_anchor_fixes_gauge():
    gt, init, edges = _make_loop_fixture(seed=3)
    out = np.asarray(optimize_pose_graph(jnp.asarray(init), edges,
                                         gt.shape[0]))
    np.testing.assert_allclose(out[0], gt[0], atol=1e-3)


def test_loop_closing_step_end_to_end():
    """8 scan-pair registrations sharded over 8 devices feed a pose graph."""
    mesh = make_pairs_mesh()
    num_poses = 8
    rng = np.random.default_rng(7)

    # trajectory of 8 poses in a loop; edge k: k -> (k+1) % 8
    gt = np.zeros((num_poses, 4), np.float32)
    for k in range(1, num_poses):
        gt[k, 3] = gt[k - 1, 3] + np.deg2rad(20.0)
        gt[k, :2] = gt[k - 1, :2] + [1.5, 0.5]

    src_l, tgt_l = [], []
    ei, ej = [], []
    for k in range(num_poses):
        j = (k + 1) % num_poses
        c, s = np.cos(gt[k, 3]), np.sin(gt[k, 3])
        dt = gt[j, :3] - gt[k, :3]
        local_t = np.array([c * dt[0] + s * dt[1], -s * dt[0] + c * dt[1],
                            dt[2]])
        dyaw = gt[j, 3] - gt[k, 3]
        # build correspondences whose registration IS (dyaw, local_t):
        # tgt = R(dyaw) src + local_t  maps scan j's frame onto scan k's?
        s_pts, t_pts, _, _ = make_correspondences(
            seed=100 + k, n_inliers=50, n_outliers=100,
            yaw_deg=np.rad2deg(dyaw), translation=tuple(local_t))
        src_l.append(s_pts); tgt_l.append(t_pts)
        # the registration solves tgt = R(yaw_j - yaw_k) src + R(-yaw_k)(t_j
        # - t_k), which is exactly the edge (i=k, j) measurement convention
        ei.append(k); ej.append(j)

    src = jnp.asarray(np.stack(src_l))
    tgt = jnp.asarray(np.stack(tgt_l))
    mask = jnp.ones(src.shape[:2], bool)

    step = make_loop_closing_step(mesh, num_poses)
    init = gt + rng.normal(0, 0.1, gt.shape).astype(np.float32)
    init[0] = gt[0]
    poses, sols = step(src, tgt, mask, jnp.asarray(ei, jnp.int32),
                       jnp.asarray(ej, jnp.int32), jnp.asarray(init))
    poses = np.asarray(poses)
    assert np.asarray(sols.valid).all()
    err = np.linalg.norm(poses[:, :3] - gt[:, :3], axis=1)
    assert err.max() < 0.25, f"pose errors {err}"


def test_pose_graph_survives_disconnection():
    """A rejected edge can split the trajectory into a component with no
    path to the anchor; the GN normal equations are then singular along
    that component's rigid modes. The solve must stay finite and leave
    unconstrained poses at their initialization — one bad registration
    must not poison the whole trajectory."""
    m = 5
    init = np.array([[0, 0, 0, 0],
                     [1.0, 0, 0, 0],
                     [2.0, 0.3, 0, 0],
                     [3.0, 0.3, 0, 0],
                     [4.0, 0.3, 0, 0.2]], np.float32)
    # Chain 0-1-2-3-4, but edge (1,2) is masked out: poses {2,3,4} float.
    ei = jnp.asarray([0, 1, 2, 3], jnp.int32)
    ej = jnp.asarray([1, 2, 3, 4], jnp.int32)
    t = jnp.asarray([[1, 0, 0], [1, 0, 0], [1, 0, 0], [1, 0, 0]],
                    jnp.float32)
    edges = PoseGraphEdges(
        i=ei, j=ej, t_meas=t, yaw_meas=jnp.zeros(4),
        weight=jnp.full(4, 30.0),
        mask=jnp.asarray([True, False, True, True]))
    out = np.asarray(optimize_pose_graph(jnp.asarray(init), edges, m,
                                         gn_iters=8, cg_iters=32))
    assert np.isfinite(out).all(), out
    # Anchored component converges to its measurements...
    np.testing.assert_allclose(out[1], [1, 0, 0, 0], atol=1e-3)
    # ...while the floating component keeps its internal shape from the
    # valid (2,3) and (3,4) edges without drifting to NaN/infinity.
    np.testing.assert_allclose(out[3, :3] - out[2, :3], [1, 0, 0],
                               atol=0.06)
    assert np.linalg.norm(out[2] - init[2]) < 1.0


def test_communication_profile_is_pinned():
    """Registration must compile to ZERO collectives (embarrassingly
    parallel over the pairs axis); loop closing must reduce with
    all-reduce only, never gather cloud-sized tensors. Guards against a
    refactor silently introducing resharding (see parallel/diagnostics.py).
    """
    from quatro_tpu.parallel.diagnostics import collective_profile

    mesh = make_pairs_mesh()
    b = 8
    pairs = [make_correspondences(seed=s, n_inliers=30, n_outliers=98)
             for s in range(b)]
    src = jnp.stack([jnp.asarray(p[0]) for p in pairs])
    tgt = jnp.stack([jnp.asarray(p[1]) for p in pairs])
    mask = jnp.ones(src.shape[:2], bool)

    reg_profile = collective_profile(sharded_register_batch(mesh),
                                     src, tgt, mask)
    assert not reg_profile, f"registration gained collectives: {reg_profile}"

    step = make_loop_closing_step(mesh, b, SolverConfig(),
                                  gn_iters=3, cg_iters=8)
    ei = jnp.arange(b, dtype=jnp.int32)
    ej = (ei + 1) % b
    gt = jnp.zeros((b, 4))
    loop_profile = collective_profile(step, src, tgt, mask, ei, ej, gt)
    assert set(loop_profile) <= {"all-reduce"}, loop_profile
    assert loop_profile["all-reduce"] >= 1


@pytest.mark.slow
def test_full_pipeline_step_profile_and_validity():
    """The RAW-SCAN multi-chip step (Patchwork + projection + voxel + FPFH
    + matching + solve per pair inside the shard_map, pose graph after)
    must stay all-reduce-only: the entire front-end is per-pair local, so
    any collective beyond the pose-graph psums means a preprocessing op
    silently acquired a resharding/replication constraint (VERDICT r1
    weakness 5)."""
    from quatro_tpu.config import FPFHConfig, LidarConfig, PipelineConfig
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.parallel import make_full_pipeline_step
    from quatro_tpu.parallel.diagnostics import collective_profile
    from quatro_tpu.types import PointBatch

    mesh = make_pairs_mesh()
    b = 8
    cfg = PipelineConfig(
        lidar=LidarConfig.preset("VLP-16"),
        max_raw_points=16384, max_nonground_points=8192,
        max_segment_points=4096, max_voxels=1024,
        fpfh=FPFHConfig(max_correspondences=128))
    srcs, tgts = [], []
    for k in range(b):
        a, bb, _ = make_scan_pair(seed=k, yaw_deg=8.0 + 3 * k,
                                  translation=(1.5, 0.5, 0.0),
                                  lidar=cfg.lidar)
        srcs.append(PointBatch.from_numpy(a, cfg.max_raw_points))
        tgts.append(PointBatch.from_numpy(bb, cfg.max_raw_points))
    sb = jax.tree.map(lambda *l: jnp.stack(l), *srcs)
    tb = jax.tree.map(lambda *l: jnp.stack(l), *tgts)
    ei = jnp.arange(b, dtype=jnp.int32)
    ej = (ei + 1) % b
    poses0 = jnp.zeros((b, 4), jnp.float32)

    step = make_full_pipeline_step(mesh, b, cfg, gn_iters=2, cg_iters=6)
    profile = collective_profile(step, sb.points, sb.mask, tb.points,
                                 tb.mask, ei, ej, poses0)
    assert set(profile) <= {"all-reduce"}, (
        f"full raw-scan pipeline gained non-psum collectives: {profile}")
    assert profile["all-reduce"] >= 1

    poses, sols = step(sb.points, sb.mask, tb.points, tb.mask, ei, ej,
                       poses0)
    assert np.isfinite(np.asarray(poses)).all()
    assert int(np.asarray(sols.valid).sum()) == b


def test_collective_profile_counts_once_per_op():
    """The counter must report logical ops: HLO text echoes an opcode in
    the instruction name, async start/done halves, and operand references —
    none of those may inflate the count."""
    from collections import Counter

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from quatro_tpu.parallel.diagnostics import collective_profile
    from quatro_tpu.parallel.mesh import PAIRS_AXIS

    mesh = make_pairs_mesh()
    n = len(mesh.devices.flat)

    def one_psum(x):
        return shard_map(lambda v: jax.lax.psum(v, PAIRS_AXIS), mesh=mesh,
                         in_specs=P(PAIRS_AXIS), out_specs=P())(x)

    x = jnp.arange(4.0 * n).reshape(n, 4)
    assert collective_profile(one_psum, x) == Counter({"all-reduce": 1})
