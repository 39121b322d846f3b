"""Ground-plane alignment (solver/ground.py): plane fit, leveling,
composition algebra, and the full-6-DoF tilted-platform pipeline
(the Quatro++ extension — roll/pitch/z from ground segmentation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quatro_tpu.config import (GroundAlignmentConfig, PipelineConfig,
                               replace)
from quatro_tpu.io.synthetic import make_scan_pair
from quatro_tpu.solver.ground import (GroundAlignment, align_ground,
                                      compose_leveled_solution,
                                      fit_ground_plane, leveling_rotation)
from quatro_tpu.types import PointBatch
from quatro_tpu.utils.se3 import rotation_from_rpy, rotation_geodesic_error


def _plane_cloud(rng, normal, offset, n=600, extent=20.0, noise=0.0):
    """Points on the plane normal . x = offset (+ optional noise)."""
    normal = np.asarray(normal, np.float64)
    normal = normal / np.linalg.norm(normal)
    # basis spanning the plane
    a = np.array([1.0, 0, 0]) if abs(normal[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(normal, a); u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    uv = rng.uniform(-extent, extent, size=(n, 2))
    pts = offset * normal + uv[:, :1] * u + uv[:, 1:] * v
    if noise:
        pts = pts + rng.normal(0, noise, size=pts.shape) * normal
    return pts.astype(np.float32)


def test_fit_ground_plane_exact(rng):
    normal = np.array([0.08, -0.05, 1.0])
    normal /= np.linalg.norm(normal)
    pts = _plane_cloud(rng, normal, offset=-1.7)
    # pad with masked garbage
    pad = rng.uniform(-50, 50, size=(200, 3)).astype(np.float32)
    points = jnp.asarray(np.vstack([pts, pad]))
    mask = jnp.asarray(np.r_[np.ones(len(pts), bool), np.zeros(200, bool)])
    plane = fit_ground_plane(points, mask)
    assert float(jnp.dot(plane.normal, jnp.asarray(normal))) > 0.9999
    assert int(plane.count) == len(pts)
    assert float(plane.flatness) < 1e-5
    # centroid lies on the plane
    assert abs(float(jnp.dot(plane.normal, plane.centroid)) - (-1.7)) < 1e-3


def test_leveling_rotation_properties(rng):
    for _ in range(5):
        n = rng.normal(size=3)
        n[2] = abs(n[2]) + 0.5
        n /= np.linalg.norm(n)
        level = np.asarray(leveling_rotation(jnp.asarray(n, jnp.float32)))
        np.testing.assert_allclose(level @ level.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(level) > 0.999
        np.testing.assert_allclose(level @ n, [0, 0, 1], atol=1e-5)
    # already level -> identity
    eye = np.asarray(leveling_rotation(jnp.asarray([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(eye, np.eye(3), atol=1e-7)


def test_compose_leveled_solution_round_trip(rng):
    """R = L_t^T R' L_s must invert the leveling exactly."""
    ls = np.asarray(rotation_from_rpy(0.05, -0.03, 0.0), np.float32)
    lt = np.asarray(rotation_from_rpy(-0.02, 0.04, 0.0), np.float32)
    r_true = np.asarray(rotation_from_rpy(0.0, 0.0, 0.7), np.float32)
    r_true = lt.T @ r_true @ ls          # a realistic tilted relative pose
    t_true = np.array([2.0, -1.0, 0.3], np.float32)
    ga = GroundAlignment(jnp.asarray(ls), jnp.asarray(lt),
                         jnp.asarray(0.0), jnp.asarray(0.0),
                         jnp.asarray(True))
    r_lvl = jnp.asarray(lt @ r_true @ ls.T)
    t_lvl = jnp.asarray(lt @ t_true)
    rot, t = compose_leveled_solution(r_lvl, t_lvl, ga, use_ground_z=False)
    np.testing.assert_allclose(np.asarray(rot), r_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)


def test_use_ground_z_gated_on_quasi_so3(rng):
    """The ground-height t_z override is only valid when the leveled solve
    kept e_z (yaw-only). A tilted full-SO(3) result must keep the solver's
    own t_z instead of the now-biased closed-form height difference."""
    ga = GroundAlignment(jnp.eye(3), jnp.eye(3),
                         jnp.asarray(-1.5), jnp.asarray(-1.9),
                         jnp.asarray(True))
    t_lvl = jnp.asarray([2.0, -1.0, 0.3])
    yaw_r = np.asarray(rotation_from_rpy(0.0, 0.0, 0.7), np.float32)
    _, t = compose_leveled_solution(jnp.asarray(yaw_r), t_lvl, ga,
                                    use_ground_z=True)
    assert abs(float(t[2]) - (-0.4)) < 1e-5  # yaw-only: heights win
    tilted = np.asarray(rotation_from_rpy(0.06, -0.04, 0.7), np.float32)
    _, t = compose_leveled_solution(jnp.asarray(tilted), t_lvl, ga,
                                    use_ground_z=True)
    assert abs(float(t[2]) - 0.3) < 1e-5  # tilted: solver t_z wins


def test_align_ground_heights_give_dz(rng):
    """use_ground_z reads t_z off the two plane offsets."""
    # two level ground planes at different sensor heights
    src = _plane_cloud(rng, [0, 0, 1.0], offset=-1.5)
    tgt = _plane_cloud(rng, [0, 0, 1.0], offset=-1.9)
    cfg = GroundAlignmentConfig(enabled=True, min_points=100)
    ga = align_ground(jnp.asarray(src), jnp.ones(len(src), bool),
                      jnp.asarray(tgt), jnp.ones(len(tgt), bool), cfg)
    assert bool(ga.valid)
    # dz = g_t - g_s = (-1.9) - (-1.5) = -0.4: the sensor sits 0.4 m lower
    # relative to the target's ground
    dz = float(ga.tgt_height - ga.src_height)
    assert abs(dz - (-0.4)) < 1e-3


def test_align_ground_gates_degrade_to_identity(rng):
    pts = _plane_cloud(rng, [0, 0, 1.0], offset=-1.7, n=50)
    cfg = GroundAlignmentConfig(enabled=True, min_points=256)
    ga = align_ground(jnp.asarray(pts), jnp.ones(len(pts), bool),
                      jnp.asarray(pts), jnp.ones(len(pts), bool), cfg)
    assert not bool(ga.valid)
    np.testing.assert_allclose(np.asarray(ga.src_level), np.eye(3))
    # composition with invalid ga must be a no-op (incl. the z override)
    rot, t = compose_leveled_solution(jnp.eye(3), jnp.asarray([1., 2., 3.]),
                                      ga, use_ground_z=True)
    np.testing.assert_allclose(np.asarray(t), [1, 2, 3], atol=1e-6)


def test_wall_rejected_by_tilt_gate(rng):
    wall = _plane_cloud(rng, [1.0, 0, 0.1], offset=5.0)
    cfg = GroundAlignmentConfig(enabled=True, min_points=100)
    ga = align_ground(jnp.asarray(wall), jnp.ones(len(wall), bool),
                      jnp.asarray(wall), jnp.ones(len(wall), bool), cfg)
    assert not bool(ga.valid)


@pytest.mark.parametrize("use_ground_z", [True, False])
@pytest.mark.slow
def test_tilted_platform_full_6dof(use_ground_z):
    """Scans from a tilted platform: yaw-only fails, ground alignment
    recovers the full rotation (and z when use_ground_z)."""
    from quatro_tpu.pipeline import register_scan_pair

    src_xyz, tgt_xyz, gt = make_scan_pair(seed=11, yaw_deg=20.0,
                                          translation=(2.5, 1.0, 0.05))
    # Tilt each platform differently (4-5 deg of roll/pitch).
    a = np.asarray(rotation_from_rpy(0.07, -0.05, 0.0), np.float32)
    b = np.asarray(rotation_from_rpy(-0.04, 0.06, 0.0), np.float32)
    src2 = src_xyz @ a.T
    tgt2 = tgt_xyz @ b.T
    # tgt = R src + t  =>  tgt2 = (B R A^T) src2 + B t
    r_gt = b @ gt[:3, :3] @ a.T
    t_gt = b @ gt[:3, 3]

    cfg = PipelineConfig(
        max_voxels=8192,
        ground_alignment=GroundAlignmentConfig(enabled=True,
                                               use_ground_z=use_ground_z))
    src = PointBatch.from_numpy(src2, capacity=131072)
    tgt = PointBatch.from_numpy(tgt2, capacity=131072)
    res = register_scan_pair(src, tgt, cfg)
    sol = res.solution
    assert bool(sol.valid)

    rot_err = float(rotation_geodesic_error(jnp.asarray(r_gt),
                                            sol.rotation))
    trans_err = float(np.linalg.norm(np.asarray(sol.translation) - t_gt))
    assert rot_err < 0.03, f"rotation error {rot_err} rad"
    assert trans_err < 0.5, f"translation error {trans_err} m"

    # the yaw-only solver on the same tilted pair must be strictly worse in
    # rotation (it cannot represent the roll/pitch component, ~0.1 rad here)
    res0 = register_scan_pair(src, tgt, replace(cfg,
                              ground_alignment=GroundAlignmentConfig()))
    rot_err0 = float(rotation_geodesic_error(jnp.asarray(r_gt),
                                             res0.solution.rotation))
    assert rot_err0 > rot_err, (rot_err0, rot_err)
    assert rot_err0 > 0.05
