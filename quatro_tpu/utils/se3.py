"""SE(3) / yaw-rotation helpers shared across solver and tests."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotate_points(points: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """``points @ rotation.T`` at HIGHEST matmul precision.

    On TPU, f32 matmuls default to bf16 MXU passes (~0.4% relative error):
    at 40-120 m lidar ranges that is tens of centimeters — the same order
    as every noise-bound-scale threshold downstream (GNC residuals, COTE
    consensus, ICP gating, overlap verification). Measured on-chip:
    EXACTLY-aligned far-field clouds failed a 0.2 m overlap gate for 16%
    of points through the default-precision path. These (N, 3) @ (3, 3)
    matmuls are tiny, so exactness is free — every device-side pose
    application must go through here (or pass precision=HIGHEST itself).
    """
    return jnp.matmul(points, jnp.swapaxes(rotation, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def yaw_to_rotation(theta):
    """3x3 rotation about +z by angle theta (quasi-SO(3) embedding,
    reference: include/quatro.hpp:404-408)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)
    return rows


def rotation_to_yaw(rot):
    """Extract yaw angle from a (yaw-only) rotation matrix."""
    return jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0])


def make_transform(rotation, translation):
    """Compose a 4x4 homogeneous transform."""
    dtype = rotation.dtype
    out = jnp.eye(4, dtype=dtype)
    out = out.at[:3, :3].set(rotation)
    out = out.at[:3, 3].set(translation.astype(dtype))
    return out


def apply_transform(transform, points):
    """Apply a (4,4) transform to (..., 3) points."""
    rot = transform[:3, :3]
    t = transform[:3, 3]
    return rotate_points(points, rot) + t


def rotation_geodesic_error(r1, r2):
    """Angle in radians between two rotation matrices.

    atan2 form: the arccos-of-trace formula is ill-conditioned near zero in
    f32 (arccos'(1) is infinite); atan2 of the skew part stays accurate.
    """
    rel = r1.T @ r2
    skew = jnp.stack([rel[2, 1] - rel[1, 2], rel[0, 2] - rel[2, 0],
                      rel[1, 0] - rel[0, 1]])
    sin = jnp.linalg.norm(skew) / 2.0
    cos = (jnp.trace(rel) - 1.0) / 2.0
    return jnp.arctan2(sin, cos)


def exp_so3(w):
    """Rodrigues' formula: (3,) axis-angle vector -> (3,3) rotation.

    Small-angle-safe: uses the sinc/versine series below 1e-4 rad so the
    ICP update stays exact under f32 near convergence.
    """
    theta_sq = jnp.sum(w * w)
    theta = jnp.sqrt(theta_sq)
    k = jnp.array([[0.0, -w[2], w[1]],
                   [w[2], 0.0, -w[0]],
                   [-w[1], w[0], 0.0]], dtype=w.dtype)
    small = theta < 1e-4
    a = jnp.where(small, 1.0 - theta_sq / 6.0,
                  jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    return jnp.eye(3, dtype=w.dtype) + a * k + b * (k @ k)


def rotation_from_rpy(roll, pitch, yaw):
    """Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    rx = jnp.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx
