"""Ground-plane alignment: roll/pitch/z from the segmented ground.

Quasi-SO(3) solves yaw only; the reference handles tilt either not at all
or via an IMU-derived RyRx prior (reference: include/quatro.hpp:276-279,
419-426). Quatro++ (IJRR'24, cited in reference README.md:139-151)
observes that the ground segmentation the pipeline already ran contains
the missing degrees of freedom: fitting the dominant ground plane in each
scan yields each scan's roll/pitch (plane normal) and sensor height
(plane offset), turning the yaw-only solver into a full 6-DoF estimator
with no extra sensor.

TPU-native design: the plane fit is one masked 3x3 covariance + the
closed-form eigensolver already used by Patchwork and the normal
estimator — no RANSAC, no iteration. Everything is shape-static and
jittable; degenerate inputs (too few ground points, a tilted or curved
"ground") degrade to identity leveling via ``jnp.where`` so a bad scan
cannot poison a vmapped batch.

Frame algebra. Let ``L_s`` / ``L_t`` be the leveling rotations taking each
scan's ground normal to +z. The solver runs on the leveled clouds and
returns ``(R', t')`` with ``tgt' ~= R' @ src' + t'``; composing back,

    tgt = L_t^T R' L_s @ src + L_t^T t'      =>  R = L_t^T R' L_s.

In the leveled frames the ground planes are horizontal at heights
``g_s`` / ``g_t``, so the vertical translation is known in closed form:
``t'_z = g_t - g_s`` (``use_ground_z``) — typically tighter than the
correspondence-based COTE z, because every ground point votes for it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from quatro_tpu.config import GroundAlignmentConfig
from quatro_tpu.ops.normals import smallest_eigenvector_3x3


class GroundPlane(NamedTuple):
    normal: jax.Array    # (3,) unit, oriented n_z > 0
    centroid: jax.Array  # (3,)
    count: jax.Array     # () int32 — ground points used
    flatness: jax.Array  # () f32 — lambda_min / trace (0 = perfect plane)


class GroundAlignment(NamedTuple):
    """Leveling rotations + leveled ground heights for one scan pair."""

    src_level: jax.Array   # (3, 3) L_s
    tgt_level: jax.Array   # (3, 3) L_t
    src_height: jax.Array  # () f32 — ground z in the leveled source frame
    tgt_height: jax.Array  # () f32
    valid: jax.Array       # () bool — both plane fits passed the gates


def fit_ground_plane(points: jnp.ndarray, mask: jnp.ndarray) -> GroundPlane:
    """Least-squares plane through the masked points.

    Masked centroid + 3x3 scatter matrix, smallest eigenvector = normal
    (the same closed form Patchwork's per-patch fit uses, mirroring
    reference include/patchwork.hpp:264-279 at whole-scan scope). The
    normal is oriented upward (n_z > 0).
    """
    dtype = points.dtype
    w = mask.astype(dtype)
    count = jnp.sum(mask.astype(jnp.int32))
    denom = jnp.maximum(jnp.sum(w), jnp.asarray(1.0, dtype))
    centroid = jnp.sum(points * w[:, None], axis=0) / denom
    d = (points - centroid) * w[:, None]
    # HIGHEST: the MXU's default bf16 accumulation is ~3 decimal digits —
    # enough to tilt the fitted normal by degrees on metre-scale clouds.
    cov = jnp.matmul(d.T, d, precision=jax.lax.Precision.HIGHEST) / denom
    normal, lam_min = smallest_eigenvector_3x3(cov)
    normal = normal * jnp.sign(normal[2] + jnp.asarray(1e-12, dtype))
    trace = jnp.trace(cov)
    flatness = lam_min / jnp.maximum(trace, jnp.asarray(1e-30, dtype))
    return GroundPlane(normal, centroid, count, flatness)


def leveling_rotation(normal: jnp.ndarray) -> jnp.ndarray:
    """Minimal rotation taking ``normal`` to +z (Rodrigues, closed form).

    With v = n x z and c = n.z:  R = I + [v]x + [v]x^2 / (1 + c).
    Stable for the oriented normals produced by ``fit_ground_plane``
    (n_z > 0 implies c > 0, far from the c = -1 singularity).
    """
    dtype = normal.dtype
    n = normal / jnp.maximum(jnp.linalg.norm(normal),
                             jnp.asarray(1e-12, dtype))
    # v = n x e_z = (n_y, -n_x, 0)
    vx, vy = n[1], -n[0]
    c = n[2]
    k = 1.0 / jnp.maximum(1.0 + c, jnp.asarray(1e-6, dtype))
    hat = jnp.array([[0.0, 0.0, vy],
                     [0.0, 0.0, -vx],
                     [-vy, vx, 0.0]], dtype=dtype)
    return jnp.eye(3, dtype=dtype) + hat + k * (hat @ hat)


def _gated_leveling(plane: GroundPlane, cfg: GroundAlignmentConfig):
    """(L, height, ok): identity leveling when the fit fails the gates."""
    dtype = plane.normal.dtype
    min_cos = jnp.cos(jnp.deg2rad(jnp.asarray(cfg.max_tilt_deg, dtype)))
    ok = ((plane.count >= cfg.min_points)
          & (plane.normal[2] >= min_cos)
          & (plane.flatness <= cfg.max_flatness))
    level = leveling_rotation(plane.normal)
    level = jnp.where(ok, level, jnp.eye(3, dtype=dtype))
    height = jnp.where(ok, jnp.vdot(level[2], plane.centroid,
                                    precision=jax.lax.Precision.HIGHEST),
                       jnp.asarray(0.0, dtype))
    return level, height, ok


def frame_leveling(points: jnp.ndarray, ground_mask: jnp.ndarray,
                   config: GroundAlignmentConfig):
    """Per-frame leveling for streaming/odometry use: fit THIS scan's
    ground plane and gate it. Returns (level (3,3), height (), ok ()).
    Pair-level gating (both sides must pass before trusting the height
    difference) happens at registration time via GroundAlignment.valid."""
    return _gated_leveling(fit_ground_plane(points, ground_mask), config)


@partial(jax.jit, static_argnames=("config",))
def align_ground(src_points: jnp.ndarray, src_ground: jnp.ndarray,
                 tgt_points: jnp.ndarray, tgt_ground: jnp.ndarray,
                 config: GroundAlignmentConfig = GroundAlignmentConfig()
                 ) -> GroundAlignment:
    """Fit both ground planes and build the pair's leveling rotations."""
    sp = fit_ground_plane(src_points, src_ground)
    tp = fit_ground_plane(tgt_points, tgt_ground)
    ls, hs, ok_s = _gated_leveling(sp, config)
    lt, ht, ok_t = _gated_leveling(tp, config)
    # A pair levels as a unit: leveling one side only would feed the
    # yaw-only solver a still-tilted relative rotation.
    ok = ok_s & ok_t
    eye = jnp.eye(3, dtype=src_points.dtype)
    zero = jnp.asarray(0.0, src_points.dtype)
    return GroundAlignment(jnp.where(ok, ls, eye), jnp.where(ok, lt, eye),
                           jnp.where(ok, hs, zero), jnp.where(ok, ht, zero),
                           ok)


def compose_leveled_solution(rotation: jnp.ndarray, translation: jnp.ndarray,
                             ga: GroundAlignment,
                             use_ground_z: bool = True):
    """Map a solve on leveled clouds back to the original frames.

    rotation/translation: the solver's (R', t') on ``L_s @ src`` vs
    ``L_t @ tgt``. Returns (R, t) in the raw frames. With ``use_ground_z``
    the leveled-frame vertical translation is replaced by the closed-form
    ground-height difference (gated on ``ga.valid``).
    """
    tz = translation[..., 2]
    if use_ground_z:
        # The closed-form height difference equals t'_z only when the
        # leveled solve is quasi-SO(3): a full-SO(3) R' with residual
        # roll/pitch re-tilts the leveled source ground plane, and the
        # override would inject a bias ~ residual tilt x scene offset.
        # Gate on R' keeping e_z (true by construction for yaw-only
        # solves; excludes tilted TEASER-mode results).
        r22 = rotation[..., 2, 2]
        yaw_like = r22 >= jnp.cos(jnp.deg2rad(
            jnp.asarray(1.0, r22.dtype)))
        tz = jnp.where(ga.valid & yaw_like,
                       ga.tgt_height - ga.src_height, tz)
    t_leveled = jnp.stack([translation[..., 0], translation[..., 1], tz],
                          axis=-1)
    hi = jax.lax.Precision.HIGHEST
    rot = jnp.matmul(jnp.matmul(ga.tgt_level.T, rotation, precision=hi),
                     ga.src_level, precision=hi)
    t = jnp.matmul(ga.tgt_level.T, t_leveled, precision=hi)
    return rot, t
