"""Point-to-plane ICP refinement (extension beyond the reference).

The reference stops at the coarse global pose — its README positions Quatro
as the *initial alignment* that a local method then polishes (reference:
README.md:26-44 positions Quatro against coarse-alignment baselines; the
Quatro++ paper pairs it with local refinement inside a SLAM front-end).
Users coming from the reference run `pcl::IterativeClosestPoint` on the
result; this module is that step, TPU-native, so the whole
coarse-then-fine chain stays on device and inside one jit.

Design (TPU-first, no kd-trees, no dynamic shapes):

- correspondences: brute-force squared-distance matmul (MXU) from a
  fixed-size subsample of the source voxels against all target voxels,
  `argmin` per row; gated by a max-distance radius and the target normal
  validity mask.
- objective: Huber-weighted point-to-plane; each Gauss-Newton step builds
  the 6x6 normal equations with two small matmuls and solves them with a
  damped `jnp.linalg.solve` — the only linear algebra in the loop.
- update: left-multiplicative `exp_so3(dw)` applied to the whole transform
  (rotation AND translation — the Jacobian linearizes about p = R src + t);
  fixed iteration count via `lax.scan` (shape-static, vmap/pjit-friendly).
  A `yaw_only` mode solves the CONSTRAINED normal equations (roll/pitch
  rows/cols decoupled before the solve), keeping the quasi-SO(3) contract
  of the Quatro solver under severe ground sparsity.
- failure masking: steps with fewer than `min_correspondences` matches
  leave the pose untouched; an invalid coarse solution passes through
  unchanged, so a failed pair still cannot poison a batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quatro_tpu.config import IcpConfig
from quatro_tpu.ops.neighbors import pairwise_sq_dists
from quatro_tpu.utils.se3 import exp_so3, rotate_points


class IcpResult(NamedTuple):
    rotation: jax.Array       # (3, 3) refined rotation
    translation: jax.Array    # (3,) refined translation
    rmse: jax.Array           # () point-to-plane RMSE over final inliers
    num_inliers: jax.Array    # () int32 matched correspondences, last iter
    converged: jax.Array      # () bool — had >= min_correspondences at end


def _subsample(points: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Evenly-strided k of the valid points, compacted to (k, 3).

    STRIDED, not first-k: voxel clouds are spatially ordered (x-major key
    order, ops/voxel.py), so the first k valid entries would be an x-slab
    of the scene — a catastrophic support for point-to-plane. Striding
    the compacted valid range keeps global coverage under any ordering.
    """
    n = points.shape[0]
    if k >= n:
        return points, mask
    iota = jnp.arange(n)
    order = jnp.argsort(jnp.where(mask, iota, n + iota))
    m = jnp.sum(mask).astype(jnp.int32)
    # when fewer than k are valid, take them as-is (the strided formula
    # would duplicate a prefix subset)
    take = jnp.where(m >= k, (jnp.arange(k) * jnp.maximum(m, 1)) // k,
                     jnp.arange(k))
    sel = order[jnp.minimum(take, n - 1)]
    smask = jnp.arange(k) < jnp.minimum(m, k)
    return points[sel], mask[sel] & smask


def refine_icp(src_points: jnp.ndarray, src_mask: jnp.ndarray,
               tgt_points: jnp.ndarray, tgt_mask: jnp.ndarray,
               tgt_normals: jnp.ndarray, tgt_normal_valid: jnp.ndarray,
               init_rotation: jnp.ndarray, init_translation: jnp.ndarray,
               config: IcpConfig, valid: jnp.ndarray | bool = True
               ) -> IcpResult:
    """Polish (R, t) so that R @ src + t aligns to tgt, point-to-plane.

    src_points/tgt_points: (V, 3) voxel clouds with masks; tgt_normals from
    `ops.normals.estimate_normals` on the target voxels. `valid` gates the
    whole refinement (pass `solution.valid` from the coarse solve).
    """
    dtype = src_points.dtype
    src_s, smask_s = _subsample(src_points, src_mask, config.max_source_points)
    smask_f = smask_s.astype(dtype)

    # Gate schedule: hold wide for basin capture, then anneal geometrically
    # for precision (see IcpConfig.hold_iterations for the measurements).
    d0 = max(config.max_correspondence_distance,
             config.final_correspondence_distance)
    d1 = config.final_correspondence_distance
    iters = config.iterations
    hold = min(config.hold_iterations, iters)
    n_anneal = iters - hold
    gates = jnp.asarray(
        [d0] * hold
        + [d0 * (d1 / d0) ** ((i + 1) / max(n_anneal, 1))
           for i in range(n_anneal)], dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    tgt_ok = tgt_mask & tgt_normal_valid
    # freeze per-update-step DoF selector: [wx, wy, wz, tx, ty, tz]
    dof = jnp.asarray([0.0, 0.0, 1.0, 1.0, 1.0, 1.0] if config.yaw_only
                      else [1.0] * 6, dtype)

    def correspond(rot, trans, gate):
        """Gated point-to-plane residuals at the CURRENT pose."""
        p = rotate_points(src_s, rot) + trans                     # (K, 3)
        d2 = pairwise_sq_dists(p, tgt_points)                     # (K, V)
        d2 = jnp.where(tgt_ok[None, :], d2, big)
        j = jnp.argmin(d2, axis=1)                                # (K,)
        d2min = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
        ok = smask_s & (d2min <= gate * gate)
        r = jnp.sum(tgt_normals[j] * (p - tgt_points[j]), axis=-1)  # (K,)
        return p, tgt_normals[j], r, ok

    def step(carry, gate):
        rot, trans = carry
        p, n, r, ok = correspond(rot, trans, gate)
        absr = jnp.abs(r)
        huber = jnp.where(absr <= config.huber_delta, 1.0,
                          config.huber_delta / jnp.maximum(absr, 1e-12))
        w = ok.astype(dtype) * huber

        a = jnp.concatenate([jnp.cross(p, n), n], axis=-1)        # (K, 6)
        aw = a * w[:, None]
        h = a.T @ aw                                              # (6, 6)
        g = aw.T @ r                                              # (6,)
        # Constrained GN for yaw_only: decouple disabled DoF (zero their
        # rows/cols and gradient, unit diagonal) BEFORE solving — solving
        # the full 6x6 and truncating afterwards would let the disabled
        # roll/pitch absorb residual reduction and bias the kept DoF.
        h = h * (dof[:, None] * dof[None, :]) + jnp.diag(1.0 - dof)
        g = g * dof
        lam = config.damping * (jnp.trace(h) + 1.0)
        delta = -jnp.linalg.solve(h + lam * jnp.eye(6, dtype=dtype), g)

        n_ok = jnp.sum(ok)
        enough = n_ok >= config.min_correspondences
        delta = jnp.where(enough, delta, jnp.zeros_like(delta))

        # The Jacobian linearizes about p = R src + t, so the rotation
        # increment acts on the WHOLE transform: p' ~ exp(dw) p + dt
        # = exp(dw) R src + (exp(dw) t + dt).
        dr = exp_so3(delta[:3])
        hi = jax.lax.Precision.HIGHEST
        return (jnp.matmul(dr, rot, precision=hi),
                jnp.matmul(dr, trans, precision=hi) + delta[3:]), None

    (rot, trans), _ = jax.lax.scan(
        step, (init_rotation, init_translation), gates)

    # Metrics evaluated at the RETURNED pose (the scan's per-step stats
    # describe pre-update poses; the last update would go unmeasured).
    _, _, r_fin, ok_fin = correspond(rot, trans, gates[-1])
    n_fin = jnp.sum(ok_fin)
    rmse = jnp.sqrt(jnp.sum(ok_fin * r_fin * r_fin)
                    / jnp.maximum(n_fin, 1).astype(dtype))

    validb = jnp.asarray(valid, bool)
    rot = jnp.where(validb, rot, init_rotation)
    trans = jnp.where(validb, trans, init_translation)
    return IcpResult(
        rotation=rot,
        translation=trans,
        rmse=rmse,
        num_inliers=n_fin.astype(jnp.int32),
        converged=jnp.logical_and(validb,
                                  n_fin >= config.min_correspondences),
    )
