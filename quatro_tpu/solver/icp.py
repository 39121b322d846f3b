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
- update: left-multiplicative `exp_so3(dw) @ R`; fixed iteration count via
  `lax.scan` (shape-static, vmap/pjit-friendly). A `yaw_only` mode zeroes
  the roll/pitch components of the update, keeping the quasi-SO(3)
  contract of the Quatro solver under severe ground sparsity.
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
from quatro_tpu.utils.se3 import exp_so3


class IcpResult(NamedTuple):
    rotation: jax.Array       # (3, 3) refined rotation
    translation: jax.Array    # (3,) refined translation
    rmse: jax.Array           # () point-to-plane RMSE over final inliers
    num_inliers: jax.Array    # () int32 matched correspondences, last iter
    converged: jax.Array      # () bool — had >= min_correspondences at end


def _subsample(points: jnp.ndarray, mask: jnp.ndarray, k: int):
    """First k valid points, compacted to static shape (k, 3)."""
    n = points.shape[0]
    if k >= n:
        return points, mask
    iota = jnp.arange(n)
    order = jnp.argsort(jnp.where(mask, iota, n + iota))[:k]
    return points[order], mask[order]


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

    def step(carry, gate):
        rot, trans = carry
        p = src_s @ rot.T + trans                                 # (K, 3)
        d2 = pairwise_sq_dists(p, tgt_points)                     # (K, V)
        d2 = jnp.where(tgt_ok[None, :], d2, big)
        j = jnp.argmin(d2, axis=1)                                # (K,)
        d2min = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
        q = tgt_points[j]
        n = tgt_normals[j]
        ok = smask_s & (d2min <= gate * gate)
        okf = ok.astype(dtype)

        r = jnp.sum(n * (p - q), axis=-1)                         # (K,)
        absr = jnp.abs(r)
        huber = jnp.where(absr <= config.huber_delta, 1.0,
                          config.huber_delta / jnp.maximum(absr, 1e-12))
        w = okf * huber

        a = jnp.concatenate([jnp.cross(p, n), n], axis=-1)        # (K, 6)
        aw = a * w[:, None]
        h = a.T @ aw                                              # (6, 6)
        g = aw.T @ r                                              # (6,)
        lam = config.damping * (jnp.trace(h) + 1.0)
        delta = -jnp.linalg.solve(h + lam * jnp.eye(6, dtype=dtype), g)
        delta = delta * dof

        n_ok = jnp.sum(ok)
        enough = n_ok >= config.min_correspondences
        delta = jnp.where(enough, delta, jnp.zeros_like(delta))

        rot_new = exp_so3(delta[:3]) @ rot
        trans_new = trans + delta[3:]
        sq_err = jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1e-12)
        return (rot_new, trans_new), (sq_err, n_ok, enough)

    (rot, trans), (sq_errs, n_oks, enoughs) = jax.lax.scan(
        step, (init_rotation, init_translation), gates)

    validb = jnp.asarray(valid, bool)
    rot = jnp.where(validb, rot, init_rotation)
    trans = jnp.where(validb, trans, init_translation)
    return IcpResult(
        rotation=rot,
        translation=trans,
        rmse=jnp.sqrt(sq_errs[-1]),
        num_inliers=n_oks[-1].astype(jnp.int32),
        converged=jnp.logical_and(validb, enoughs[-1]),
    )
