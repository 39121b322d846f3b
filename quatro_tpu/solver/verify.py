"""Registration verification by alignment overlap.

The reference has no acceptance test for a registration at all — its one
pair is hand-picked and the result is judged in rviz (reference:
README.md:126-136). At trajectory scale a false loop-closure edge is
catastrophic (it bends the whole pose graph), and the natural per-edge
confidence signal — the solver's final inlier count — is a poor gate:
Quatro is built to be correct from very few inliers ("a single
correspondence is enough"), so a low count does not mean a wrong pose,
and symmetric scenes can produce confidently-wrong poses with many
inliers.

The decisive signal is geometric: apply the estimated transform to the
source cloud and measure the fraction of its points with a target point
within a small radius. Measured on ray-cast fixtures (8-pose loop,
VLP-16): correct registrations score 0.68-0.81, wrong ones 0.05-0.14 —
cleanly separable at ~0.3-0.4.

TPU-native: one blocked (V_src, V_tgt) brute-force distance computation —
the same brute-force-beats-trees tradeoff as the feature matcher
(ops/matching.py), but difference-first on the VPU rather than a Gram
matmul (see the precision note on ``alignment_overlap``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from quatro_tpu.utils.se3 import rotate_points


@partial(jax.jit, static_argnames=("row_block",))
def alignment_overlap(src: jnp.ndarray, src_mask: jnp.ndarray,
                      tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                      rotation: jnp.ndarray, translation: jnp.ndarray,
                      radius: float | jnp.ndarray,
                      row_block: int = 2048) -> jnp.ndarray:
    """Fraction of valid source points within `radius` of a valid target
    point after applying (rotation, translation): scalar in [0, 1].

    src (N, 3), tgt (M, 3) with bool masks. Blocked over source rows so the
    (N, M) distance matrix never exceeds (row_block, M) — capacity-sized
    voxel clouds (8k x 8k) stay comfortably in VMEM-friendly tiles.

    Precision: distances are computed DIFFERENCE-FIRST per coordinate
    (three (row_block, M) planes on the VPU), not via the |a|^2+|b|^2-2ab
    Gram matmul: at 40-80 m lidar ranges the Gram identity's f32
    cancellation error reaches ~1e-2 m^2 even at HIGHEST matmul precision
    (measured on-chip: 16% of exactly-aligned far-field points failed a
    0.2 m gate), which would corrupt the overlap score near tight radii.
    The op runs once per edge, so VPU vs MXU throughput is irrelevant.
    """
    n = src.shape[0]
    pad = (-n) % row_block
    p = rotate_points(src, rotation) + translation
    p = jnp.pad(p, ((0, pad), (0, 0)))
    pm = jnp.pad(src_mask, (0, pad))
    r2 = jnp.asarray(radius, p.dtype) ** 2

    def block_hits(blk):
        bp, bm = blk
        dx = bp[:, 0:1] - tgt[None, :, 0]
        dy = bp[:, 1:2] - tgt[None, :, 1]
        dz = bp[:, 2:3] - tgt[None, :, 2]
        d2 = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(tgt_mask[None, :], d2, jnp.inf)
        return jnp.sum((jnp.min(d2, axis=1) <= r2) & bm)

    blocks = (p.reshape(-1, row_block, 3), pm.reshape(-1, row_block))
    hits = jnp.sum(jax.lax.map(block_hits, blocks))
    return hits / jnp.maximum(jnp.sum(src_mask), 1)


def arbitrate_hypotheses(sols, src: jnp.ndarray, src_mask: jnp.ndarray,
                         tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                         radius: float | jnp.ndarray,
                         max_src_points: int | None = 2048):
    """Pick the best of K solution hypotheses by geometric overlap.

    sols: a RegistrationSolution pytree with a leading K axis (from
    solver.quatro.register_hypotheses). Invalid hypotheses score -1.
    Returns (winning solution without the K axis, overlaps (K,)).

    max_src_points strided-subsamples the SOURCE side of the overlap
    check (the target stays full — thinning it would delete true nearest
    neighbors and bias every score down). The K overlap passes are pure
    arbitration: at 2048 samples the score's sampling error is ~1/sqrt(n)
    ~ 2%, far inside the measured correct-vs-wrong separation
    (0.68-0.81 vs 0.05-0.14), while the (N_src x N_tgt) distance work
    drops 4x per hypothesis. Source voxels are Morton-ordered
    (ops/voxel.py), so a stride is a spatially uniform thinning, not an
    axis-aligned slab. None = full clouds.
    """
    if max_src_points is not None and src.shape[0] > max_src_points:
        stride = -(-src.shape[0] // max_src_points)
        src = src[::stride]
        src_mask = src_mask[::stride]
    overlaps = jax.vmap(
        lambda r, t: alignment_overlap(src, src_mask, tgt, tgt_mask,
                                       r, t, radius)
    )(sols.rotation, sols.translation)
    score = jnp.where(sols.valid, overlaps, -1.0)
    best = jnp.argmax(score)
    return jax.tree.map(lambda x: x[best], sols), overlaps
