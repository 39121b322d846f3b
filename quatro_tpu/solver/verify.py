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

TPU-native: one (V_src, V_tgt) distance computation via an MXU matmul
(|a|^2 + |b|^2 - 2ab) — the same brute-force-beats-trees tradeoff as the
feature matcher (ops/matching.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


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
    """
    n = src.shape[0]
    pad = (-n) % row_block
    p = src @ rotation.T + translation
    p = jnp.pad(p, ((0, pad), (0, 0)))
    pm = jnp.pad(src_mask, (0, pad))
    tgt_sq = jnp.sum(tgt * tgt, axis=1)
    r2 = jnp.asarray(radius, p.dtype) ** 2

    def block_hits(blk):
        bp, bm = blk
        d2 = (jnp.sum(bp * bp, axis=1)[:, None] + tgt_sq[None, :]
              - 2.0 * bp @ tgt.T)
        d2 = jnp.where(tgt_mask[None, :], d2, jnp.inf)
        return jnp.sum((jnp.min(d2, axis=1) <= r2) & bm)

    blocks = (p.reshape(-1, row_block, 3), pm.reshape(-1, row_block))
    hits = jnp.sum(jax.lax.map(block_hits, blocks))
    return hits / jnp.maximum(jnp.sum(src_mask), 1)
