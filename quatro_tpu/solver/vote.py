"""Clique-independent pose hypotheses by (yaw, translation) voting.

Why this exists: the clique path's only hypothesis generator is clique
SIZE — ``register_hypotheses`` solves the K largest mutually-distinct
cliques of the consistency graph. Planar aliasing (building facades,
fences, repeated bays) can bury the CORRECT consensus set below the top
K: measured level-world eval pairs failed identically at K=4 and K=8
because their correct clique was not among the top eight
(RESULTS.md round 4). More hypotheses of the same kind cannot fix that;
an INDEPENDENT generator can. This is beyond the reference, whose single
PMC clique has no recovery path at all (include/quatro.hpp:791-813).

The independent signal is a two-stage Hough-style vote, all static-shape
and O(N*M) elementwise + small sorts:

1. **Yaw vote.** Every scale-consistent edge (i, j) of the graph implies
   a yaw: the angle between the XY projections of the two TIMs
   (src_i - src_j) and (tgt_i - tgt_j). Edges against M top-degree
   anchor vertices vote into a circular histogram, weighted by baseline
   length (longer TIMs carry more angular information). One Pallas
   segment-sum accumulates (weight, weight*sin, weight*cos) per bin so
   the winning bin refines to a weighted circular mean without a second
   pass. Planar aliasing typically leaves yaw EXACT and corrupts only
   translation (measured: the wide-baseline failure in RESULTS.md has
   exact yaw, 3.2 m translation error), so the top yaw bin is a reliable
   anchor even when the clique is wrong.

2. **Translation vote.** Given the vote yaw, every correspondence i
   implies a translation t_i = tgt_i - scale * R(yaw) @ src_i. These are
   quantized on TWO half-offset 3-D grids (a single grid splits a mode
   straddling a bin edge: a measured 11-inlier GT mode fragmented into
   4+3+2+2 votes), ranked by occupancy, and the top bins are re-collected
   into support masks |t_i - mean_bin|_inf <= refine radius. Masks are
   deduplicated with the same distinctness rule as the clique hypotheses
   (solver/clique.py::top_distinct_cliques).

The returned masks enter the SAME ``_solve_from_inliers`` polish as the
clique hypotheses (GNC-TLS rotation + COTE translation on the support
set) and the same geometric-overlap arbitration (solver/verify.py), so a
junk vote mode costs one losing hypothesis, never a wrong pose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from quatro_tpu.solver.clique import top_distinct_cliques
from quatro_tpu.utils.se3 import rotate_points, yaw_to_rotation


def yaw_vote(src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
             adj: jnp.ndarray, num_anchors: int = 64,
             num_bins: int = 256, min_baseline: float = 1.0,
             max_weight_baseline: float = 10.0, num_modes: int = 1):
    """Modal yaw(s) implied by the consistency graph's edges.

    Returns a scalar (radians) for num_modes == 1, else a (num_modes,)
    array — the circular-mean-refined top modes, each subsequent mode
    taken outside a +/-2-bin exclusion zone of the previous ones (a
    dominant aliased structure can outvote the true yaw; measured n=300
    failure: the correct 9-clique's yaw lost the histogram to a
    6.5-degree-off structure).

    src, tgt: (N, 3) matched correspondences; mask: (N,); adj: (N, N)
    symmetric bool consistency adjacency (solver/scale.py). Edges are
    sampled against `num_anchors` top-degree vertices — the anchor rows
    are contiguous row gathers of the symmetric adjacency, never strided
    column gathers.
    """
    dtype = src.dtype
    n = src.shape[0]
    adj_m = adj & mask[None, :] & mask[:, None]
    deg = jnp.sum(adj_m, axis=1)
    _, anchor_idx = jax.lax.top_k(jnp.where(mask, deg, -1), num_anchors)

    a_src = src[anchor_idx, :2]                     # (M, 2) tiny gathers
    a_tgt = tgt[anchor_idx, :2]
    adj_rows = adj_m[anchor_idx]                    # (M, N) row gathers

    v0 = src[None, :, 0] - a_src[:, 0:1]            # (M, N)
    v1 = src[None, :, 1] - a_src[:, 1:2]
    w0 = tgt[None, :, 0] - a_tgt[:, 0:1]
    w1 = tgt[None, :, 1] - a_tgt[:, 1:2]
    cross = v0 * w1 - v1 * w0
    dot = v0 * w0 + v1 * w1
    ang = jnp.arctan2(cross, dot)                   # (M, N) in [-pi, pi]
    blen = jnp.sqrt(v0 * v0 + v1 * v1)
    wgt = jnp.where(adj_rows & (blen > min_baseline),
                    jnp.minimum(blen, max_weight_baseline), 0.0)

    two_pi = 2.0 * jnp.pi
    bins = jnp.clip((ang + jnp.pi) * (num_bins / two_pi), 0,
                    num_bins - 1).astype(jnp.int32)
    ids = jnp.where(wgt > 0, bins, num_bins).reshape(-1)

    # sin/cos from the already-computed cross/dot — no extra trig.
    norm = jnp.maximum(jnp.sqrt(cross * cross + dot * dot), 1e-12)
    vals = jnp.stack([wgt, wgt * cross / norm, wgt * dot / norm]
                     ).reshape(3, -1).astype(dtype)

    mn = ids.shape[0]
    if mn % 8192 == 0:
        from quatro_tpu.ops.segment_matmul import segment_sums
        hist = segment_sums(ids, vals, num_bins)    # (B, 3)
    else:  # rare shapes: small materialized one-hot is fine at M*N scale
        oh = (ids[:, None] == jnp.arange(num_bins)[None, :]
              ).astype(jnp.bfloat16)
        hist = jnp.einsum("nb,kn->bk", oh, vals,
                          precision=jax.lax.Precision.HIGHEST)

    votes = hist[:, 0]
    # circular +/-1 neighborhood so a mode straddling a bin edge still wins
    smooth = votes + jnp.roll(votes, 1) + jnp.roll(votes, -1)

    def refine(b):
        window = (hist[b] + hist[(b + 1) % num_bins]
                  + hist[(b - 1) % num_bins])
        return jnp.arctan2(window[1], window[2])    # weighted circular mean

    if num_modes == 1:
        return refine(jnp.argmax(smooth))
    modes = []
    s = smooth
    bins_iota = jnp.arange(num_bins)
    for _ in range(num_modes):
        b = jnp.argmax(s)
        modes.append(refine(b))
        d = jnp.abs((bins_iota - b + num_bins // 2) % num_bins
                    - num_bins // 2)
        s = jnp.where(d <= 2, -1.0, s)              # exclusion zone
    return jnp.stack(modes)


# Translation-vote grid: 10 bits per axis around the origin.
_QBITS = 10
_QHALF = 1 << (_QBITS - 1)


def translation_vote_masks(src: jnp.ndarray, tgt: jnp.ndarray,
                           mask: jnp.ndarray, yaw: jnp.ndarray,
                           scale: jnp.ndarray, num_hyps: int,
                           bin_m: float, refine_scale: float = 1.5,
                           min_votes: int = 2):
    """Top `num_hyps` distinct translation modes at the given yaw.

    Returns ((num_hyps, N) bool support masks, (num_hyps,) f32 recollected
    sizes). A mode is a bin of the quantized per-correspondence
    translations t_i = tgt_i - scale * R(yaw) src_i, voted on two
    half-offset grids, re-collected with an inf-norm radius of
    refine_scale * bin_m around the bin mean, and deduplicated by mask
    intersection. Slots beyond the distinct modes found carry size 0.
    """
    dtype = src.dtype
    n = src.shape[0]
    rot = yaw_to_rotation(yaw).astype(dtype)
    t = tgt - scale * rotate_points(src, rot)       # (N, 3)
    inv_bin = jnp.asarray(1.0 / bin_m, dtype)

    def grid_keys(offset):
        q = jnp.clip(jnp.floor(t * inv_bin + offset).astype(jnp.int32)
                     + _QHALF, 0, (1 << _QBITS) - 1)
        return (q[:, 0] << (2 * _QBITS)) + (q[:, 1] << _QBITS) + q[:, 2]

    sentinel = jnp.iinfo(jnp.int32).max
    key = jnp.concatenate([
        jnp.where(mask, grid_keys(0.0), sentinel),
        jnp.where(mask, grid_keys(0.5) + (1 << (3 * _QBITS)), sentinel)])
    tx = jnp.concatenate([t[:, 0]] * 2)
    ty = jnp.concatenate([t[:, 1]] * 2)
    tz = jnp.concatenate([t[:, 2]] * 2)
    key_s, tx_s, ty_s, tz_s = jax.lax.sort((key, tx, ty, tz), num_keys=1)

    m2 = 2 * n
    # The occupancy rank-key below packs (count, position) into 12+12
    # bits; a correspondence capacity beyond 2048 would silently clamp
    # positions and corrupt which bins rank as modes (same hazard class
    # as projection.py's pixel-key packing — assert, don't corrupt).
    assert m2 <= (1 << 12), (
        f"translation vote supports up to 2048 correspondences "
        f"(got {n}); widen the rank-key packing to go higher")
    pos = jnp.arange(m2, dtype=jnp.int32)
    valid_b = key_s != sentinel
    is_new = jnp.concatenate([jnp.ones(1, bool),
                              key_s[1:] != key_s[:-1]]) & valid_b
    start_pos = jnp.where(is_new, pos, m2)
    next_start = jax.lax.cummin(
        jnp.where(jnp.concatenate([is_new[1:], jnp.ones(1, bool)]),
                  pos + 1, m2), reverse=True)
    run_len = jnp.where(is_new, next_start - start_pos, 0)

    # rank bins by occupancy (desc), position tiebreak — small 2N sort
    cand = max(2 * num_hyps + 2, num_hyps)
    rank_key = jnp.where(
        is_new & (run_len >= min_votes),
        ((jnp.asarray((1 << 12) - 1, jnp.int32)
          - jnp.minimum(run_len, (1 << 12) - 1)) << 12)
        + jnp.minimum(pos, (1 << 12) - 1),
        sentinel)
    (rank_s,) = jax.lax.sort((rank_key,), num_keys=1)
    starts = jnp.where(rank_s[:cand] != sentinel,
                       rank_s[:cand] & ((1 << 12) - 1), 0)
    got = rank_s[:cand] != sentinel
    counts = jnp.where(got, jnp.take(run_len, starts), 0)

    cs3 = jnp.cumsum(jnp.stack([tx_s, ty_s, tz_s]), axis=1)
    ends = starts + counts
    hi3 = jnp.take(cs3, jnp.clip(ends - 1, 0, m2 - 1), axis=1)
    lo3 = jnp.where(starts[None, :] > 0,
                    jnp.take(cs3, jnp.maximum(starts - 1, 0), axis=1), 0.0)
    means = ((hi3 - lo3) / jnp.maximum(counts, 1)[None, :]).T   # (cand, 3)

    r = jnp.asarray(refine_scale * bin_m, dtype)
    close = jnp.max(jnp.abs(t[None, :, :] - means[:, None, :]),
                    axis=-1) <= r                    # (cand, N)
    cand_masks = close & mask[None, :] & got[:, None]
    masks, sizes = top_distinct_cliques(cand_masks, num_hyps)
    sizes = jnp.where(sizes >= min_votes, sizes, 0.0)
    return masks, sizes


@partial(jax.jit, static_argnames=("num_hyps", "num_anchors", "num_bins",
                                   "num_yaw_modes"))
def vote_hypotheses(src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
                    adj: jnp.ndarray, scale: jnp.ndarray, num_hyps: int,
                    bin_m: float, num_anchors: int = 64,
                    num_bins: int = 256, num_yaw_modes: int = 1):
    """(num_hyps, N) vote-based support masks + (num_hyps,) sizes.

    With num_yaw_modes > 1, translation modes are voted at each of the
    top yaw modes; candidate masks from all modes compete in one
    distinctness-deduplicated ranking for the num_hyps slots.
    """
    if num_yaw_modes == 1:
        yaw = yaw_vote(src, tgt, mask, adj, num_anchors=num_anchors,
                       num_bins=num_bins)
        return translation_vote_masks(src, tgt, mask, yaw, scale, num_hyps,
                                      bin_m)
    yaws = yaw_vote(src, tgt, mask, adj, num_anchors=num_anchors,
                    num_bins=num_bins, num_modes=num_yaw_modes)
    all_masks = []
    for m_i in range(num_yaw_modes):
        masks, _ = translation_vote_masks(src, tgt, mask, yaws[m_i], scale,
                                          num_hyps, bin_m)
        all_masks.append(masks)
    cand = jnp.concatenate(all_masks)
    masks, sizes = top_distinct_cliques(cand, num_hyps)
    sizes = jnp.where(sizes >= 2, sizes, 0.0)
    return masks, sizes
