"""Descriptor matching: mutual-NN + cross-check + tuple test.

Replaces ``teaser::Matcher`` (reference: src/teaser_utils/feature_matcher.cc:
77-265). The reference builds two FLANN kd-trees over the 33-D descriptors,
does one-directional NN with lazy reciprocal confirmation, a cross check,
then a randomized tuple (length-ratio) test seeded with srand(time(NULL)).

TPU-native design:

* the 33-D NN search is a dense (Na, Nb) squared-distance matrix — one MXU
  matmul — and the initial-matching + cross-check combination reduces to
  mutual nearest neighbors;
* the tuple test keeps the reference's statistics (ncorr*100 random
  triples, keep pairs appearing in any triple whose three side-length
  ratios lie within [tuple_scale, 1/tuple_scale]) but draws from a
  counter-based PRNG with a fixed seed — deterministic and replayable;
* output is a fixed-capacity compacted correspondence set + mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Correspondences(NamedTuple):
    src_idx: jax.Array   # (C,) int32 into source keypoints
    tgt_idx: jax.Array   # (C,) int32 into target keypoints
    mask: jax.Array      # (C,) bool
    src_xyz: jax.Array   # (C, 3) gathered source keypoints
    tgt_xyz: jax.Array   # (C, 3) gathered target keypoints


def descriptor_distances(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                         mask_a: jnp.ndarray, mask_b: jnp.ndarray):
    """(Na, Nb) squared L2 distances between descriptor sets, masked +inf."""
    from quatro_tpu.ops.neighbors import pairwise_sq_dists
    dtype = desc_a.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    d2 = pairwise_sq_dists(desc_a, desc_b)
    return jnp.where(mask_a[:, None] & mask_b[None, :], d2, big)


def _nearest_neighbors(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                       mask_a: jnp.ndarray, mask_b: jnp.ndarray,
                       row_block: int = 1024):
    """Per-row nearest neighbor of A in B: (nn index (Na,), nn d2 (Na,)).

    On TPU this dispatches to the fused Pallas kernel
    (ops/pallas_frontend.py::nearest_neighbors_pallas): the column
    descriptor set stays VMEM-resident across row tiles, so HBM sees only
    descriptors in / indices out (~4 MB instead of ~0.5 GB of distance
    tiles per pair). The XLA path blocks over rows of A so only a
    (row_block, Nb) distance tile is ever live — the full (Na, Nb) matrix
    is 256 MB at 8k x 8k f32, and keeping B of them alive under vmap is
    what capped the batched pipeline at B=16 on a v5e (B=32 spilled HBM
    and ran ~1000x slower, measured). Invalid rows get index 0 / +max."""
    from quatro_tpu.ops.pallas_frontend import (nearest_neighbors_pallas,
                                                use_pallas_frontend_default)
    nb = desc_b.shape[0]
    if (use_pallas_frontend_default() and desc_a.shape[0] % 256 == 0
            and (nb <= 2048 or nb % 2048 == 0)):
        return nearest_neighbors_pallas(desc_a, desc_b, mask_a, mask_b)
    from quatro_tpu.ops.neighbors import pairwise_sq_dists
    dtype = desc_a.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    na = desc_a.shape[0]
    pad = (-na) % row_block
    da = jnp.pad(desc_a, ((0, pad), (0, 0)))
    ma = jnp.pad(mask_a, (0, pad))
    sq_b = jnp.sum(desc_b * desc_b, axis=-1)

    def block(blk):
        d, m = blk
        d2 = pairwise_sq_dists(d, desc_b, sq_b=sq_b)
        d2 = jnp.where(m[:, None] & mask_b[None, :], d2, big)
        j = jnp.argmin(d2, axis=1)
        return j, jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]

    nn, d2min = jax.lax.map(block, (da.reshape(-1, row_block, da.shape[1]),
                                    ma.reshape(-1, row_block)))
    return nn.reshape(-1)[:na], d2min.reshape(-1)[:na]


def _nearest_neighbors_2(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                         mask_a: jnp.ndarray, mask_b: jnp.ndarray,
                         row_block: int = 1024):
    """Top-2 neighbors of A in B: (i1, d1, i2, d2), each (Na,).

    The second neighbor feeds the matcher's starvation-fallback union
    only (recall on degenerate-descriptor pairs — see _nn2_kernel);
    mutual-NN semantics always use the first."""
    from quatro_tpu.ops.pallas_frontend import (nearest_neighbors2_pallas,
                                                use_pallas_frontend_default)
    nb = desc_b.shape[0]
    if (use_pallas_frontend_default() and desc_a.shape[0] % 256 == 0
            and (nb <= 2048 or nb % 2048 == 0)):
        return nearest_neighbors2_pallas(desc_a, desc_b, mask_a, mask_b)
    from quatro_tpu.ops.neighbors import pairwise_sq_dists
    dtype = desc_a.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    na = desc_a.shape[0]
    pad = (-na) % row_block
    da = jnp.pad(desc_a, ((0, pad), (0, 0)))
    ma = jnp.pad(mask_a, (0, pad))
    sq_b = jnp.sum(desc_b * desc_b, axis=-1)

    def block(blk):
        d, m = blk
        d2 = pairwise_sq_dists(d, desc_b, sq_b=sq_b)
        d2 = jnp.where(m[:, None] & mask_b[None, :], d2, big)
        neg2, idx2 = jax.lax.top_k(-d2, 2)
        return idx2[:, 0], -neg2[:, 0], idx2[:, 1], -neg2[:, 1]

    i1, d1, i2, d2 = jax.lax.map(
        block, (da.reshape(-1, row_block, da.shape[1]),
                ma.reshape(-1, row_block)))
    return (i1.reshape(-1)[:na], d1.reshape(-1)[:na],
            i2.reshape(-1)[:na], d2.reshape(-1)[:na])


def tuple_test_keep(cs: tuple, ct: tuple, cand_pos: jnp.ndarray,
                    ncorr: jnp.ndarray, tuple_scale: float = 0.95,
                    trials_per_corr: int = 100, seed: int = 0):
    """Shift-structured tuple (length-ratio) test.

    reference: feature_matcher.cc:187-247 — random triples of candidate
    pairs, all three length-ratio gates must pass; passing triples mark
    their three pairs as kept. Re-designed TPU-native: instead of gathering
    ncorr*100 random index triples (3M gathered indices ~ 25 ms of
    tile-DMAs per pair, measured), triples are SHIFT-STRUCTURED — for
    `trials_per_corr` pseudo-random shift pairs (s1, s2) drawn host-side
    from `seed`, trial i tests candidates (i, i+s1 mod n, i+s2 mod n) via
    jnp.roll of the candidate coordinate columns. Every pair participates
    in exactly 3*trials_per_corr triples (the reference's expected count),
    the draw is deterministic, and the whole test is rolls + VPU math — no
    gathers, no scatters. The statistical delta vs i.i.d. triples is
    quantified in tests/test_matching_stats.py.

    cs/ct: coordinate component tuples (3 x (n_cand,)) of the compacted
    candidates; cand_pos: (n_cand,) bool validity; ncorr: live count.

    The trial loop is a lax.scan with unroll=8: one device dispatch per 8
    trials instead of 100 tiny sequential iteration bodies. (A fully
    trace-time-unrolled version with static-int shifts was tried in round
    5 and rejected: the ~4800-op graph sent XLA:CPU compile time through
    the roof — the test suite compiles this path on every run.)
    """
    import numpy as _np
    n_cand = cand_pos.shape[0]
    host_rng = _np.random.default_rng(seed)
    shifts = _np.unique(
        host_rng.integers(1, max(n_cand - 1, 2),
                          size=(4 * trials_per_corr, 2)), axis=0)
    shifts = shifts[shifts[:, 0] != shifts[:, 1]][:trials_per_corr]
    shifts = jnp.asarray(shifts, jnp.int32)  # (T, 2)
    iota_c = jnp.arange(n_cand, dtype=jnp.int32)

    def lengths(p, q):
        return jnp.sqrt(sum((p[c] - q[c]) ** 2 for c in range(3)))

    def trial(keep_acc, s):
        s1, s2 = s[0], s[1]
        r1 = tuple(jnp.roll(c, -s1) for c in cs)
        r2 = tuple(jnp.roll(c, -s2) for c in cs)
        t1 = tuple(jnp.roll(c, -s1) for c in ct)
        t2 = tuple(jnp.roll(c, -s2) for c in ct)
        li = (lengths(cs, r1), lengths(r1, r2), lengths(r2, cs))
        lj = (lengths(ct, t1), lengths(t1, t2), lengths(t2, ct))
        geo = jnp.ones((n_cand,), bool)
        for a, b in zip(li, lj):
            geo &= (a * tuple_scale < b) & (b < a / tuple_scale)
        m1 = (iota_c + s1) % n_cand < ncorr
        m2 = (iota_c + s2) % n_cand < ncorr
        ok = geo & cand_pos & m1 & m2
        hit = ok | jnp.roll(ok, s1) | jnp.roll(ok, s2)
        return keep_acc | hit, None

    tuple_keep, _ = jax.lax.scan(trial, jnp.zeros((n_cand,), bool), shifts,
                                 unroll=8)
    return tuple_keep & cand_pos


@partial(jax.jit, static_argnames=("capacity", "use_crosscheck",
                                   "use_tuple_test", "trials_per_corr",
                                   "seed", "tuple_min_keep",
                                   "crosscheck_min_matches"))
def match_features(src_xyz: jnp.ndarray, tgt_xyz: jnp.ndarray,
                   src_desc: jnp.ndarray, tgt_desc: jnp.ndarray,
                   src_mask: jnp.ndarray, tgt_mask: jnp.ndarray,
                   capacity: int = 1024, use_crosscheck: bool = True,
                   use_tuple_test: bool = True,
                   tuple_scale: float = 0.95, trials_per_corr: int = 100,
                   seed: int = 0, tuple_min_keep: int = 8,
                   crosscheck_min_matches: int = 64) -> Correspondences:
    """Full matcher: NN candidates -> tuple test -> compacted output.

    Semantics follow Matcher::calculateCorrespondences
    (reference: fpfh_manager.hpp:126-127 invokes it with absolute_scale=T,
    crosscheck=T, tuple_test=T). With crosscheck the candidate set is the
    mutual nearest neighbors (initial matching + cross check collapse to
    that); without it, it is the reference's one-directional union — every
    src keypoint with its NN target plus every tgt keypoint with its NN
    source, deduplicated (feature_matcher.cc:116-144).

    When more matches survive than `capacity`, the BEST `capacity` by
    descriptor distance are kept — an explicit quality policy rather than
    inheriting the source-voxel ordering (which is densest-voxel-first and
    would silently drop far-field matches, shrinking the solver's
    geometric baseline).
    """
    na = src_desc.shape[0]
    nb = tgt_desc.shape[0]
    ia = jnp.arange(na)
    ib = jnp.arange(nb)

    if use_crosscheck and crosscheck_min_matches > 0:
        nn_ab, d2_ab, nn_ab2, d2_ab2 = _nearest_neighbors_2(
            src_desc, tgt_desc, src_mask, tgt_mask)
        nn_ba, d2_ba, nn_ba2, d2_ba2 = _nearest_neighbors_2(
            tgt_desc, src_desc, tgt_mask, src_mask)
    else:
        nn_ab, d2_ab = _nearest_neighbors(src_desc, tgt_desc,
                                          src_mask, tgt_mask)  # (Na,)
        nn_ba, d2_ba = _nearest_neighbors(tgt_desc, src_desc,
                                          tgt_mask, src_mask)  # (Nb,)
    mutual_a = (nn_ba[nn_ab] == ia) & src_mask & tgt_mask[nn_ab]
    mutual_b = (nn_ab[nn_ba] == ib) & tgt_mask & src_mask[nn_ba]
    flag_a_union = src_mask & tgt_mask[nn_ab]
    flag_b_union = tgt_mask & src_mask[nn_ba] & ~mutual_b  # dedup mutuals

    if use_crosscheck and crosscheck_min_matches > 0:
        # Robustness addition over the reference: on hard pairs mutual-NN
        # can STARVE (measured eval seed 18: 18 mutual matches, ONE of
        # them GT-consistent — no downstream mechanism can recover a pose
        # from that). When fewer than crosscheck_min_matches mutual pairs
        # survive, fall back to the one-directional union (the reference's
        # crosscheck=false candidate set) EXTENDED with each side's
        # SECOND nearest neighbors — on-chip failure dissection found the
        # true match demoted to 2nd-NN by FPFH bin-edge noise on exactly
        # these pairs. The tuple test and the solver's clique stage are
        # the real outlier filters.
        n_mutual = jnp.sum(mutual_a)
        use_union = n_mutual < crosscheck_min_matches
        flag_a2 = src_mask & tgt_mask[nn_ab2]
        flag_b2 = tgt_mask & src_mask[nn_ba2]
        cand_src0 = jnp.concatenate([ia, nn_ba, ia, nn_ba2])
        cand_tgt0 = jnp.concatenate([nn_ab, ib, nn_ab2, ib])
        zeros_u = jnp.zeros((na + nb,), bool)
        cand_flag = jnp.where(
            use_union,
            jnp.concatenate([flag_a_union, flag_b_union, flag_a2,
                             flag_b2]),
            jnp.concatenate([mutual_a, jnp.zeros((nb,), bool), zeros_u]))
        cand_q0 = jnp.concatenate([d2_ab, d2_ba, d2_ab2, d2_ba2])
    elif use_crosscheck:
        cand_src0, cand_tgt0, cand_flag = ia, nn_ab, mutual_a
        cand_q0 = d2_ab
    else:
        # One-directional union; a mutual pair appears on both sides, so
        # drop its tgt-side copy.
        cand_src0 = jnp.concatenate([ia, nn_ba])
        cand_tgt0 = jnp.concatenate([nn_ab, ib])
        cand_flag = jnp.concatenate([flag_a_union, flag_b_union])
        cand_q0 = jnp.concatenate([d2_ab, d2_ba])

    n_cand = cand_src0.shape[0]
    assert max(na, nb) <= (1 << 15), "candidate packing supports 32k kps"
    packed_st0 = (cand_src0.astype(jnp.int32) << 15) \
        + cand_tgt0.astype(jnp.int32)

    # ONE quality sort up front: candidates ordered best-descriptor-
    # distance-first (bit-cast; d2 >= 0 so the f32 bit pattern is
    # order-preserving as int32), invalid pushed to +inf; num_keys=2 pins
    # equal-quality ties to the packed pair id for determinism. Replaces
    # round 4's validity-compaction sort + separate final quality sort,
    # both over the full candidate axis.
    inf_bits = jnp.iinfo(jnp.int32).max
    qbits0 = jax.lax.bitcast_convert_type(
        jnp.maximum(cand_q0, 0.0).astype(jnp.float32), jnp.int32)
    qkey0 = jnp.where(cand_flag, qbits0, inf_bits)
    _, packed_st = jax.lax.sort((qkey0, packed_st0), num_keys=2)
    ncorr = jnp.sum(cand_flag).astype(jnp.int32)

    # The tuple test + final compaction run on a STATIC quality-ordered
    # prefix: a candidate past max(2*capacity, 2048) could only matter
    # when >2048 mutual-NN matches survive AND >capacity of the better
    # ones fail the tuple test — the output keeps the best `capacity` by
    # quality regardless. A 4x shorter candidate axis makes the 100-trial
    # tuple test and the compaction sort 4x cheaper.
    tt = min(n_cand, max(2 * capacity, 2048))
    packed_tt = packed_st[:tt]
    ic_t = jnp.arange(tt, dtype=jnp.int32)
    ncorr_t = jnp.minimum(ncorr, tt)
    cand_pos = ic_t < ncorr_t
    cand_src = packed_tt >> 15
    cand_tgt = packed_tt & ((1 << 15) - 1)

    keep = cand_pos
    if use_tuple_test:
        # one (3, tt) gather per side instead of three 1-D ones
        cs3 = jnp.take(src_xyz.T, cand_src, axis=1)
        ct3 = jnp.take(tgt_xyz.T, cand_tgt, axis=1)
        cs = tuple(cs3[c] for c in range(3))
        ct = tuple(ct3[c] for c in range(3))
        tuple_keep = tuple_test_keep(cs, ct, cand_pos, ncorr_t,
                                     tuple_scale=tuple_scale,
                                     trials_per_corr=trials_per_corr,
                                     seed=seed)
        # Robustness addition over the reference: when the tuple test
        # collapses (low-overlap pairs leave too few consistent triples,
        # where the reference proceeds with ~0 correspondences and aborts,
        # quatro.hpp:809-813), fall back to the NN candidates — the
        # solver's own clique stage is a stronger filter than no data.
        keep = jnp.where(jnp.sum(tuple_keep) >= tuple_min_keep,
                         tuple_keep, cand_pos)

    # Final compaction into the fixed capacity: kept pairs first. The
    # prefix is already quality-ordered, so compacting on POSITION keeps
    # best-first order and capacity overflow still drops the WORST
    # matches instead of a spatially biased tail.
    poskey = jnp.where(keep, ic_t, tt + ic_t)
    _, packed_sel = jax.lax.sort((poskey, packed_tt), num_keys=1)
    kcount = jnp.sum(keep).astype(jnp.int32)
    sel = (packed_sel[:capacity] if tt >= capacity
           else jnp.pad(packed_sel, (0, capacity - tt)))
    out_mask = jnp.arange(capacity) < jnp.minimum(kcount, capacity)
    s_idx = jnp.where(out_mask, sel >> 15, 0).astype(jnp.int32)
    t_idx = jnp.where(out_mask, sel & ((1 << 15) - 1), 0).astype(jnp.int32)
    s_xyz = jnp.where(out_mask[:, None], src_xyz[s_idx], 0.0)
    t_xyz = jnp.where(out_mask[:, None], tgt_xyz[t_idx], 0.0)
    return Correspondences(s_idx, t_idx, out_mask, s_xyz, t_xyz)
