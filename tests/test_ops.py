"""Unit tests for the feature front-end ops."""

import numpy as np
import pytest
import jax.numpy as jnp

from quatro_tpu.ops.voxel import voxel_downsample
from quatro_tpu.ops.neighbors import radius_neighbors
from quatro_tpu.ops.normals import estimate_normals, smallest_eigenvector_3x3
from quatro_tpu.ops.fpfh import compute_fpfh, compute_spfh, pair_features
from quatro_tpu.ops.matching import match_features


def test_voxel_downsample_centroids():
    # two clusters, one voxel each at leaf 1.0
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.2, 0.1], [0.2, 0.3, 0.4],
                    [5.1, 5.1, 5.1], [5.3, 5.2, 5.4]], np.float32)
    mask = np.ones(5, bool)
    out, omask = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask),
                                  1.0, capacity=8)
    out, omask = np.asarray(out), np.asarray(omask)
    assert omask.sum() == 2
    got = sorted(out[omask].tolist())
    # centroid error bound = the 10-bit fraction quantization (ops/voxel.py
    # packs corner fractions at 2^-10 leaf = ~1e-3 of the leaf, an order
    # under the documented ~1e-2-leaf budget); leaf is 1.0 here.
    np.testing.assert_allclose(got[0], pts[:3].mean(0), atol=1.5e-3)
    np.testing.assert_allclose(got[1], pts[3:].mean(0), atol=1.5e-3)


def test_voxel_downsample_respects_mask_and_capacity(rng):
    pts = rng.uniform(0, 100, (256, 3)).astype(np.float32)
    mask = rng.random(256) < 0.5
    out, omask = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask),
                                  0.5, capacity=64)
    assert np.asarray(omask).sum() <= 64
    # all output points must be near some input point (centroid of few)
    valid_in = pts[mask]
    d = np.linalg.norm(np.asarray(out)[np.asarray(omask)][:, None]
                       - valid_in[None], axis=-1)
    assert (d.min(axis=1) < 0.9).all()


def test_voxel_downsample_overflow_keeps_densest(rng):
    """Over capacity, the voxels with the most points must win — point
    count is viewpoint-stable, so both scans of a pair keep the same
    structure (key-order truncation kept a per-scan spatial slab)."""
    # 40 dense voxels (20 pts each) + 200 single-point voxels, capacity 64
    dense_centers = rng.uniform(0, 50, (40, 3)).astype(np.float32)
    dense = (dense_centers[:, None] +
             rng.uniform(-0.1, 0.1, (40, 20, 3))).reshape(-1, 3)
    sparse = rng.uniform(60, 200, (200, 3)).astype(np.float32)
    pts = np.concatenate([sparse[:100], dense, sparse[100:]]).astype(
        np.float32)  # interleave so order can't save us
    out, omask = voxel_downsample(jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), 0.5, capacity=64)
    kept = np.asarray(out)[np.asarray(omask)]
    d = np.linalg.norm(kept[:, None] - dense_centers[None], axis=-1).min(0)
    assert (d < 0.2).all(), "every dense voxel must survive truncation"


def test_radius_neighbors_against_bruteforce(rng):
    n, k, r = 128, 16, 1.0
    pts = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[::7] = False
    res = radius_neighbors(jnp.asarray(pts), jnp.asarray(mask), r, k,
                           tile=64)
    idx, valid = np.asarray(res.idx), np.asarray(res.valid)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    d[:, ~mask] = np.inf
    for i in range(0, n, 13):
        if not mask[i]:
            assert not valid[i].any()
            continue
        true_nbrs = set(np.where(d[i] <= r)[0].tolist())
        got = set(idx[i][valid[i]].tolist())
        if len(true_nbrs) <= k:
            assert got == true_nbrs
        else:
            assert got <= true_nbrs and len(got) == k


def test_smallest_eigenvector_matches_numpy(rng):
    mats = rng.normal(size=(50, 3, 3))
    mats = mats @ mats.transpose(0, 2, 1)  # SPD
    vec, val = smallest_eigenvector_3x3(jnp.asarray(mats, jnp.float32))
    vec, val = np.asarray(vec), np.asarray(val)
    for i in range(50):
        w, v = np.linalg.eigh(mats[i])
        assert abs(val[i] - w[0]) < 1e-3 * max(1, abs(w[0]))
        cos = abs(np.dot(vec[i], v[:, 0]))
        assert cos > 0.999, f"eigvec mismatch {cos}"


def test_normals_on_plane(rng):
    # points on z = 0.5x + const plane -> normal ~ (-0.5, 0, 1)/norm
    n = 256
    xy = rng.uniform(0, 10, (n, 2)).astype(np.float32)
    z = 0.5 * xy[:, 0] + 1.0
    pts = np.column_stack([xy, z]).astype(np.float32)
    mask = np.ones(n, bool)
    nbrs = radius_neighbors(jnp.asarray(pts), jnp.asarray(mask), 2.0, 24,
                            tile=64)
    res = estimate_normals(jnp.asarray(pts), nbrs)
    expected = np.array([-0.5, 0, 1.0]) / np.linalg.norm([-0.5, 0, 1.0])
    nrm = np.asarray(res.normals)
    cos = np.abs(nrm @ expected)
    assert (cos[np.asarray(res.valid)] > 0.99).all()
    # orientation: toward origin viewpoint -> n . (0 - p) >= 0
    dots = np.sum(nrm * (-pts), axis=1)
    assert (dots[np.asarray(res.valid)] >= -1e-5).all()


def test_pair_features_ranges(rng):
    p1 = rng.normal(size=(100, 3)).astype(np.float32)
    p2 = rng.normal(size=(100, 3)).astype(np.float32)
    n1 = rng.normal(size=(100, 3)).astype(np.float32)
    n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
    n2 = rng.normal(size=(100, 3)).astype(np.float32)
    n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
    def soa(a):  # pair_features takes (x, y, z) component tuples
        a = jnp.asarray(a)
        return (a[:, 0], a[:, 1], a[:, 2])
    f1, f2, f3, ok = pair_features(soa(p1), soa(n1), soa(p2), soa(n2))
    f1, f2, f3 = np.asarray(f1), np.asarray(f2), np.asarray(f3)
    ok = np.asarray(ok)
    assert (np.abs(f1[ok]) <= np.pi + 1e-5).all()
    assert (np.abs(f2[ok]) <= 1 + 1e-5).all()
    assert (np.abs(f3[ok]) <= 1 + 1e-5).all()


def test_fpfh_blocks_normalized(rng):
    n = 64
    pts = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    nbrs = radius_neighbors(jnp.asarray(pts), jnp.asarray(mask), 1.5, 16,
                            tile=64)
    nrm = estimate_normals(jnp.asarray(pts), nbrs)
    desc = np.asarray(compute_fpfh(jnp.asarray(pts), nrm.normals, nbrs))
    assert desc.shape == (n, 33)
    for s in range(0, 33, 11):
        np.testing.assert_allclose(desc[:, s:s + 11].sum(1), 100.0,
                                   atol=1e-2)


def test_fpfh_invariant_to_yaw_about_viewpoint(rng):
    """Descriptors are invariant to rotation about the viewpoint: the whole
    sensor-relative geometry (and thus normal orientation) rotates rigidly.
    (Full translation invariance does NOT hold for viewpoint-oriented
    normals — neither here nor in PCL; scan pairs are sensor-relative.)"""
    n = 128
    pts = rng.uniform(1, 4, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    theta = 0.8
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    pts2 = (pts @ rot.T).astype(np.float32)

    def desc_of(p):
        nbrs = radius_neighbors(jnp.asarray(p), jnp.asarray(mask), 1.2, 24,
                                tile=64)
        nrm = estimate_normals(jnp.asarray(p), nbrs)
        return np.asarray(compute_fpfh(jnp.asarray(p), nrm.normals, nbrs))

    d1, d2 = desc_of(pts), desc_of(pts2)
    err = np.linalg.norm(d1 - d2, axis=1)
    assert np.median(err) < 1.0, f"median descriptor drift {np.median(err)}"


def test_match_features_recovers_identity_pairs(rng):
    # identical clouds -> matcher should pair i <-> i for most points
    n = 128
    pts = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    nbrs = radius_neighbors(jnp.asarray(pts), jnp.asarray(mask), 1.5, 24,
                            tile=64)
    nrm = estimate_normals(jnp.asarray(pts), nbrs)
    desc = compute_fpfh(jnp.asarray(pts), nrm.normals, nbrs)
    corr = match_features(jnp.asarray(pts), jnp.asarray(pts), desc, desc,
                          jnp.asarray(mask), jnp.asarray(mask),
                          capacity=256)
    m = np.asarray(corr.mask)
    assert m.sum() > 0.5 * n
    same = (np.asarray(corr.src_idx) == np.asarray(corr.tgt_idx))[m]
    assert same.mean() > 0.95


def test_match_without_crosscheck_is_union_and_deduped(rng):
    """use_crosscheck=False must yield the one-directional union
    (feature_matcher.cc:116-144): a superset of the mutual-NN matches,
    with the doubly-listed mutual pairs deduplicated."""
    na, nb, d = 48, 64, 33
    src_d = rng.normal(size=(na, d)).astype(np.float32)
    tgt_d = rng.normal(size=(nb, d)).astype(np.float32)
    src_p = rng.normal(size=(na, 3)).astype(np.float32)
    tgt_p = rng.normal(size=(nb, 3)).astype(np.float32)
    ma, mb = np.ones(na, bool), np.ones(nb, bool)
    kw = dict(capacity=256, use_tuple_test=False)
    # crosscheck_min_matches=0 pins the REFERENCE semantics: random
    # descriptors yield few mutual pairs, which would otherwise trigger
    # the round-5 starvation fallback (union + second neighbors) and
    # make "strict" a non-subset of the 1st-NN union.
    strict = match_features(jnp.asarray(src_p), jnp.asarray(tgt_p),
                            jnp.asarray(src_d), jnp.asarray(tgt_d),
                            jnp.asarray(ma), jnp.asarray(mb),
                            use_crosscheck=True, crosscheck_min_matches=0,
                            **kw)
    loose = match_features(jnp.asarray(src_p), jnp.asarray(tgt_p),
                           jnp.asarray(src_d), jnp.asarray(tgt_d),
                           jnp.asarray(ma), jnp.asarray(mb),
                           use_crosscheck=False, **kw)

    def pairs(c):
        m = np.asarray(c.mask)
        return set(zip(np.asarray(c.src_idx)[m].tolist(),
                       np.asarray(c.tgt_idx)[m].tolist()))

    p_strict, p_loose = pairs(strict), pairs(loose)
    assert p_strict <= p_loose
    assert len(p_loose) > len(p_strict)  # random descs: few mutual pairs
    # dedup: every accepted pair appears exactly once
    m = np.asarray(loose.mask)
    listed = list(zip(np.asarray(loose.src_idx)[m].tolist(),
                      np.asarray(loose.tgt_idx)[m].tolist()))
    assert len(listed) == len(set(listed))


def test_match_capacity_overflow_keeps_best_descriptor_matches():
    """When survivors exceed capacity, the kept set must be the best by
    descriptor distance — not the head of the source-voxel ordering
    (densest-first), which would systematically drop far-field matches."""
    n, d, cap = 32, 33, 8
    # identical descriptor sets, i <-> i matches, with per-pair noise that
    # GROWS with the index: best matches are the low indices... but feed
    # the source in REVERSED order so positional truncation would keep the
    # worst ones.
    base = np.eye(n, d, dtype=np.float32) * 10
    noise = (np.arange(n, dtype=np.float32)[:, None] * 0.01)
    src_d = base + noise  # distance of pair i grows with i
    tgt_d = base
    pts = np.zeros((n, 3), np.float32)
    m = np.ones(n, bool)
    corr = match_features(jnp.asarray(pts), jnp.asarray(pts),
                          jnp.asarray(src_d), jnp.asarray(tgt_d),
                          jnp.asarray(m), jnp.asarray(m),
                          capacity=cap, use_tuple_test=False)
    got = np.sort(np.asarray(corr.src_idx)[np.asarray(corr.mask)])
    np.testing.assert_array_equal(got, np.arange(cap))


def test_blockwise_nn_matches_dense(rng):
    """The memory-blocked NN search must be bit-identical to the dense
    (Na, Nb) argmin it replaced (row blocks see ALL columns, so even
    tie-breaking matches)."""
    from quatro_tpu.ops.matching import _nearest_neighbors, \
        descriptor_distances
    na, nb, d = 300, 513, 33  # na NOT a multiple of the block size
    a = rng.normal(size=(na, d)).astype(np.float32)
    b = rng.normal(size=(nb, d)).astype(np.float32)
    ma = rng.random(na) > 0.1
    mb = rng.random(nb) > 0.1
    nn, d2 = _nearest_neighbors(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(ma), jnp.asarray(mb),
                                row_block=128)
    dense = np.asarray(descriptor_distances(jnp.asarray(a), jnp.asarray(b),
                                            jnp.asarray(ma),
                                            jnp.asarray(mb)))
    np.testing.assert_array_equal(np.asarray(nn), dense.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), dense.min(1), rtol=1e-6)


@pytest.mark.slow
def test_dense_features_match_kcapped():
    """dense_normals / dense_fpfh (the pipeline hot path) must agree with
    the K-capped NeighborLists formulation wherever K does not saturate:
    identical validity, normals to f32 tolerance, and identical FPFH given
    identical normals."""
    import numpy as np
    import jax.numpy as jnp
    from quatro_tpu.ops.neighbors import radius_neighbors
    from quatro_tpu.ops.normals import estimate_normals
    from quatro_tpu.ops.fpfh import compute_fpfh
    from quatro_tpu.ops.dense_features import dense_normals, dense_fpfh

    rng = np.random.default_rng(3)
    v = 1024
    pts = jnp.asarray(rng.uniform(-10, 10, (v, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random(v) > 0.1)
    rn, rf = 1.2, 1.8
    nbrs = radius_neighbors(pts, mask, rn, 128, tile=256)
    assert int(jnp.sum(nbrs.valid, 1).max()) < 128  # K unsaturated
    old_n = estimate_normals(pts, nbrs)
    new_n = dense_normals(pts, mask, rn, tile=256)
    nv = old_n.valid & mask
    assert bool(jnp.array_equal(nv, new_n.valid))
    d = np.abs(np.asarray(old_n.normals) - np.asarray(new_n.normals))
    assert d[np.asarray(nv)].max() < 5e-3

    nbrs_f = radius_neighbors(pts, mask, rf, 256, tile=256)
    old_d = compute_fpfh(pts, old_n.normals, nbrs_f, normal_valid=nv)
    new_d = dense_fpfh(pts, old_n.normals, nv, mask, rf, tile=256)
    dd = np.abs(np.asarray(old_d) - np.asarray(new_d))[np.asarray(nv)]
    np.testing.assert_allclose(dd.max(), 0.0, atol=2e-2)
