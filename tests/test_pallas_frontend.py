"""Fused Pallas front-end equivalence vs the XLA dense formulation
(interpret mode on CPU; real TPU lowering exercised by bench runs).

dense_features is itself pinned against the K-capped reference-shaped path
and hand-computed cases (test_ops.py), so agreement here transitively pins
the kernels to the PCL semantics of src/teaser_utils/fpfh.cc:44-75.
"""

import numpy as np
import jax.numpy as jnp

from quatro_tpu.ops.dense_features import dense_fpfh, dense_normals
from quatro_tpu.ops.pallas_frontend import frontend_fpfh, frontend_normals


import pytest as _pytest


@_pytest.fixture()
def rng():
    # LOCAL fixed seed: the session-scoped conftest rng advances
    # across tests, so using it makes results depend on suite
    # composition; these differential tests must be standalone-
    # deterministic.
    return np.random.default_rng(777)


V = 512          # one multiple of both kernel tile sizes (256, 512)
RADIUS = 1.2


def _cloud(rng, v=V):
    pts = jnp.asarray(rng.uniform(0, 12, (v, 3)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=v) > 0.15)
    return pts, mask


def test_frontend_normals_matches_dense(rng):
    pts, mask = _cloud(rng)
    ref = dense_normals(pts, mask, RADIUS, tile=256)
    pal = frontend_normals(pts, mask, RADIUS, interpret=True)
    np.testing.assert_array_equal(np.asarray(pal.valid),
                                  np.asarray(ref.valid))
    # Accumulation order differs (per-chunk vs whole-row sums): tolerance,
    # not bit equality. Normals may flip sign only via the viewpoint rule,
    # which both paths apply identically.
    np.testing.assert_allclose(np.asarray(pal.normals),
                               np.asarray(ref.normals), atol=5e-3)
    np.testing.assert_allclose(np.asarray(pal.curvature),
                               np.asarray(ref.curvature), atol=1e-3)


def test_frontend_fpfh_matches_dense(rng):
    pts, mask = _cloud(rng)
    nrm = dense_normals(pts, mask, RADIUS, tile=256)
    ref = dense_fpfh(pts, nrm.normals, nrm.valid, mask, RADIUS, tile=256)
    pal = frontend_fpfh(pts, nrm.normals, nrm.valid, mask, RADIUS,
                        interpret=True)
    # Descriptor blocks are normalized to sum 100. The kernel bins f1 by
    # geometric sector tests (Mosaic has no atan lowering) — identical
    # semantics to the dense path's atan2+floor except that pairs within
    # f32 rounding of a bin EDGE may land one bin over, moving ~100/cnt of
    # mass between adjacent bins (large for low-pair-count descriptors).
    # Bound the overall mass moved and the FRACTION of affected points,
    # not the per-bin max.
    diff = np.abs(np.asarray(pal) - np.asarray(ref))
    assert diff.mean() < 0.02, f"mean descriptor diff {diff.mean()}"
    affected = (diff.max(axis=1) > 1.0).mean()
    assert affected < 0.02, f"bin-edge flips touched {affected:.1%} of points"


def test_nn_kernel_matches_xla(rng):
    from quatro_tpu.ops.matching import _nearest_neighbors
    from quatro_tpu.ops.pallas_frontend import nearest_neighbors_pallas
    na, nb, d = 512, 300, 33
    da = jnp.asarray(rng.uniform(0, 100, (na, d)), jnp.float32)
    db = jnp.asarray(rng.uniform(0, 100, (nb, d)), jnp.float32)
    ma = jnp.asarray(rng.uniform(size=na) > 0.1)
    mb = jnp.asarray(rng.uniform(size=nb) > 0.1)
    ref_i, ref_d = _nearest_neighbors(da, db, ma, mb)
    pal_i, pal_d = nearest_neighbors_pallas(da, db, ma, mb, interpret=True)
    np.testing.assert_array_equal(np.asarray(pal_i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(pal_d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-3)


def test_frontend_fpfh_respects_masks(rng):
    pts, mask = _cloud(rng)
    nrm = frontend_normals(pts, mask, RADIUS, interpret=True)
    desc = frontend_fpfh(pts, nrm.normals, nrm.valid, mask, RADIUS,
                         interpret=True)
    # Masked-out or invalid-normal rows see no valid pairs: descriptor 0
    # before block normalization -> each block normalizes a zero vector.
    dead = ~(np.asarray(mask) & np.asarray(nrm.valid))
    assert np.all(np.abs(np.asarray(desc)[dead]) < 1e-6)


def test_frontend_prefix_mask_skipping(rng):
    """Packed (prefix) masks trigger the tile-skip path; results must be
    identical to the dense formulation regardless."""
    pts = jnp.asarray(rng.uniform(0, 12, (V, 3)), jnp.float32)
    mask = jnp.arange(V) < 300          # valid prefix only
    pts = jnp.where(mask[:, None], pts, 0.0)
    ref_n = dense_normals(pts, mask, RADIUS, tile=256)
    pal_n = frontend_normals(pts, mask, RADIUS, interpret=True)
    np.testing.assert_array_equal(np.asarray(pal_n.valid),
                                  np.asarray(ref_n.valid))
    np.testing.assert_allclose(np.asarray(pal_n.normals),
                               np.asarray(ref_n.normals), atol=5e-3)
    ref = dense_fpfh(pts, ref_n.normals, ref_n.valid, mask, RADIUS,
                     tile=256)
    pal = frontend_fpfh(pts, ref_n.normals, ref_n.valid, mask, RADIUS,
                        interpret=True)
    diff = np.abs(np.asarray(pal) - np.asarray(ref))
    assert diff.mean() < 0.02
    assert (diff.max(axis=1) > 1.0).mean() < 0.02


def test_nn_kernel_multichunk_ties(rng):
    """Nb > 2048 exercises the running-argmin across column chunks; planted
    exact duplicates verify first-minimum tie semantics across chunks."""
    from quatro_tpu.ops.matching import _nearest_neighbors
    from quatro_tpu.ops.pallas_frontend import nearest_neighbors_pallas
    na, nb, d = 256, 4096, 33
    da = jnp.asarray(rng.uniform(0, 100, (na, d)), jnp.float32)
    db = jnp.asarray(rng.uniform(0, 100, (nb, d)), jnp.float32)
    # plant: column 3000 duplicates column 100; rows 0..49 equal db[100]
    db = db.at[3000].set(db[100])
    da = da.at[:50].set(db[100])
    ma = jnp.ones(na, bool)
    mb = jnp.ones(nb, bool)
    ref_i, ref_d = _nearest_neighbors(da, db, ma, mb)
    pal_i, pal_d = nearest_neighbors_pallas(da, db, ma, mb, interpret=True)
    np.testing.assert_array_equal(np.asarray(pal_i), np.asarray(ref_i))
    assert np.all(np.asarray(pal_i)[:50] == 100)   # earlier chunk wins tie
    np.testing.assert_allclose(np.asarray(pal_d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-3)


def test_nn2_kernel_matches_xla_topk(rng):
    """The 2-NN kernel must agree with a dense top-2 on both slots,
    including across column chunks (nb > 2048)."""
    from quatro_tpu.ops.pallas_frontend import nearest_neighbors2_pallas
    na, nb, d = 256, 4096, 33
    da = jnp.asarray(rng.uniform(0, 100, (na, d)), jnp.float32)
    db = jnp.asarray(rng.uniform(0, 100, (nb, d)), jnp.float32)
    ma = jnp.asarray(rng.uniform(size=na) > 0.1)
    mb = jnp.asarray(rng.uniform(size=nb) > 0.1)
    i1, d1, i2, d2 = nearest_neighbors2_pallas(da, db, ma, mb,
                                               interpret=True)
    dd = ((np.asarray(da)[:, None, :] - np.asarray(db)[None, :, :]) ** 2
          ).sum(-1)
    dd[:, ~np.asarray(mb)] = np.inf
    order = np.argsort(dd, axis=1)
    ref_i1, ref_i2 = order[:, 0], order[:, 1]
    ref_d1 = np.take_along_axis(dd, ref_i1[:, None], 1)[:, 0]
    ref_d2 = np.take_along_axis(dd, ref_i2[:, None], 1)[:, 0]
    m = np.asarray(ma)
    np.testing.assert_allclose(np.asarray(d1)[m], ref_d1[m],
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(d2)[m], ref_d2[m],
                               rtol=1e-4, atol=1e-2)
    # indices must match wherever the top-2 distances are unambiguous
    clear = m & (ref_d2 - ref_d1 > 1e-3)
    np.testing.assert_array_equal(np.asarray(i1)[clear], ref_i1[clear])


def test_matcher_mutual_pairs_rank_first(rng):
    """The extended candidate set must keep every mutual pair STRICTLY
    before union-only fillers: the strict-crosscheck output (the
    reference's semantics, crosscheck_min_matches=0) must be a PREFIX of
    the extended output; starved pairs must gain candidates."""
    from quatro_tpu.ops.matching import match_features
    na = 512
    pa = jnp.asarray(rng.uniform(-20, 20, (na, 3)), jnp.float32)
    pb = pa + 0.1
    base = rng.uniform(0, 100, (na, 33))
    da = jnp.asarray(base, jnp.float32)
    db = jnp.asarray(base + rng.normal(0, 0.5, (na, 33)), jnp.float32)
    m = jnp.ones((na,), bool)
    ext = match_features(pa, pb, da, db, m, m, capacity=256,
                         use_tuple_test=False)
    strict = match_features(pa, pb, da, db, m, m, capacity=256,
                            use_tuple_test=False,
                            crosscheck_min_matches=0)
    n_strict = int(strict.mask.sum())
    n_ext = int(ext.mask.sum())
    assert n_ext >= n_strict
    np.testing.assert_array_equal(np.asarray(ext.src_idx)[:n_strict],
                                  np.asarray(strict.src_idx)[:n_strict])
    np.testing.assert_array_equal(np.asarray(ext.tgt_idx)[:n_strict],
                                  np.asarray(strict.tgt_idx)[:n_strict])
    # starved: only 40 valid targets -> union + seconds dominate
    mb = jnp.arange(na) < 40
    starved = match_features(pa, pb, da, db, m, mb, capacity=256,
                             use_tuple_test=False)
    strict_s = match_features(pa, pb, da, db, m, mb, capacity=256,
                              use_tuple_test=False,
                              crosscheck_min_matches=0)
    assert int(starved.mask.sum()) > int(strict_s.mask.sum())
