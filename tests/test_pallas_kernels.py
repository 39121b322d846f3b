"""Pallas kernel equivalence tests (interpret mode on CPU; the real TPU
lowering is exercised by bench/production runs)."""

import numpy as np
import jax.numpy as jnp

from quatro_tpu.ops.pallas_kernels import consistency_graph_pallas
from quatro_tpu.solver.scale import tim_consistency_graph


def test_consistency_kernel_matches_xla(rng):
    n = 256
    src = jnp.asarray(rng.uniform(0, 50, (n, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 50, (n, 3)), jnp.float32)
    mask = jnp.ones(n, bool)
    ref = np.asarray(tim_consistency_graph(src, tgt, mask, 0.3))
    pal = np.asarray(consistency_graph_pallas(src, tgt, 0.6,
                                              interpret=True))
    pal = pal & ~np.eye(n, dtype=bool)
    np.testing.assert_array_equal(pal, ref)


def test_consistency_kernel_on_real_pair(rng):
    from quatro_tpu.io.synthetic import make_correspondences
    src, tgt, _, _ = make_correspondences(seed=2, n_inliers=64,
                                          n_outliers=192)
    mask = jnp.ones(256, bool)
    ref = np.asarray(tim_consistency_graph(jnp.asarray(src),
                                           jnp.asarray(tgt), mask, 0.3))
    pal = np.asarray(consistency_graph_pallas(jnp.asarray(src),
                                              jnp.asarray(tgt), 0.6,
                                              interpret=True))
    pal = pal & ~np.eye(256, dtype=bool)
    np.testing.assert_array_equal(pal, ref)


# --- segment_matmul kernels (interpret mode; ADVICE r3 medium) -------------
# The production TPU branch of segment_sums/table_lookup never runs under
# the CPU test suite (the gate requires backend == 'tpu'), so these pin the
# KERNEL bodies against numpy add.at / fancy indexing via interpret=True.

def test_segment_sums_kernel_matches_numpy(rng):
    import jax
    from quatro_tpu.ops.segment_matmul import _T, segment_sums
    n, k, p_pad = 2 * _T, 5, 640
    ids = rng.integers(0, p_pad + 7, size=n).astype(np.int32)  # incl. OOR
    vals = rng.normal(size=(k, n)).astype(np.float32)
    ref = np.zeros((p_pad, k), np.float64)
    inr = ids < p_pad
    for c in range(k):
        np.add.at(ref[:, c], ids[inr], vals[c][inr].astype(np.float64))
    out = np.asarray(segment_sums(jnp.asarray(ids), jnp.asarray(vals),
                                  p_pad, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
    # vmapped call (the pipeline always runs under vmap over pairs)
    outv = np.asarray(jax.vmap(
        lambda i, v: segment_sums(i, v, p_pad, interpret=True))(
        jnp.stack([jnp.asarray(ids)] * 2),
        jnp.stack([jnp.asarray(vals)] * 2)))
    np.testing.assert_allclose(outv[0], ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(outv[1], ref, rtol=1e-5, atol=1e-4)


def test_cross_histogram_kernel_matches_numpy(rng):
    from quatro_tpu.ops.segment_matmul import _T, cross_histogram
    n, a_pad, b_pad = _T, 640, 128
    ia = rng.integers(0, a_pad + 9, size=n).astype(np.int32)   # incl. OOR
    ib = rng.integers(0, b_pad, size=n).astype(np.int32)
    w = rng.normal(size=(2, n)).astype(np.float32)
    ref = np.zeros((2, a_pad, b_pad))
    inr = ia < a_pad
    for k in range(2):
        np.add.at(ref[k], (ia[inr], ib[inr]), w[k][inr])
    out = np.asarray(cross_histogram(jnp.asarray(ia), jnp.asarray(ib),
                                     jnp.asarray(w), a_pad, b_pad,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_fit_iteration_and_classify_kernels_match_numpy(rng):
    from quatro_tpu.ops.segment_matmul import (_T, classify_points,
                                               fit_iteration_moments)
    n, p_pad, p_cnt = _T, 640, 600
    ids = rng.integers(0, p_cnt + 3, size=n).astype(np.int32)
    chan = rng.normal(size=(5, n)).astype(np.float32)
    tab = rng.normal(size=(p_pad, 5)).astype(np.float32)
    tab[p_cnt:] = 0.0
    vals = tab[np.minimum(ids, p_pad - 1)].T
    proj = vals[0] * chan[0] + vals[1] * chan[1] + vals[2] * chan[2]
    member = (ids < p_cnt) & (proj < vals[3])
    px, py, pz = chan[3], chan[4], chan[2]
    mom = np.stack([np.ones(n), px, py, pz, px * px, px * py, px * pz,
                    py * py, py * pz, pz * pz]) * member
    ref_m = np.zeros((p_pad, 10))
    for k in range(10):
        np.add.at(ref_m[:, k], ids, mom[k])
    out_m = np.asarray(fit_iteration_moments(
        jnp.asarray(ids), jnp.asarray(chan), jnp.asarray(tab), p_pad, p_cnt,
        interpret=True))
    np.testing.assert_allclose(out_m, ref_m, rtol=1e-4, atol=1e-3)

    tabf = tab.copy()
    tabf[:p_cnt, 4] = rng.integers(0, 16, p_cnt)
    valsf = tabf[np.minimum(ids, p_pad - 1)].T
    projf = valsf[0] * chan[0] + valsf[1] * chan[1] + valsf[2] * chan[2]
    fl = (valsf[4] + 0.5).astype(np.int32)
    valid = ids < p_cnt
    live = valid & ((fl & 8) > 0)
    isg = projf < valsf[3]
    g = live & ((fl & 1) > 0) & isg
    ng = live & ~g
    rev = live & ((fl & 2) > 0) & isg
    rej = live & ((fl & 4) > 0) & isg
    ref_c = g * 1 + ng * 2 + rev * 4 + rej * 8
    out_c = np.asarray(classify_points(jnp.asarray(ids), jnp.asarray(chan),
                                       jnp.asarray(tabf), p_pad, p_cnt,
                                       interpret=True))
    np.testing.assert_array_equal(out_c, ref_c)


def test_table_lookup_kernel_matches_numpy(rng):
    import jax
    from quatro_tpu.ops.segment_matmul import _T, table_lookup
    n, k, p_pad = _T, 4, 640
    ids = rng.integers(0, p_pad + 5, size=n).astype(np.int32)  # incl. OOR
    tab = rng.normal(size=(p_pad, k)).astype(np.float32)
    ref = np.where((ids < p_pad)[None, :], tab[np.minimum(ids, p_pad - 1)].T,
                   0.0)
    out = np.asarray(table_lookup(jnp.asarray(ids), jnp.asarray(tab),
                                  interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    outv = np.asarray(jax.vmap(
        lambda i, t: table_lookup(i, t, interpret=True))(
        jnp.stack([jnp.asarray(ids)] * 2), jnp.stack([jnp.asarray(tab)] * 2)))
    np.testing.assert_allclose(outv[1], ref, rtol=1e-6, atol=1e-6)
