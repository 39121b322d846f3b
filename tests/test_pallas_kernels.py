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
