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
