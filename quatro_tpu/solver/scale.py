"""Scale solve + translation-invariant-measurement (TIM) consistency graph.

The reference materializes all N(N-1)/2 pairwise TIM vectors with an OpenMP
loop (reference: include/quatro.hpp:307-344), runs the scale-inlier test on
them (include/quatro.hpp:355-386), then rebuilds an adjacency list graph edge
by edge (include/quatro.hpp:784-789).

TPU-native design: with the pipeline's fixed scale = 1 (the reference hard
codes ``*scale = 1`` regardless of ``estimate_scaling``), the two-sided
length-ratio test

    |d_tgt/d_src - 1| <= beta/d_src  AND  |d_src/d_tgt - 1| <= beta/d_tgt

algebraically reduces to the single symmetric predicate

    | d_tgt(i,j) - d_src(i,j) | <= beta,      beta = 2*noise_bound*sqrt(cbar2)

so the whole TIM + scale-mask + graph-build chain collapses into ONE dense
(N, N) boolean adjacency computed from two pairwise-distance matrices — a
pair of MXU matmuls, no O(N^2) gather loop, no edge lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_distances(points: jnp.ndarray) -> jnp.ndarray:
    """Dense Euclidean distance matrix for (N, 3) points -> (N, N).

    Exact broadcast-difference form: the Gram-matrix matmul identity loses
    ~1e-3..1e-2 absolute accuracy to cancellation (worse with the TPU's
    bf16 matmul passes), which would blur the +-beta consistency test
    downstream. At solver scale (N <= 2k) the (N, N, 3) intermediate is a
    few MB of VPU work and numerically exact in f32.
    """
    diff = points[:, None, :] - points[None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def tim_consistency_graph(src: jnp.ndarray, tgt: jnp.ndarray,
                          mask: jnp.ndarray, noise_bound: float,
                          cbar2: float = 1.0,
                          use_pallas=None) -> jnp.ndarray:
    """Boolean (N, N) adjacency of scale-consistent correspondence pairs.

    Equivalent to the reference's scale_inliers_mask_ over TIMs
    (include/quatro.hpp:361-385) followed by Graph::addEdge population
    (include/quatro.hpp:784-789), specialized to scale = 1.

    src, tgt: (N, 3) matched correspondence points; mask: (N,) validity.
    """
    n = src.shape[0]
    if use_pallas is None:  # auto: fused kernel on TPU when tiles align
        from quatro_tpu.ops.pallas_kernels import use_pallas_default
        use_pallas = use_pallas_default()
    if use_pallas and n % 256 == 0:
        from quatro_tpu.ops.pallas_kernels import consistency_graph_pallas
        beta_f = 2.0 * float(noise_bound) * float(cbar2) ** 0.5
        consistent = consistency_graph_pallas(src, tgt, beta_f)
    else:
        beta = 2.0 * noise_bound * jnp.sqrt(jnp.asarray(cbar2, src.dtype))
        d_src = pairwise_distances(src)
        d_tgt = pairwise_distances(tgt)
        consistent = jnp.abs(d_tgt - d_src) <= beta
    pair_valid = mask[:, None] & mask[None, :]
    off_diag = ~jnp.eye(n, dtype=bool)
    return consistent & pair_valid & off_diag


def solve_scale(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """The reference's scale solver: identity scale (include/quatro.hpp:361)."""
    return jnp.asarray(1.0, src.dtype)


def solve_scale_tls(src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
                    noise_bound: float, cbar2: float = 1.0):
    """TLS consensus scale over pairwise length ratios.

    Extension beyond the reference (whose ``estimate_scaling`` flag is
    inert — include/quatro.hpp:361 hardcodes scale 1): the TEASER++-style
    scale stage. Each correspondence pair (i, j) measures
    s_ij = d_tgt / d_src with first-order uncertainty
    alpha_ij = beta / d_src (propagating the +-beta length noise of the
    scale-inlier test), and the scalar consensus estimate reuses COTE's
    sorted-endpoint sweep.

    Returns (scale (), inlier adjacency (N, N) bool).
    """
    from quatro_tpu.solver.translation import _estimate_axis

    dtype = src.dtype
    n = src.shape[0]
    beta = 2.0 * noise_bound * jnp.sqrt(jnp.asarray(cbar2, dtype))
    d_src = pairwise_distances(src)
    d_tgt = pairwise_distances(tgt)
    pair_valid = (mask[:, None] & mask[None, :]
                  & jnp.triu(jnp.ones((n, n), bool), 1) & (d_src > 1e-6))

    ratios = (d_tgt / jnp.maximum(d_src, 1e-6)).reshape(-1)
    alphas = (beta / jnp.maximum(d_src, 1e-6)).reshape(-1)
    flat_valid = pair_valid.reshape(-1)
    scale, _ = _estimate_axis(jnp.where(flat_valid, ratios, 0.0),
                              jnp.where(flat_valid, alphas, 1.0),
                              flat_valid, use_median=False)

    inliers = (jnp.abs(d_tgt / jnp.maximum(d_src, 1e-6) - scale)
               <= beta / jnp.maximum(d_src, 1e-6))
    inliers = inliers & mask[:, None] & mask[None, :] \
        & ~jnp.eye(n, dtype=bool)
    return scale, inliers
