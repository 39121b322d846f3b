"""GNC-TLS rotation estimation: quasi-SO(3) (yaw-only) and full SO(3).

The reference alternates a weighted 2x2 SVD with a closed-form truncated
least-squares weight update inside a <=50-iteration loop
(reference: include/quatro.hpp:430-572, svdRot2d in include/teaser/utils.h:151-166).

TPU-native design: the weighted 2x2 orthogonal-Procrustes problem has a
closed form — the optimal proper rotation maximizing sum_i w_i y_i^T R x_i is

    theta* = atan2( sum_i w_i (x_i x y_i) , sum_i w_i (x_i . y_i) )

(equal to the SVD solution V U^T with determinant correction), so the whole
GNC loop is a ``lax.while_loop`` whose body is two masked reductions and a
vectorized weight update — no per-iteration linear algebra at all. The full
SO(3) variant (TEASER mode) keeps the weighted Kabsch solve as one batched
3x3 SVD per iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quatro_tpu.utils.se3 import rotate_points


class GncResult(NamedTuple):
    rotation: jax.Array        # (2,2) or (3,3)
    weights: jax.Array         # (N,) final TLS weights
    inlier_mask: jax.Array     # (N,) weights >= 0.4 (reference quatro.hpp:567-571)
    iterations: jax.Array      # () int32
    cost: jax.Array            # () f32 final cost


def yaw_procrustes(src_xy: jnp.ndarray, dst_xy: jnp.ndarray,
                   weights: jnp.ndarray) -> jnp.ndarray:
    """Closed-form weighted 2D rotation angle aligning R @ src -> dst.

    Closed form of teaser::utils::svdRot2d (include/teaser/utils.h:151-166).
    src_xy, dst_xy: (N, 2); weights: (N,).
    """
    dot = jnp.sum(weights * jnp.sum(src_xy * dst_xy, axis=-1))
    cross = jnp.sum(weights * (src_xy[:, 0] * dst_xy[:, 1]
                               - src_xy[:, 1] * dst_xy[:, 0]))
    return jnp.arctan2(cross, dot)


def rot2d(theta) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s], [s, c]], dtype=jnp.result_type(theta, jnp.float32))


def svd_rot3d(src: jnp.ndarray, dst: jnp.ndarray,
              weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted Kabsch: best proper rotation R with R @ src ~= dst.

    Port of the semantics of teaser::utils::svdRot
    (include/teaser/utils.h:123-149): H = X W Y^T, R = V U^T with det fix.
    """
    h = (src * weights[:, None]).T @ dst  # (3,3)
    u, _, vt = jnp.linalg.svd(h)
    v = vt.T
    det = jnp.linalg.det(u) * jnp.linalg.det(v)
    v = v.at[:, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    return v @ u.T


def _zeros_like_result(solve_rotation, src, dst, maskf, run: bool):
    """Zero-cost while_loop carry seed shaped like solve_rotation's output
    (via eval_shape). With run=True (loop body might never execute) the
    real solve is returned instead so the caller still gets a valid pose."""
    if run:
        return solve_rotation(src, dst, maskf)
    shape = jax.eval_shape(solve_rotation, src, dst, maskf)
    return jnp.zeros(shape.shape, shape.dtype)


def _gnc_tls(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray,
             noise_bound: float, gnc_factor: float, max_iterations: int,
             cost_threshold: float, solve_rotation, apply_rotation):
    """Shared GNC-TLS loop; faithful to the reference's operation order
    (include/quatro.hpp:485-558):

      per iteration: solve R from current weights -> residuals -> (iter 0:
      mu init, early break if noise-free) -> cost from OLD weights ->
      closed-form TLS weight update -> mu *= factor -> converge on cost diff.
    """
    dtype = src.dtype
    n = src.shape[0]
    maskf = mask.astype(dtype)

    noise_bound_sq = jnp.asarray(noise_bound, dtype) ** 2
    noise_bound_sq = jnp.where(noise_bound_sq < 1e-16, 1e-2, noise_bound_sq)

    def residuals_sq(rot_param):
        diff = dst - apply_rotation(rot_param, src)
        return jnp.sum(diff * diff, axis=-1) * maskf

    def cond(state):
        i, rot_param, weights, mu, prev_cost, cost, done = state
        return jnp.logical_and(i < max_iterations, jnp.logical_not(done))

    def body(state):
        i, rot_param, weights, mu, prev_cost, cost, done = state
        rot_param = solve_rotation(src, dst, weights * maskf)
        res_sq = residuals_sq(rot_param)

        # Iteration-0 mu initialization (reference quatro.hpp:493-504).
        max_res = jnp.max(res_sq)
        mu0 = 1.0 / (2.0 * max_res / noise_bound_sq - 1.0)
        degenerate = jnp.logical_and(i == 0, mu0 <= 0)
        mu = jnp.where(i == 0, mu0, mu)

        th1 = (mu + 1.0) / mu * noise_bound_sq
        th2 = mu / (mu + 1.0) * noise_bound_sq
        cost_new = jnp.sum(weights * res_sq)
        w_mid = jnp.sqrt(noise_bound_sq * mu * (mu + 1.0)
                         / jnp.maximum(res_sq, 1e-30)) - mu
        new_weights = jnp.where(res_sq >= th1, 0.0,
                                jnp.where(res_sq <= th2, 1.0, w_mid)) * maskf

        # On the degenerate (noise-free) break, keep the pre-update weights
        # exactly as the reference's `break` before the weight loop does —
        # but still report the actual cost, not the init-value inf.
        weights = jnp.where(degenerate, weights, new_weights)
        cost = cost_new
        cost_diff = jnp.abs(cost_new - prev_cost)
        converged = cost_diff < cost_threshold
        done = jnp.logical_or(degenerate, converged)
        mu = jnp.where(degenerate, mu, mu * gnc_factor)
        prev_cost = jnp.where(degenerate, prev_cost, cost_new)
        return i + 1, rot_param, weights, mu, prev_cost, cost, done

    # The first body iteration recomputes the solve from these same maskf
    # weights, so seeding the carry with a real solve is dead work XLA
    # cannot CSE across the loop boundary — a zero placeholder of the
    # right shape suffices (the body always runs: max_iterations >= 1).
    init_rot = _zeros_like_result(solve_rotation, src, dst, maskf,
                                  run=max_iterations < 1)
    init = (jnp.asarray(0, jnp.int32), init_rot, maskf,
            jnp.asarray(1.0, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(False))
    i, rot_param, weights, mu, prev_cost, cost, done = jax.lax.while_loop(
        cond, body, init)
    inliers = jnp.logical_and(weights >= 0.4, mask)
    return rot_param, weights, inliers, i, cost


def _fgr_gm(src, dst, mask, noise_bound, gnc_factor, max_iterations,
            cost_threshold, solve_rotation, apply_rotation):
    """Graduated Geman-McClure (the reference's FGR algorithm option,
    include/quatro.hpp:172-175,225-243): weights
    w_i = (mu e^2 / (r_i^2 + mu e^2))^2 with mu DIVIDED by gnc_factor per
    iteration (annealing from convex toward GM), stopping on cost
    convergence once mu has annealed to <= 1."""
    dtype = src.dtype
    maskf = mask.astype(dtype)
    eps_sq = jnp.maximum(jnp.asarray(noise_bound, dtype) ** 2, 1e-16)

    def cond(state):
        i, rot, weights, mu, cost, done = state
        return jnp.logical_and(i < max_iterations, jnp.logical_not(done))

    def body(state):
        i, rot, weights, mu, prev_cost, done = state
        rot = solve_rotation(src, dst, weights * maskf)
        diff = dst - apply_rotation(rot, src)
        res_sq = jnp.sum(diff * diff, axis=-1) * maskf
        # mu init: start convex enough to cover the worst residual
        mu = jnp.where(i == 0,
                       jnp.maximum(jnp.max(res_sq) / eps_sq, 1.0), mu)
        w = (mu * eps_sq) / (res_sq + mu * eps_sq)
        new_weights = (w * w) * maskf
        cost_new = jnp.sum(new_weights * res_sq)
        cost_diff = jnp.abs(cost_new - prev_cost)
        done = jnp.logical_and(mu <= 1.0, cost_diff < cost_threshold)
        mu = jnp.maximum(mu / gnc_factor, 1.0)
        return i + 1, rot, new_weights, mu, cost_new, done

    init_rot = _zeros_like_result(solve_rotation, src, dst, maskf,
                                  run=max_iterations < 1)
    init = (jnp.asarray(0, jnp.int32), init_rot, maskf,
            jnp.asarray(1.0, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False))
    i, rot, weights, mu, cost, done = jax.lax.while_loop(cond, body, init)
    inliers = jnp.logical_and(weights >= 0.4, mask)
    return rot, weights, inliers, i, cost


def gnc_rotation_2d(src_xy: jnp.ndarray, dst_xy: jnp.ndarray,
                    mask: jnp.ndarray, noise_bound: float,
                    gnc_factor: float = 1.4, max_iterations: int = 50,
                    cost_threshold: float = 0.00011,
                    algorithm: str = "GNC_TLS") -> GncResult:
    """Quasi-SO(3) GNC: yaw-only rotation on XY projections
    (reference: Quatro::solveForRotation2D, include/quatro.hpp:430-572).
    algorithm: "GNC_TLS" (reference default) or "FGR" (the enum's
    Geman-McClure option)."""

    loop = _gnc_tls if algorithm == "GNC_TLS" else _fgr_gm
    theta, weights, inliers, iters, cost = loop(
        src_xy, dst_xy, mask, noise_bound, gnc_factor, max_iterations,
        cost_threshold,
        solve_rotation=yaw_procrustes,
        apply_rotation=lambda th, x: rotate_points(x, rot2d(th)))
    return GncResult(rot2d(theta), weights, inliers, iters, cost)


def gnc_rotation_3d(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray,
                    noise_bound: float, gnc_factor: float = 1.4,
                    max_iterations: int = 50,
                    cost_threshold: float = 0.00011,
                    algorithm: str = "GNC_TLS") -> GncResult:
    """Full SO(3) GNC (TEASER mode; the reference reserves the hook via
    reg_name == "TEASER", include/quatro.hpp:394-411)."""

    loop = _gnc_tls if algorithm == "GNC_TLS" else _fgr_gm
    rot, weights, inliers, iters, cost = loop(
        src, dst, mask, noise_bound, gnc_factor, max_iterations,
        cost_threshold,
        solve_rotation=svd_rot3d,
        apply_rotation=lambda r, x: rotate_points(x, r))
    return GncResult(rot, weights, inliers, iters, cost)
