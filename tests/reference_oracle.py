"""Test-only NumPy oracle: a float64 transliteration of the reference
solver's semantics, written directly from /root/reference/include/quatro.hpp
(cited per function below) for differential testing against the JAX solver.

This module is NOT part of the framework — it exists so that
tests/test_reference_oracle.py can assert, on hundreds of random
instances, that the TPU-native solver computes the same mathematics the
reference C++ does (VERDICT round 1, "Next round" item 2). It therefore
follows the reference's OPERATION ORDER faithfully (including its
noise-bound rescale and median-mode quirks), not this repo's vectorized
designs.

Deliberate divergences from upstream (documented where they apply):
- the IMU-prior path is excluded (the repo intentionally fixes the
  reference's double-application of RyRx; see solver/quatro.py:163-168),
  so every oracle run uses the identity prior;
- `estimate()`'s n_card == 1 median reads candidates[-1] in C++
  (undefined behavior); the oracle returns candidates[0] as the repo does;
- NaN costs at zero-cardinality sweep events are treated as +inf, which
  is what Eigen's minCoeff `<`-scan effectively does with a finite first
  element.
"""

from __future__ import annotations

import numpy as np


def svd_rot2d(x: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """teaser::utils::svdRot2d (include/teaser/utils.h:151-166):
    H = X diag(W) Y^T, SVD, R = V U^T with det fix on V's last column."""
    h = (x * w) @ y.T  # (2,N)*(N,) scales columns; H = X diag(W) Y^T
    u, _, vt = np.linalg.svd(h)
    v = vt.T
    if np.linalg.det(u) * np.linalg.det(v) < 0:
        v[:, 1] *= -1
    return v @ u.T


def scale_inlier_mask(src_tims: np.ndarray, dst_tims: np.ndarray,
                      noise_bound: float, cbar2: float) -> np.ndarray:
    """Quatro::solveForScale inlier test (include/quatro.hpp:355-386):
    scale fixed to 1; TIM pair (columns) is an inlier iff the forward AND
    reverse length-ratio deviations are within beta / length."""
    v1 = np.sqrt(np.sum(src_tims ** 2, axis=0))
    v2 = np.sqrt(np.sum(dst_tims ** 2, axis=0))
    beta = 2.0 * noise_bound * np.sqrt(cbar2)
    with np.errstate(divide="ignore", invalid="ignore"):
        fwd = np.abs(v2 / v1 - 1.0) <= beta / v1
        rev = np.abs(v1 / v2 - 1.0) <= beta / v2
    return fwd & rev


def compute_tims(v: np.ndarray):
    """Quatro::computeTIMs (include/quatro.hpp:307-344): all i<j pairwise
    difference vectors v[:,j]-v[:,i] in segment order, plus the (i,j) map."""
    n = v.shape[1]
    cols, imap = [], []
    for i in range(n - 1):
        cols.append(v[:, i + 1:] - v[:, i:i + 1])
        imap.extend((i, j) for j in range(i + 1, n))
    return np.concatenate(cols, axis=1), np.asarray(imap, np.int64).T


def consistency_adjacency(src: np.ndarray, tgt: np.ndarray,
                          noise_bound: float, cbar2: float) -> np.ndarray:
    """The driver's graph build (include/quatro.hpp:777-789): TIMs -> scale
    inlier mask -> undirected edges, returned as a dense (N, N) bool."""
    n = src.shape[0]
    src_tims, imap = compute_tims(src.T.astype(np.float64))
    dst_tims, _ = compute_tims(tgt.T.astype(np.float64))
    mask = scale_inlier_mask(src_tims, dst_tims, noise_bound, cbar2)
    adj = np.zeros((n, n), bool)
    adj[imap[0, mask], imap[1, mask]] = True
    return adj | adj.T


def gnc_rotation_2d(src_2d: np.ndarray, dst_2d: np.ndarray,
                    rot_noise_bound: float, gnc_factor: float,
                    max_iterations: int, cost_threshold: float):
    """Quatro::solveForRotation2D (include/quatro.hpp:430-572), literal:
    per iteration solve svdRot2d from current weights -> residuals ->
    (iter 0: mu init + degenerate break) -> cost from OLD weights ->
    closed-form TLS weight update -> mu *= factor -> cost-diff stop.

    src_2d, dst_2d: (2, N) float64. Returns (R 2x2, weights, inliers,
    iterations, cost)."""
    n = src_2d.shape[1]
    mu = 1.0
    prev_cost = np.inf
    cost = np.inf
    noise_bound_sq = rot_noise_bound ** 2
    if noise_bound_sq < 1e-16:
        noise_bound_sq = 1e-2
    weights = np.ones(n)
    rotation = np.eye(2)
    iters = 0
    for i in range(max_iterations):
        iters = i + 1
        rotation = svd_rot2d(src_2d, dst_2d, weights)
        diffs = (dst_2d - rotation @ src_2d) ** 2
        residuals_sq = diffs.sum(axis=0)
        if i == 0:
            max_residual = residuals_sq.max()
            mu = 1.0 / (2.0 * max_residual / noise_bound_sq - 1.0)
            if mu <= 0:
                # degenerate: noise-free; break BEFORE the weight update
                # (reference :499-503) with the all-ones weights intact
                cost = float(np.sum(weights * residuals_sq))
                break
        th1 = (mu + 1.0) / mu * noise_bound_sq
        th2 = mu / (mu + 1.0) * noise_bound_sq
        cost = float(np.sum(weights * residuals_sq))
        new_w = np.sqrt(noise_bound_sq * mu * (mu + 1.0)
                        / np.maximum(residuals_sq, 1e-300)) - mu
        weights = np.where(residuals_sq >= th1, 0.0,
                           np.where(residuals_sq <= th2, 1.0, new_w))
        cost_diff = abs(cost - prev_cost)
        mu *= gnc_factor
        prev_cost = cost
        if cost_diff < cost_threshold:
            break
    inliers = weights >= 0.4
    return rotation, weights, inliers, iters, cost


def cote_estimate(x: np.ndarray, ranges: np.ndarray,
                  use_median: bool):
    """Quatro::estimate (include/quatro.hpp:618-747), literal sweep:
    sort the 2N interval endpoints, run the six accumulators event by
    event, argmin the cost, then (median mode) take the reference's
    even-parity median of the last n_card event sources."""
    n = x.shape[0]
    events = []  # (value, signed 1-based index) as the reference's h
    for i in range(n):
        events.append((x[i] - ranges[i], i + 1))
        events.append((x[i] + ranges[i], -(i + 1)))
    events.sort(key=lambda p: p[0])

    weights = 1.0 / ranges ** 2
    x_hat = np.zeros(2 * n)
    x_cost = np.zeros(2 * n)
    cardinality = np.zeros(2 * n, np.int64)
    ranges_inverse_sum = float(ranges.sum())
    dot_x_weights = 0.0
    dot_weights_consensus = 0.0
    consensus = 0
    sum_xi = 0.0
    sum_xi_sq = 0.0
    for i, (_, signed) in enumerate(events):
        idx = abs(signed) - 1
        eps = 1 if signed > 0 else -1
        consensus += eps
        dot_weights_consensus += eps * weights[idx]
        dot_x_weights += eps * weights[idx] * x[idx]
        ranges_inverse_sum -= eps * ranges[idx]
        sum_xi += eps * x[idx]
        sum_xi_sq += eps * x[idx] ** 2
        cardinality[i] = consensus
        with np.errstate(divide="ignore", invalid="ignore"):
            x_hat[i] = dot_x_weights / dot_weights_consensus
            residual = (consensus * x_hat[i] ** 2 + sum_xi_sq
                        - 2 * sum_xi * x_hat[i])
        x_cost[i] = residual + ranges_inverse_sum

    x_cost = np.where(np.isnan(x_cost), np.inf, x_cost)
    min_idx = int(np.argmin(x_cost))
    estimate = x_hat[min_idx]
    if use_median:
        n_card = cardinality[min_idx]
        if n_card > 0:
            cand = sorted(x[abs(events[min_idx - j][1]) - 1]
                          for j in range(n_card))
            if n_card == 1:
                estimate = cand[0]  # C++ reads candidates[-1]: UB
            else:
                estimate = 0.5 * (cand[len(cand) // 2 - 1]
                                  + cand[len(cand) // 2])
    inliers = np.abs(x - estimate) <= ranges
    return estimate, inliers


def solve_translation(src: np.ndarray, dst: np.ndarray,
                      cote_noise_bound: float, cbar2: float,
                      use_median: bool):
    """Quatro::solveForTranslation (include/quatro.hpp:585-615): per-axis
    estimate() on dst - src; final inlier iff inlier on all three axes.
    src must already be scale * R @ src (driver premultiplies, :905-911).
    cote_noise_bound is the reference's constructor member `noise_bound_`
    (0.3, never updated from params — include/quatro.hpp:115,601)."""
    raw = (dst - src).T  # (3, N)
    beta = cote_noise_bound * np.sqrt(cbar2)
    ranges = np.full(raw.shape[1], beta)
    t = np.zeros(3)
    inliers = np.ones(raw.shape[1], bool)
    for axis in range(3):
        t[axis], inl = cote_estimate(raw[axis], ranges, use_median)
        inliers &= inl
    return t, inliers


def register_with_clique(src: np.ndarray, tgt: np.ndarray,
                         clique: np.ndarray, noise_bound: float = 0.3,
                         cbar2: float = 1.0,
                         rotation_gnc_factor: float = 1.4,
                         rotation_max_iterations: int = 100,
                         rotation_cost_threshold: float = 0.00011,
                         cote_mode: str = "median",
                         cote_noise_bound: float | None = None,
                         using_rot_inliers_when_estimating_cote: bool = False):
    """The driver downstream of the clique stage
    (include/quatro.hpp:817-936), with the clique injected: chain TIMs
    over the sorted clique -> noise-bound rescale (*2/scale with scale=1,
    :846-852) -> GNC yaw -> rotation-inlier chaining (:860-874) -> COTE
    on the configured point set -> [R|t] + final inliers.

    Returns dict(valid, rotation (3,3), translation (3,),
    final_inliers (sorted original indices), rotation_inliers,
    gnc_iterations)."""
    src = src.astype(np.float64)
    tgt = tgt.astype(np.float64)
    clique = np.sort(np.asarray(clique, np.int64))
    m = clique.shape[0]
    if m <= 1:  # reference aborts (include/quatro.hpp:809-813)
        return dict(valid=False, rotation=np.eye(3), translation=np.zeros(3),
                    final_inliers=np.zeros(0, np.int64),
                    rotation_inliers=np.zeros(0, np.int64), gnc_iterations=0)

    scale = 1.0  # include/quatro.hpp:361
    leaf = np.roll(clique, -1)
    pruned_src = (src[leaf] - src[clique]).T  # (3, m)
    pruned_dst = (tgt[leaf] - tgt[clique]).T / scale

    # noise-bound rescale (:846-852) feeding the GNC's static capture (:469)
    rot_noise_bound = noise_bound * (2.0 / scale)
    rot2, weights, rot_inl_mask, iters, _ = gnc_rotation_2d(
        pruned_src[:2], pruned_dst[:2], rot_noise_bound,
        rotation_gnc_factor, rotation_max_iterations,
        rotation_cost_threshold)
    rotation = np.eye(3)
    rotation[:2, :2] = rot2

    # rotation-inlier chaining (:860-874): TIM i is kept iff masks i-1
    # (cyclically) and i both hold
    prev = np.roll(rot_inl_mask, 1)
    rotation_inliers = np.nonzero(rot_inl_mask & prev)[0]

    if using_rot_inliers_when_estimating_cote and rotation_inliers.size > 0:
        sel = clique[rotation_inliers]
    else:
        sel = clique
    cote_nb = noise_bound if cote_noise_bound is None else cote_noise_bound
    t, trans_inl = solve_translation(
        (scale * rotation @ src[sel].T).T, tgt[sel],
        cote_nb, cbar2, use_median=(cote_mode == "median"))
    final = sel[np.nonzero(trans_inl)[0]]
    return dict(valid=True, rotation=rotation, translation=t,
                final_inliers=final, rotation_inliers=rotation_inliers,
                gnc_iterations=iters)
