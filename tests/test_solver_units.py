"""Unit tests for solver kernels against tiny hand-computed cases
(test pyramid level 1 — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quatro_tpu.solver.scale import pairwise_distances, tim_consistency_graph
from quatro_tpu.solver import clique as clique_mod
from quatro_tpu.solver import rotation as rot_mod
from quatro_tpu.solver.translation import solve_translation, _estimate_axis


def test_pairwise_distances_matches_numpy(rng):
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    d = np.asarray(pairwise_distances(jnp.asarray(pts)))
    ref = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_consistency_graph_hand_case():
    # Three correspondences: 0,1 mutually consistent (same pairwise length
    # in src & tgt); 2 is junk. beta = 2*0.3*1 = 0.6.
    src = jnp.array([[0, 0, 0], [1, 0, 0], [5, 5, 0]], jnp.float32)
    tgt = jnp.array([[10, 0, 0], [10, 1, 0], [0, 0, 9]], jnp.float32)
    mask = jnp.array([True, True, True])
    adj = np.asarray(tim_consistency_graph(src, tgt, mask, 0.3))
    assert adj[0, 1] and adj[1, 0]
    assert not adj[0, 2] and not adj[2, 0]
    assert not adj.diagonal().any()


def test_consistency_graph_respects_mask():
    src = jnp.zeros((4, 3))
    tgt = jnp.zeros((4, 3))
    mask = jnp.array([True, True, False, True])
    adj = np.asarray(tim_consistency_graph(src, tgt, mask, 0.3))
    assert not adj[:, 2].any() and not adj[2, :].any()


def test_max_kcore_triangle_plus_edge():
    # vertices 0-1-2 form a triangle (2-core); 3-4 is a pendant edge.
    n = 5
    adj = np.zeros((n, n), bool)
    for i, j in [(0, 1), (1, 2), (0, 2), (3, 4)]:
        adj[i, j] = adj[j, i] = True
    k, core = clique_mod.max_kcore(jnp.asarray(adj), jnp.ones(n, bool))
    assert int(k) == 2
    np.testing.assert_array_equal(np.asarray(core), [1, 1, 1, 0, 0])


def test_greedy_clique_finds_planted_clique(rng):
    # Planted 12-clique in a 100-vertex sparse random graph.
    n = 100
    adj = rng.random((n, n)) < 0.04
    adj = np.triu(adj, 1)
    members = rng.choice(n, size=12, replace=False)
    for a in members:
        for b in members:
            if a < b:
                adj[a, b] = True
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    sel, valid = clique_mod.select_inliers(jnp.asarray(adj),
                                           jnp.ones(n, bool), mode="clique")
    sel = np.asarray(sel)
    assert bool(valid)
    assert sel[members].all(), "planted clique members must be selected"
    # the selection must itself be a clique
    idx = np.where(sel)[0]
    sub = adj[np.ix_(idx, idx)]
    assert sub[~np.eye(len(idx), dtype=bool)].all()


def test_edgeless_graph_is_invalid_in_every_mode():
    """Zero consistency edges = no mutually consistent TIM pair exists:
    the reference aborts (max clique <= 1, quatro.hpp:809-813); the k-core
    path must not fall back to the 0-core (= every vertex) and bless a
    garbage solve as valid."""
    n = 10
    adj = jnp.zeros((n, n), bool)
    for mode in ("clique", "kcore"):
        sel, valid = clique_mod.select_inliers(adj, jnp.ones(n, bool),
                                               mode=mode)
        assert not bool(valid), mode
    # kcore_threshold=0 forces the k-core shortcut inside clique mode —
    # still must not return the 0-core
    _, valid = clique_mod.select_inliers(adj, jnp.ones(n, bool),
                                         mode="clique", kcore_threshold=0.0)
    assert not bool(valid)


def test_yaw_procrustes_matches_svd(rng):
    """Closed-form yaw == Kabsch 2x2 SVD solution (teaser/utils.h:151-166)."""
    src = rng.normal(size=(30, 2))
    w = rng.uniform(0.1, 1.0, size=30)
    theta_true = 0.7
    c, s = np.cos(theta_true), np.sin(theta_true)
    rot = np.array([[c, -s], [s, c]])
    dst = src @ rot.T + rng.normal(0, 0.01, size=(30, 2))

    theta = float(rot_mod.yaw_procrustes(jnp.asarray(src, jnp.float32),
                                         jnp.asarray(dst, jnp.float32),
                                         jnp.asarray(w, jnp.float32)))
    # numpy reference: H = X W Y^T; R = V U^T with det fix
    h = (src * w[:, None]).T @ dst
    u, _, vt = np.linalg.svd(h)
    v = vt.T
    if np.linalg.det(u) * np.linalg.det(v) < 0:
        v[:, 1] *= -1
    r_ref = v @ u.T
    theta_ref = np.arctan2(r_ref[1, 0], r_ref[0, 0])
    assert abs(theta - theta_ref) < 1e-4
    assert abs(theta - theta_true) < 0.01


def test_gnc_rotation_2d_with_outliers(rng):
    n, n_out = 80, 50
    theta_true = -1.1
    c, s = np.cos(theta_true), np.sin(theta_true)
    rot = np.array([[c, -s], [s, c]])
    src = rng.uniform(-10, 10, size=(n + n_out, 2))
    dst = src @ rot.T + rng.normal(0, 0.02, size=src.shape)
    dst[n:] = rng.uniform(-10, 10, size=(n_out, 2))  # corrupt
    mask = np.ones(n + n_out, bool)

    # cost_threshold tightened: fed raw 38% outliers (no clique prefilter,
    # unlike the pipeline), mu starts ~1e-5 and needs the full anneal for
    # weights to saturate.
    res = rot_mod.gnc_rotation_2d(jnp.asarray(src, jnp.float32),
                                  jnp.asarray(dst, jnp.float32),
                                  jnp.asarray(mask), noise_bound=0.1,
                                  max_iterations=100, cost_threshold=1e-8)
    theta = float(np.arctan2(np.asarray(res.rotation)[1, 0],
                             np.asarray(res.rotation)[0, 0]))
    assert abs(theta - theta_true) < 5e-3
    inl = np.asarray(res.inlier_mask)
    assert inl[:n].mean() > 0.95 and inl[n:].mean() < 0.1


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_gnc_rotation_3d_with_outliers(rng):
    rot = _random_rotation(rng)
    src = rng.uniform(-5, 5, size=(120, 3))
    dst = src @ rot.T + rng.normal(0, 0.01, size=src.shape)
    dst[80:] = rng.uniform(-5, 5, size=(40, 3))
    res = rot_mod.gnc_rotation_3d(jnp.asarray(src, jnp.float32),
                                  jnp.asarray(dst, jnp.float32),
                                  jnp.ones(120, bool), noise_bound=0.05,
                                  max_iterations=100, cost_threshold=1e-8)
    r = np.asarray(res.rotation)
    err = np.arccos(np.clip((np.trace(r.T @ rot) - 1) / 2, -1, 1))
    assert err < 5e-3


def test_cote_estimate_axis_simple():
    # 8 measurements of t=2.0 with noise, 2 gross outliers.
    x = jnp.array([2.01, 1.98, 2.02, 2.0, 1.99, 2.03, 7.0, -5.0], jnp.float32)
    ranges = jnp.full(8, 0.3, jnp.float32)
    mask = jnp.ones(8, bool)
    est, inl = _estimate_axis(x, ranges, mask, use_median=False)
    assert abs(float(est) - 2.0) < 0.05
    inl = np.asarray(inl)
    assert inl[:6].all() and not inl[6] and not inl[7]

    est_m, _ = _estimate_axis(x, ranges, mask, use_median=True)
    assert abs(float(est_m) - 2.0) < 0.05


def test_cote_estimate_axis_masked_padding():
    x = jnp.array([1.0, 1.02, 0.98, 1.01, 50.0, 60.0], jnp.float32)
    ranges = jnp.full(6, 0.2, jnp.float32)
    mask = jnp.array([True, True, True, True, False, False])
    est, inl = _estimate_axis(x, ranges, mask, use_median=True)
    assert abs(float(est) - 1.0) < 0.05
    assert not np.asarray(inl)[4:].any()


def test_solve_translation_full(rng):
    t_true = np.array([1.5, -2.0, 0.25])
    n, n_out = 60, 40
    src = rng.uniform(-20, 20, size=(n + n_out, 3))
    dst = src + t_true + rng.normal(0, 0.03, size=(n + n_out, 3))
    dst[n:] = rng.uniform(-20, 20, size=(n_out, 3))
    res = solve_translation(jnp.asarray(src, jnp.float32),
                            jnp.asarray(dst, jnp.float32),
                            jnp.ones(n + n_out, bool),
                            noise_bound=0.3, use_median=True)
    np.testing.assert_allclose(np.asarray(res.translation), t_true, atol=0.05)
    inl = np.asarray(res.inlier_mask)
    assert inl[:n].mean() > 0.95 and inl[n:].mean() < 0.05
