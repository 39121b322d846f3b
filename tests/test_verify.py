"""Alignment-overlap verification (solver/verify.py) unit + e2e tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from quatro_tpu.solver.verify import alignment_overlap


def _yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]], np.float32)


def test_overlap_identity_and_known_transform(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 10
    mask = np.ones(500, bool)
    one = alignment_overlap(jnp.asarray(pts), jnp.asarray(mask),
                            jnp.asarray(pts), jnp.asarray(mask),
                            jnp.eye(3), jnp.zeros(3), radius=0.1)
    assert float(one) == 1.0

    # tgt = R src + t exactly -> overlap 1 under (R, t), ~0 under identity
    rot = _yaw_rot(1.1)
    t = np.array([5.0, -3.0, 0.7], np.float32)
    tgt = pts @ rot.T + t
    hi = alignment_overlap(jnp.asarray(pts), jnp.asarray(mask),
                           jnp.asarray(tgt), jnp.asarray(mask),
                           jnp.asarray(rot), jnp.asarray(t), radius=0.05)
    lo = alignment_overlap(jnp.asarray(pts), jnp.asarray(mask),
                           jnp.asarray(tgt), jnp.asarray(mask),
                           jnp.eye(3), jnp.zeros(3), radius=0.05)
    assert float(hi) == 1.0
    assert float(lo) < 0.1


def test_overlap_respects_masks_and_padding(rng):
    # n NOT a multiple of row_block exercises the padding path; masked-out
    # rows must not count as hits or in the denominator.
    pts = rng.normal(size=(700, 3)).astype(np.float32)
    src_mask = np.zeros(700, bool)
    src_mask[:350] = True
    tgt = np.concatenate([pts[:175], pts[:175] + 100.0])  # half the valid rows hit
    tgt_mask = np.ones(350, bool)
    tgt_mask[175:] = False  # far block is invalid: may not provide hits
    ov = alignment_overlap(jnp.asarray(pts), jnp.asarray(src_mask),
                           jnp.asarray(tgt), jnp.asarray(tgt_mask),
                           jnp.eye(3), jnp.zeros(3), radius=1e-3,
                           row_block=256)
    assert abs(float(ov) - 0.5) < 1e-6


def test_overlap_disjoint_is_zero(rng):
    a = rng.normal(size=(128, 3)).astype(np.float32)
    b = a + 1000.0
    m = np.ones(128, bool)
    ov = alignment_overlap(jnp.asarray(a), jnp.asarray(m),
                           jnp.asarray(b), jnp.asarray(m),
                           jnp.eye(3), jnp.zeros(3), radius=1.0)
    assert float(ov) == 0.0


@pytest.mark.slow
def test_overlap_gate_accepts_low_inlier_correct_edges(tmp_path):
    """Wide-baseline fixture (7.9 m / 45 deg steps, sparse VLP-16): the
    solver is routinely CORRECT from <5 final inliers here, so an
    inlier-count gate rejects good edges; the overlap gate must accept
    them while still rejecting the genuinely wrong far pairs."""
    from quatro_tpu.config import PipelineConfig
    from quatro_tpu.sequence import make_synthetic_sequence, run_sequence

    cfg = PipelineConfig.for_lidar("VLP-16", max_voxels=4096)
    scans, gt = make_synthetic_sequence(num_poses=8, seed=0, radius=10.0,
                                        config=cfg, raw_capacity=32768,
                                        cache_dir=str(tmp_path))
    res = run_sequence(scans, cfg, gt_poses=gt, loop_radius=6.0)
    assert res.edges_valid >= res.edges_total * 0.6, \
        f"{res.edges_valid}/{res.edges_total} edges valid"
    assert np.isfinite(res.poses).all()
    assert res.ate_after <= res.ate_before + 0.05


def test_top_distinct_cliques_separates_planted_cliques(rng):
    from quatro_tpu.solver.clique import (grow_greedy_cliques,
                                          top_distinct_cliques)
    n = 64
    adj = np.zeros((n, n), bool)
    a = list(range(0, 14))      # planted clique A (bigger)
    b = list(range(20, 30))     # planted clique B (disjoint)
    for grp in (a, b):
        for i in grp:
            for j in grp:
                if i != j:
                    adj[i, j] = True
    mask = jnp.ones(n, bool)
    deg = jnp.asarray(adj, jnp.float32) @ mask.astype(jnp.float32)
    grown = grow_greedy_cliques(jnp.asarray(adj), deg, mask, num_seeds=32)
    cliques, sizes = top_distinct_cliques(grown, 3)
    cliques, sizes = np.asarray(cliques), np.asarray(sizes)
    assert sizes[0] == 14 and sizes[1] == 10 and sizes[2] == 0
    assert cliques[0, a].all() and not cliques[0, b].any()
    assert cliques[1, b].all() and not cliques[1, a].any()


def test_multi_hypothesis_beats_aliased_larger_clique(rng):
    """Planar-aliasing regression: the LARGEST self-consistent clique
    carries a wrong translation; overlap arbitration across the top-K
    distinct cliques must pick the smaller, correct hypothesis (the
    single-clique solve provably returns the wrong pose here)."""
    from quatro_tpu.config import SolverConfig
    from quatro_tpu.solver import register_correspondences
    from quatro_tpu.solver.quatro import register_hypotheses
    from quatro_tpu.solver.verify import arbitrate_hypotheses

    # scene cloud + its exactly transformed copy
    cloud = (rng.uniform(-1, 1, (600, 3)) *
             np.array([30, 30, 3])).astype(np.float32)
    rot = _yaw_rot(0.6)
    t_true = np.array([4.0, -2.0, 0.5], np.float32)
    tgt_cloud = cloud @ rot.T + t_true
    m_cloud = np.ones(len(cloud), bool)

    # correspondences: 10 correct, 16 aliased by a 3 m in-scene shift
    # (mutually consistent among themselves!), 38 random junk
    n = 64
    src_c = cloud[:n].copy()
    tgt_c = src_c @ rot.T + t_true
    alias = slice(10, 26)
    t_alias = t_true + rot @ np.array([3.0, 0, 0], np.float32)
    tgt_c[alias] = src_c[alias] @ rot.T + t_alias
    junk = slice(26, None)
    tgt_c[junk] = rng.uniform(-40, 40, (n - 26, 3)).astype(np.float32)
    mask = jnp.ones(n, bool)

    cfg = SolverConfig()
    single = register_correspondences(jnp.asarray(src_c),
                                      jnp.asarray(tgt_c), mask, cfg)
    assert np.linalg.norm(np.asarray(single.translation) - t_true) > 2.0, \
        "fixture must make the aliased clique win the single solve"

    sols = register_hypotheses(jnp.asarray(src_c), jnp.asarray(tgt_c),
                               mask, cfg, k=4)
    best, overlaps = arbitrate_hypotheses(
        sols, jnp.asarray(cloud), jnp.asarray(m_cloud),
        jnp.asarray(tgt_cloud), jnp.asarray(m_cloud), radius=0.3)
    assert np.linalg.norm(np.asarray(best.translation) - t_true) < 0.1
    assert np.degrees(np.abs(np.arctan2(best.rotation[1, 0],
                                        best.rotation[0, 0]) - 0.6)) < 0.5


@pytest.mark.slow
def test_hypothesis_zero_matches_single_solve(rng):
    """register_hypotheses[0] must be EXACTLY the configured single-solve
    selection (any inlier_selection_mode, incl. the k-core shortcut), so
    raising num_hypotheses is a strict superset of the K=1 behavior."""
    from quatro_tpu.config import SolverConfig, replace as cfg_replace
    from quatro_tpu.io.synthetic import make_correspondences
    from quatro_tpu.solver import register_correspondences
    from quatro_tpu.solver.quatro import register_hypotheses

    src, tgt, _, _ = make_correspondences(seed=5, n_inliers=40,
                                          n_outliers=88)
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)
    mask = jnp.ones(src.shape[0], bool)
    for mode, thr in (("clique", 0.5), ("clique", 0.0), ("kcore", 0.5)):
        cfg = SolverConfig(inlier_selection_mode=mode,
                           kcore_heuristic_threshold=thr)
        single = register_correspondences(src, tgt, mask, cfg)
        sols = register_hypotheses(src, tgt, mask, cfg, k=3)
        np.testing.assert_array_equal(
            np.asarray(sols.max_clique_mask[0]),
            np.asarray(single.max_clique_mask), err_msg=f"{mode}/{thr}")
        np.testing.assert_allclose(np.asarray(sols.translation[0]),
                                   np.asarray(single.translation),
                                   atol=1e-6, err_msg=f"{mode}/{thr}")
        assert bool(sols.valid[0]) == bool(single.valid)
    # k larger than the seed count must clamp, not crash
    sols = register_hypotheses(src, tgt, mask,
                               SolverConfig(clique_num_seeds=16), k=64)
    assert sols.valid.shape[0] == 17  # sel0 + 16 grown seeds
