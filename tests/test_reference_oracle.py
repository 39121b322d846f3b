"""Differential test: the JAX solver vs a float64 NumPy transliteration
of the reference solver (tests/reference_oracle.py; VERDICT round 1 item 2).

Every stage of include/quatro.hpp's back-end — TIM consistency graph, GNC
yaw rotation, COTE translation, and the full driver downstream of the
clique — is compared against the oracle on hundreds of random instances
spanning N, outlier rate, noise level, both COTE modes, and the k-core
shortcut. Drift in any stage's semantics fails these tests.

Comparison discipline: the JAX solver runs in f32, the oracle in f64, so
boolean masks may legitimately flip on pairs that sit within f32 rounding
of a decision boundary. Mask comparisons therefore allow disagreement
only inside an explicit boundary margin; pose comparisons use tolerances
far below the solver's noise bound.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quatro_tpu.config import SolverConfig
from quatro_tpu.io.synthetic import make_correspondences
from quatro_tpu.solver.quatro import register_correspondences
from quatro_tpu.solver.rotation import gnc_rotation_2d
from quatro_tpu.solver.scale import tim_consistency_graph
from quatro_tpu.solver.translation import solve_translation

import reference_oracle as oracle  # tests/ is on sys.path under pytest


def _instances():
    """~540 random instances spanning the VERDICT-mandated sweep."""
    cases = []
    seed = 0
    for n in (12, 32, 96):
        for outlier_rate in (0.0, 0.5, 0.9):
            for noise in (0.0, 0.02, 0.05):
                for _ in range(20):
                    seed += 1
                    rng = np.random.default_rng(seed)
                    # keep >= 5 planted inliers: with fewer, the clique can
                    # be a spurious 2-set of outliers whose downstream solve
                    # has exact cost ties (e.g. COTE on two points) broken
                    # differently by f32 vs f64 — chaotic, not semantic
                    n_out = min(int(round(n * outlier_rate)), n - 5)
                    cases.append(dict(
                        seed=seed, n=n, n_inliers=n - n_out,
                        n_outliers=n_out, noise=noise,
                        yaw=float(rng.uniform(-180, 180)),
                        t=tuple(rng.uniform(-4, 4, 3))))
    return cases


CASES = _instances()


def _make(case):
    src, tgt, gt, _ = make_correspondences(
        seed=case["seed"], n_inliers=case["n_inliers"],
        n_outliers=case["n_outliers"], yaw_deg=case["yaw"],
        translation=case["t"], noise_std=case["noise"])
    return src, tgt, gt


def _angle_deg(r_a, r_b):
    d = np.asarray(r_a)[:2, :2] @ np.asarray(r_b)[:2, :2].T
    return abs(np.rad2deg(np.arctan2(d[1, 0], d[0, 0])))


# ---------------------------------------------------------------------------
# stage-level differentials
# ---------------------------------------------------------------------------

def test_consistency_graph_matches_oracle():
    """tim_consistency_graph's reduced |d_tgt - d_src| <= beta predicate
    must agree with the reference's two-sided ratio test everywhere except
    within f32 rounding of the boundary."""
    checked = 0
    for case in CASES[::17]:
        src, tgt, _ = _make(case)
        n = src.shape[0]
        cfg = SolverConfig()
        ours = np.asarray(tim_consistency_graph(
            jnp.asarray(src), jnp.asarray(tgt), jnp.ones(n, bool),
            cfg.noise_bound, cfg.cbar2, use_pallas=False))
        ref = oracle.consistency_adjacency(src, tgt, cfg.noise_bound,
                                           cfg.cbar2)
        beta = 2.0 * cfg.noise_bound * np.sqrt(cfg.cbar2)
        d_src = np.linalg.norm(
            src[:, None].astype(np.float64) - src[None], axis=-1)
        d_tgt = np.linalg.norm(
            tgt[:, None].astype(np.float64) - tgt[None], axis=-1)
        margin = np.abs(np.abs(d_tgt - d_src) - beta)
        disagree = ours != ref
        assert margin[disagree].size == 0 or margin[disagree].max() < 1e-4, \
            f"seed {case['seed']}: graph disagrees off-boundary"
        checked += 1
    assert checked >= 30


@pytest.mark.slow
def test_gnc_rotation_matches_oracle():
    """The f32 GNC-TLS yaw loop must track the f64 literal loop: same
    yaw to fractions of a degree, inlier masks differing only near the
    0.4 weight boundary."""
    rng = np.random.default_rng(7)
    for trial in range(60):
        m = int(rng.integers(6, 80))
        yaw = rng.uniform(-np.pi, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, -s], [s, c]])
        src = rng.uniform(-20, 20, (m, 2))
        noise = rng.uniform(0, 0.1)
        dst = src @ rot.T + rng.normal(0, noise, (m, 2))
        n_bad = int(rng.integers(0, max(m // 3, 1)))
        bad = rng.choice(m, n_bad, replace=False)
        dst[bad] += rng.uniform(-15, 15, (n_bad, 2))

        nb = 0.6  # reference rescaled bound: 0.3 * 2/scale
        ours = gnc_rotation_2d(jnp.asarray(src, jnp.float32),
                               jnp.asarray(dst, jnp.float32),
                               jnp.ones(m, bool), nb, 1.4, 100, 0.00011)
        ref_rot, ref_w, ref_inl, ref_iters, _ = oracle.gnc_rotation_2d(
            src.T, dst.T, nb, 1.4, 100, 0.00011)

        assert _angle_deg(np.asarray(ours.rotation), ref_rot) < 0.2, \
            f"trial {trial}"
        ours_inl = np.asarray(ours.inlier_mask)
        boundary = np.abs(ref_w - 0.4) < 5e-3
        disagree = ours_inl != ref_inl
        assert not np.any(disagree & ~boundary), \
            f"trial {trial}: inlier mask disagrees off the 0.4 boundary"


@pytest.mark.parametrize("use_median", [True, False])
@pytest.mark.slow
def test_cote_matches_oracle(use_median):
    """COTE per-axis estimates: f32 prefix-sum sweep vs the f64 literal
    event loop, both modes."""
    rng = np.random.default_rng(11)
    for trial in range(60):
        m = int(rng.integers(4, 120))
        t_true = rng.uniform(-5, 5, 3)
        src = rng.uniform(-20, 20, (m, 3))
        dst = src + t_true + rng.normal(0, 0.05, (m, 3))
        n_bad = int(rng.integers(0, max(m // 2, 1)))
        bad = rng.choice(m, n_bad, replace=False)
        dst[bad] += rng.uniform(-10, 10, (n_bad, 3))

        nb, cbar2 = 0.3, 1.0
        ours = solve_translation(jnp.asarray(src, jnp.float32),
                                 jnp.asarray(dst, jnp.float32),
                                 jnp.ones(m, bool), nb, cbar2,
                                 use_median=use_median)
        ref_t, ref_inl = oracle.solve_translation(
            src, dst, nb, cbar2, use_median=use_median)
        np.testing.assert_allclose(np.asarray(ours.translation), ref_t,
                                   atol=2e-4,
                                   err_msg=f"trial {trial} (median="
                                           f"{use_median})")
        margin = np.abs(np.abs(dst - src - ref_t) - nb).min(axis=1)
        disagree = np.asarray(ours.inlier_mask) != ref_inl
        assert not np.any(disagree & (margin > 1e-4)), \
            f"trial {trial}: COTE inliers disagree off-boundary"


# ---------------------------------------------------------------------------
# end-to-end differential: full driver with the JAX-selected clique
# ---------------------------------------------------------------------------

def _compare_case(case, config: SolverConfig, rot_tol_deg=0.1,
                  trans_tol=0.02):
    src, tgt, _ = _make(case)
    n = src.shape[0]
    sol = register_correspondences(jnp.asarray(src), jnp.asarray(tgt),
                                   jnp.ones(n, bool), config)
    clique = np.nonzero(np.asarray(sol.max_clique_mask))[0]
    ref = oracle.register_with_clique(
        src, tgt, clique, noise_bound=config.noise_bound,
        cbar2=config.cbar2,
        rotation_gnc_factor=config.rotation_gnc_factor,
        rotation_max_iterations=config.rotation_max_iterations,
        rotation_cost_threshold=config.rotation_cost_threshold,
        cote_mode=config.cote_mode,
        cote_noise_bound=config.noise_bound * config.cote_noise_bound_coeff,
        using_rot_inliers_when_estimating_cote=(
            config.using_rot_inliers_when_estimating_cote))
    assert bool(sol.valid) == ref["valid"], f"seed {case['seed']}: valid"
    if not ref["valid"] or clique.size < 4:
        # tiny cliques (spurious outlier sets) produce exact-tie consensus
        # problems whose f32/f64 argmin break differently — skip the pose
        # assertion, the valid flags above still had to agree
        return None
    rot_err = _angle_deg(np.asarray(sol.rotation), ref["rotation"])
    trans_err = float(np.max(np.abs(np.asarray(sol.translation)
                                    - ref["translation"])))
    assert rot_err < rot_tol_deg, \
        f"seed {case['seed']}: rotation drift {rot_err:.4f} deg"
    assert trans_err < trans_tol, \
        f"seed {case['seed']}: translation drift {trans_err:.4f} m"
    return rot_err, trans_err


def _sweep(cases, config, **tol):
    errs = [e for e in (_compare_case(c, config, **tol) for c in cases)
            if e is not None]
    assert len(errs) >= 0.8 * len(cases), "too many degenerate skips"
    return np.asarray(errs)


def test_full_driver_matches_oracle_500():
    """The headline differential (VERDICT item 2): on ~540 random
    instances, the JAX driver downstream of the clique must produce the
    same pose as the f64 reference transliteration fed the same clique."""
    errs = _sweep(CASES, SolverConfig())
    # aggregate drift must be rounding-level, not merely under tolerance
    assert float(np.median(errs[:, 0])) < 1e-3
    assert float(np.median(errs[:, 1])) < 1e-3


def test_full_driver_matches_oracle_weighted_mean():
    _sweep(CASES[3::29], SolverConfig(cote_mode="weighted_mean"))


def test_full_driver_matches_oracle_rot_inliers_cote():
    _sweep(CASES[5::29],
           SolverConfig(using_rot_inliers_when_estimating_cote=True))


def test_full_driver_matches_oracle_kcore_shortcut():
    """kcore_heuristic_threshold=0 forces the k-core shortcut selection;
    the downstream math must still match the oracle given that set."""
    _sweep(CASES[7::29], SolverConfig(kcore_heuristic_threshold=0.0))


def test_full_driver_matches_oracle_mode_none():
    """inlier_selection_mode='none' solves on ALL correspondences (the
    repo's sensible reinterpretation — upstream NONE leaves the clique
    empty and degenerates, include/quatro.hpp:782-817). The oracle gets
    the full index set; only low-outlier cases converge identically."""
    config = SolverConfig(inlier_selection_mode="none")
    _sweep([c for c in CASES if c["n_outliers"] == 0], config)
