"""Property tests: the full solver must recover known SE(3)-with-yaw
transforms from correspondences with extreme outlier rates
(test pyramid level 2 — SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quatro_tpu.config import SolverConfig
from quatro_tpu.io.synthetic import make_correspondences
from quatro_tpu.solver import register_batch, register_correspondences
from quatro_tpu.utils.se3 import rotation_geodesic_error


def _run(seed=0, n_in=60, n_out=240, yaw=35.0, t=(2.0, -1.0, 0.3),
         config=SolverConfig(), noise=0.05, roll_pitch=(0.0, 0.0)):
    src, tgt, gt, inl = make_correspondences(
        seed=seed, n_inliers=n_in, n_outliers=n_out, yaw_deg=yaw,
        translation=t, noise_std=noise, roll_pitch=roll_pitch)
    sol = register_correspondences(jnp.asarray(src), jnp.asarray(tgt),
                                   jnp.ones(src.shape[0], bool), config)
    return sol, gt, inl


def _check(sol, gt, rot_tol=0.01, trans_tol=0.15):
    assert bool(sol.valid)
    rot_err = float(rotation_geodesic_error(jnp.asarray(gt[:3, :3]),
                                            sol.rotation))
    trans_err = float(jnp.linalg.norm(sol.translation - gt[:3, 3]))
    assert rot_err < rot_tol, f"rotation error {rot_err}"
    assert trans_err < trans_tol, f"translation error {trans_err}"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_recovers_transform_80pct_outliers(seed):
    sol, gt, _ = _run(seed=seed)
    _check(sol, gt)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_recovers_transform_95pct_outliers(seed):
    # ">95% outlier correspondence rates" headline regime (README.md:15).
    sol, gt, _ = _run(seed=seed, n_in=25, n_out=475, yaw=-50.0,
                      t=(3.0, 2.0, -0.2))
    _check(sol, gt)


def test_inlier_masks_identify_true_inliers():
    sol, gt, true_inl = _run(seed=7)
    clique = np.asarray(sol.max_clique_mask)
    final = np.asarray(sol.final_inlier_mask)
    # the clique must be dominated by true inliers and recover most of them
    assert (clique & true_inl).sum() / max(clique.sum(), 1) > 0.9
    assert (clique & true_inl).sum() / true_inl.sum() > 0.8
    assert (final & ~true_inl).sum() <= 0.1 * final.sum() + 1


def test_degenerate_pair_flagged_invalid(rng):
    # Pure junk, too few points for any consistent pair -> abort path
    # (reference: include/quatro.hpp:809-813).
    src = jnp.asarray(rng.uniform(-50, 50, (8, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-50, 50, (8, 3)), jnp.float32)
    sol = register_correspondences(src, tgt, jnp.ones(8, bool))
    # either invalid, or (rarely) a tiny accidental clique — must not crash
    # and must return finite outputs either way.
    assert np.isfinite(np.asarray(sol.translation)).all()
    assert np.isfinite(np.asarray(sol.rotation)).all()


def test_all_masked_is_invalid():
    src = jnp.zeros((16, 3))
    tgt = jnp.zeros((16, 3))
    sol = register_correspondences(src, tgt, jnp.zeros(16, bool))
    assert not bool(sol.valid)
    np.testing.assert_allclose(np.asarray(sol.rotation), np.eye(3))


def test_padding_invariance():
    """Padded slots must not change the solution."""
    src, tgt, gt, _ = make_correspondences(seed=3)
    n = src.shape[0]
    sol_a = register_correspondences(jnp.asarray(src), jnp.asarray(tgt),
                                     jnp.ones(n, bool))
    pad = 64
    src_p = np.concatenate([src, np.full((pad, 3), 123.0, np.float32)])
    tgt_p = np.concatenate([tgt, np.full((pad, 3), -55.0, np.float32)])
    mask_p = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    sol_b = register_correspondences(jnp.asarray(src_p), jnp.asarray(tgt_p),
                                     jnp.asarray(mask_p))
    np.testing.assert_allclose(np.asarray(sol_a.rotation),
                               np.asarray(sol_b.rotation), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol_a.translation),
                               np.asarray(sol_b.translation), atol=1e-5)


def test_teaser_so3_mode_recovers_roll_pitch():
    cfg = SolverConfig(reg_name="TEASER")
    sol, gt, _ = _run(seed=5, roll_pitch=(0.06, -0.04), config=cfg,
                      n_in=80, n_out=160)
    _check(sol, gt, rot_tol=0.02)


def test_weighted_mean_cote_mode():
    cfg = SolverConfig(cote_mode="weighted_mean")
    sol, gt, _ = _run(seed=6, config=cfg)
    _check(sol, gt)


def test_kcore_and_none_selection_modes():
    for mode in ("kcore", "none"):
        cfg = SolverConfig(inlier_selection_mode=mode)
        sol, gt, _ = _run(seed=2, n_in=80, n_out=80, config=cfg)
        _check(sol, gt, rot_tol=0.03, trans_tol=0.2)


def test_prior_ryrx_composition():
    """IMU prior path: solution rotation = Rz_est @ RyRx
    (reference: include/quatro.hpp:419-426)."""
    from quatro_tpu.utils.se3 import rotation_from_rpy
    roll, pitch = 0.08, -0.05
    ryrx = np.asarray(rotation_from_rpy(roll, pitch, 0.0))
    src, tgt, gt, _ = make_correspondences(seed=9, roll_pitch=(roll, pitch),
                                           yaw_deg=20.0, n_inliers=80,
                                           n_outliers=120)
    sol = register_correspondences(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(src.shape[0], bool),
        SolverConfig(), prior_ryrx=jnp.asarray(ryrx, jnp.float32))
    _check(sol, gt, rot_tol=0.02)


def test_batched_solve_matches_single():
    pairs = [make_correspondences(seed=s) for s in range(4)]
    src = jnp.stack([jnp.asarray(p[0]) for p in pairs])
    tgt = jnp.stack([jnp.asarray(p[1]) for p in pairs])
    mask = jnp.ones(src.shape[:2], bool)
    batch = register_batch(src, tgt, mask)
    for i, (s, t, gt, _) in enumerate(pairs):
        single = register_correspondences(jnp.asarray(s), jnp.asarray(t),
                                          mask[i])
        np.testing.assert_allclose(np.asarray(batch.rotation[i]),
                                   np.asarray(single.rotation), atol=1e-4)
        np.testing.assert_allclose(np.asarray(batch.translation[i]),
                                   np.asarray(single.translation), atol=1e-3)
        assert bool(batch.valid[i])


def test_prior_ryrx_large_tilt_levels_source():
    """With a strong roll/pitch prior, the yaw GNC must see LEVELED source
    TIMs: rotation recovery stays tight and the rotation-inlier count does
    not collapse (regression: solving yaw on tilted TIMs gave ~2.3 deg
    error and 8/128 inliers at 10 deg roll)."""
    from quatro_tpu.utils.se3 import rotation_from_rpy
    roll, pitch = 0.3, 0.2  # ~17 deg / ~11 deg
    ryrx = np.asarray(rotation_from_rpy(roll, pitch, 0.0))
    src, tgt, gt, _ = make_correspondences(seed=11, roll_pitch=(roll, pitch),
                                           yaw_deg=40.0, n_inliers=80,
                                           n_outliers=120, noise_std=0.01)
    sol = register_correspondences(
        jnp.asarray(src), jnp.asarray(tgt), jnp.ones(src.shape[0], bool),
        SolverConfig(), prior_ryrx=jnp.asarray(ryrx, jnp.float32))
    _check(sol, gt, rot_tol=0.01, trans_tol=0.1)
    assert int(sol.num_rotation_inliers) >= 40, \
        f"rotation inliers collapsed: {int(sol.num_rotation_inliers)}"


def test_gnc_cost_finite_on_noise_free_break():
    """The degenerate (noise-free) iteration-0 break must report the real
    cost, not the inf init value (regression)."""
    sol, gt, _ = _run(seed=4, noise=0.0)
    _check(sol, gt)
    assert np.isfinite(float(sol.gnc_cost)), f"gnc_cost={float(sol.gnc_cost)}"


def test_clique_max_size_is_a_hard_cap():
    from quatro_tpu.solver import clique as clique_mod
    n = 8
    adj = jnp.asarray(np.ones((n, n), bool) & ~np.eye(n, dtype=bool))
    sel = clique_mod.greedy_cliques(adj, jnp.ones(n), jnp.ones(n, bool),
                                    num_seeds=2, max_size=3)
    assert int(jnp.sum(sel)) == 3, f"clique size {int(jnp.sum(sel))} > cap 3"


def test_kcore_heuristic_threshold_switches_paths():
    """threshold=0 -> always use the k-core directly; threshold=1 -> always
    the greedy clique (reference: src/graph.cc:70-82, quatro.hpp:249-259)."""
    from quatro_tpu.solver import clique as clique_mod
    from quatro_tpu.solver.scale import tim_consistency_graph
    src, tgt, gt, _ = make_correspondences(seed=5, n_inliers=40,
                                           n_outliers=80)
    adj = tim_consistency_graph(jnp.asarray(src), jnp.asarray(tgt),
                                jnp.ones(src.shape[0], bool), 0.3, 1.0)
    mask = jnp.ones(src.shape[0], bool)
    sel_kcore, _ = clique_mod.select_inliers(adj, mask, mode="kcore")
    sel_t0, _ = clique_mod.select_inliers(adj, mask, mode="clique",
                                          kcore_threshold=0.0)
    sel_t1, _ = clique_mod.select_inliers(adj, mask, mode="clique",
                                          kcore_threshold=1.0)
    np.testing.assert_array_equal(np.asarray(sel_t0), np.asarray(sel_kcore))
    # threshold=1: genuine clique growth — must be a subset of the k-core
    # here and strictly tighter than "everything"
    assert int(jnp.sum(sel_t1)) <= int(jnp.sum(sel_kcore))
    # both paths keep enough inliers for a valid solve
    assert int(jnp.sum(sel_t1)) > 1
