"""Tests for the reference-idiom object API (QuatroRegistration)."""

import numpy as np
import pytest

from quatro_tpu import QuatroRegistration, SolverConfig
from quatro_tpu.io.synthetic import make_correspondences


def test_object_api_end_to_end():
    src, tgt, gt, true_inl = make_correspondences(seed=11)
    quatro = QuatroRegistration(SolverConfig())
    quatro.set_input_source(src)
    quatro.set_input_target(tgt)
    T = quatro.compute_transformation()
    assert T.shape == (4, 4)
    assert quatro.is_valid()
    np.testing.assert_allclose(T[:3, :3], gt[:3, :3], atol=0.02)
    np.testing.assert_allclose(T[:3, 3], gt[:3, 3], atol=0.2)

    cliques = quatro.get_max_cliques()
    finals = quatro.get_final_inliers()
    idx = quatro.get_final_inliers_indices()
    assert cliques.shape[1] == 3 and len(cliques) >= len(finals) > 0
    assert len(idx) == len(finals)
    # final inliers must be dominated by true inliers
    assert true_inl[idx].mean() > 0.9


def test_object_api_requires_inputs_and_solution():
    quatro = QuatroRegistration()
    with pytest.raises(RuntimeError):
        quatro.compute_transformation()
    with pytest.raises(RuntimeError):
        _ = quatro.solution


def test_object_api_reset_and_reuse():
    src, tgt, gt, _ = make_correspondences(seed=12)
    quatro = QuatroRegistration()
    quatro.set_input_source(src)
    quatro.set_input_target(tgt)
    t1 = quatro.compute_transformation()

    # reset + a second pair (the reference REQUIRES reset per run,
    # examples/run_global_registration.cpp:99-101; here it's optional
    # but must work)
    quatro.reset()
    src2, tgt2, gt2, _ = make_correspondences(seed=13, yaw_deg=-70.0)
    quatro.set_input_source(src2)
    quatro.set_input_target(tgt2)
    t2 = quatro.compute_transformation()
    np.testing.assert_allclose(t2[:3, :3], gt2[:3, :3], atol=0.02)
    assert not np.allclose(t1, t2)


def test_object_api_mismatched_capacity_inputs():
    src, tgt, gt, _ = make_correspondences(seed=14, n_inliers=50,
                                           n_outliers=100)
    quatro = QuatroRegistration()
    quatro.set_input_source(src)
    quatro.set_input_target(np.concatenate(
        [tgt, np.zeros((200, 3), np.float32)]))  # different pad length
    # mask intersection keeps only the first 150 paired slots valid
    T = quatro.compute_transformation()
    np.testing.assert_allclose(T[:3, :3], gt[:3, :3], atol=0.02)


def test_object_api_prior_ryrx():
    from quatro_tpu.utils.se3 import rotation_from_rpy
    roll, pitch = 0.07, -0.04
    ryrx = np.asarray(rotation_from_rpy(roll, pitch, 0.0))
    src, tgt, gt, _ = make_correspondences(seed=15, roll_pitch=(roll, pitch),
                                           yaw_deg=30.0, n_inliers=80,
                                           n_outliers=120)
    quatro = QuatroRegistration()
    quatro.set_input_source(src)
    quatro.set_input_target(tgt)
    quatro.set_pre_estimated_ryrx(ryrx)
    T = quatro.compute_transformation()
    np.testing.assert_allclose(T[:3, :3], gt[:3, :3], atol=0.03)
