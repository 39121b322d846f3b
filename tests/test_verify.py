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
