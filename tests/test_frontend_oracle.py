"""Differential tests: vectorized front-end vs the serial NumPy oracles
(tests/frontend_oracle.py) written directly from PCL / Patchwork semantics
(reference: src/teaser_utils/fpfh.cc:44-75, include/patchwork.hpp:283-476).

Deliberate, documented divergences the assertions tolerate:
- f32 vs float64 and closed-form vs LAPACK eigensolvers perturb normals by
  ~1e-3, which can flip Darboux bin assignments at bin edges -> descriptor
  comparisons use mass tolerances, not equality;
- the implementation's SPFH denominator counts successful pairs where PCL
  counts neighbors (equal unless computePairFeatures degenerates — the
  test surfaces produce no degenerate pairs);
- Patchwork gate flips for patches sitting exactly at a threshold are
  counted, bounded, and allowed at the percent level.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.frontend_oracle import patchwork_oracle, pcl_fpfh, pcl_normals


import pytest as _pytest


@_pytest.fixture()
def rng():
    # LOCAL fixed seed: the session-scoped conftest rng advances
    # across tests, so using it makes results depend on suite
    # composition; these differential tests must be standalone-
    # deterministic.
    return np.random.default_rng(778)


pytestmark = pytest.mark.slow


def _surface_cloud(rng, n=230, pad_to=256):
    """Ground plane + wall + box face with 1 cm noise — well-conditioned
    normals everywhere (random blobs would make the smallest eigenvector
    ill-defined and the comparison meaningless)."""
    n_g, n_w = n // 2, n // 4
    n_b = n - n_g - n_w
    g = np.c_[rng.uniform(0, 6, n_g), rng.uniform(0, 6, n_g),
              np.zeros(n_g)]
    w = np.c_[rng.uniform(0, 6, n_w), np.full(n_w, 6.0),
              rng.uniform(0, 2.5, n_w)]
    b = np.c_[np.full(n_b, 3.0), rng.uniform(1, 3, n_b),
              rng.uniform(0, 1.5, n_b)]
    pts = np.concatenate([g, w, b]) + rng.normal(0, 0.01, (n, 3))
    pts = np.vstack([pts, np.zeros((pad_to - n, 3))]).astype(np.float32)
    mask = np.arange(pad_to) < n
    return pts, mask


def test_normals_match_pcl_oracle(rng):
    from quatro_tpu.ops.dense_features import dense_normals
    pts, mask = _surface_cloud(rng)
    radius = 0.8
    ref_n, ref_v = pcl_normals(pts.astype(float), mask, radius)
    got = dense_normals(jnp.asarray(pts), jnp.asarray(mask), radius)
    np.testing.assert_array_equal(np.asarray(got.valid), ref_v)
    err = np.linalg.norm(np.asarray(got.normals)[ref_v] - ref_n[ref_v],
                         axis=1)
    assert np.median(err) < 1e-3, f"median normal err {np.median(err)}"
    assert (err < 0.05).mean() > 0.98, f"worst normals err {err.max()}"


def test_fpfh_matches_pcl_oracle(rng):
    from quatro_tpu.ops.dense_features import dense_fpfh, dense_normals
    pts, mask = _surface_cloud(rng)
    nrad, frad = 0.8, 1.2
    nrm = dense_normals(jnp.asarray(pts), jnp.asarray(mask), nrad)
    got = np.asarray(dense_fpfh(jnp.asarray(pts), nrm.normals, nrm.valid,
                                jnp.asarray(mask), frad))
    # the oracle uses the ORACLE normals to stay faithful end-to-end
    ref_n, ref_v = pcl_normals(pts.astype(float), mask, nrad)
    ref = pcl_fpfh(pts.astype(float), ref_n, ref_v, mask, frad)
    ok = np.asarray(nrm.valid) & ref_v & mask
    # each descriptor is three 11-bin blocks of mass 100 each (300 total);
    # bin-edge flips move a few units of mass per affected pair
    l1 = np.abs(got[ok] - ref[ok]).sum(axis=1)
    assert np.median(l1) < 2.0, f"median descriptor L1 {np.median(l1)}"
    assert (l1 < 15.0).mean() > 0.95, f"L1 tail {np.sort(l1)[-5:]}"


def test_patchwork_matches_serial_oracle(rng):
    from quatro_tpu.config import PatchworkConfig
    from quatro_tpu.io.synthetic import make_scene, raycast_scan
    from quatro_tpu.preprocessing.patchwork import estimate_ground

    cfg = PatchworkConfig()
    scene = make_scene(seed=11)
    xyz = raycast_scan(scene, np.array([0, 0, 1.723]), 0.0, seed=12)
    xyz = xyz[: 16384].astype(np.float32)
    n = xyz.shape[0]
    mask = np.ones(n, bool)

    res = estimate_ground(jnp.asarray(xyz), jnp.asarray(mask), cfg)
    oracle_g, oracle_ng, oracle_acc = patchwork_oracle(xyz, mask, cfg)

    got_g = np.asarray(res.ground)
    got_ng = np.asarray(res.nonground)
    # identical point universe (both drop out-of-CZM + skipped patches)
    in_any = got_g | got_ng
    ora_any = oracle_g | oracle_ng
    assert (in_any == ora_any).mean() > 0.999, "CZM membership diverged"
    both = in_any & ora_any
    mismatch = (got_g != oracle_g) & both
    frac = mismatch.mean()
    assert frac < 0.01, f"ground decisions diverge on {frac:.3%} of points"
    acc_agree = (np.asarray(res.patch_accepted) == oracle_acc).mean()
    assert acc_agree > 0.97, f"patch gate agreement {acc_agree}"
