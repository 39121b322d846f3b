"""Golden-pose regression gate (VERDICT r3 item 6).

Each pinned synthetic pair (level / terrain / dynamic / tilt worlds,
tests/golden_specs.py) must register to the SAME pose the frozen fixture
recorded, within a tolerance band sized to numerical jitter — any
"optimization" that silently shifts a pose beyond noise fails here.
Refresh the fixture with tools/make_golden_poses.py only for intentional
behavior changes. Stands in for the reference's KITTI configure-time
fixture (reference: CMakeLists.txt:57-58).
"""

import os

import numpy as np
import pytest

from tests.golden_specs import (GOLDEN_SPECS, GT_ROT_MAX_DEG, GT_TRANS_MAX_M,
                                MEDIAN_GT_ROT_DEG, MEDIAN_GT_TRANS_M,
                                ROT_BAND_DEG, TRANS_BAND_M, register_spec)

_FIXTURE = os.path.join(os.path.dirname(__file__), "golden_poses.npz")


def _rot_angle_deg(ra, rb):
    cos = np.clip((np.trace(ra @ rb.T) - 1) / 2, -1, 1)
    return float(np.degrees(np.arccos(cos)))


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(_FIXTURE):
        pytest.fail("tests/golden_poses.npz missing — run "
                    "tools/make_golden_poses.py and commit it")
    return np.load(_FIXTURE)


def _cache_dir(tmp_path_factory):
    repo_cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scan_cache")
    if os.path.isdir(repo_cache):
        return repo_cache
    cache = str(tmp_path_factory.getbasetemp() / "scan_cache")
    os.makedirs(cache, exist_ok=True)
    return cache


@pytest.fixture(scope="module")
def all_results(golden, tmp_path_factory):
    cache = _cache_dir(tmp_path_factory)
    out = {}
    for spec in GOLDEN_SPECS:
        out[spec["name"]] = register_spec(spec, cache_dir=cache)
    return out


@pytest.mark.parametrize("spec", GOLDEN_SPECS,
                         ids=[s["name"] for s in GOLDEN_SPECS])
def test_golden_pose(spec, golden, all_results):
    rot, tr, valid, gt = all_results[spec["name"]]
    assert valid, f"{spec['name']} no longer registers"

    # WIDE per-pair drift band: catches catastrophic silent changes
    # (planar aliasing = metres) while tolerating the measured ~1 deg/1 m
    # sparse-fixture wobble under benign numerics changes.
    g_rot = golden[f"{spec['name']}_rot"]
    g_tr = golden[f"{spec['name']}_trans"]
    drot = _rot_angle_deg(rot, g_rot)
    dtr = float(np.linalg.norm(tr - g_tr))
    assert drot < ROT_BAND_DEG and dtr < TRANS_BAND_M, (
        f"{spec['name']} drifted from golden pose: {drot:.3f} deg / "
        f"{dtr:.3f} m (bands {ROT_BAND_DEG} deg / {TRANS_BAND_M} m) — if "
        "intentional, refresh with tools/make_golden_poses.py")

    # the pose must also stay CORRECT, not merely stable
    assert _rot_angle_deg(rot, gt[:3, :3]) < GT_ROT_MAX_DEG
    assert float(np.linalg.norm(tr - gt[:3, 3])) < GT_TRANS_MAX_M


def test_golden_aggregate_accuracy(all_results):
    """TIGHT aggregate gate: the MEDIAN vs-GT error across all pinned
    worlds must hold the accuracy class — single-fixture wobble averages
    out, systematic regression does not."""
    rots, trs = [], []
    for spec in GOLDEN_SPECS:
        rot, tr, valid, gt = all_results[spec["name"]]
        assert valid
        rots.append(_rot_angle_deg(rot, gt[:3, :3]))
        trs.append(float(np.linalg.norm(tr - gt[:3, 3])))
    assert float(np.median(rots)) < MEDIAN_GT_ROT_DEG, rots
    assert float(np.median(trs)) < MEDIAN_GT_TRANS_M, trs
