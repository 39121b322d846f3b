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


@pytest.mark.parametrize("spec", GOLDEN_SPECS,
                         ids=[s["name"] for s in GOLDEN_SPECS])
def test_golden_pose(spec, golden, tmp_path_factory):
    cache = str(tmp_path_factory.getbasetemp() / "scan_cache")
    os.makedirs(cache, exist_ok=True)
    repo_cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scan_cache")
    if os.path.isdir(repo_cache):
        cache = repo_cache
    rot, tr, valid, gt = register_spec(spec, cache_dir=cache)
    assert valid, f"{spec['name']} no longer registers"

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
