"""Generate (or refresh) the golden-pose regression fixture.

Runs the full pipeline on each pinned pair in tests/golden_specs.py
(forced CPU — pose accuracy is backend-independent, RESULTS.md) and
writes tests/golden_poses.npz with the expected rotation/translation per
pair. tests/test_golden_poses.py then fails if any future change moves a
pose beyond the tolerance band (VERDICT r3 item 6).

Refresh ONLY when a change intentionally alters registration behavior;
say why in the commit that refreshes it.

Usage: python tools/make_golden_poses.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    # Reproduce the EXACT test environment (tests/conftest.py): the
    # 8-virtual-device flag changes XLA:CPU's intra-op partitioning and
    # therefore f32 reduction order — goldens generated without it drift
    # by ~0.6 deg on the tilt pair (measured).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from golden_specs import (GOLDEN_SPECS, GT_ROT_MAX_DEG, GT_TRANS_MAX_M,
                              register_spec)

    out = {}
    meta = []
    cache = os.path.join(ROOT, ".scan_cache")
    for spec in GOLDEN_SPECS:
        rot, tr, valid, gt = register_spec(spec, cache_dir=cache)
        cos = np.clip((np.trace(rot @ gt[:3, :3].T) - 1) / 2, -1, 1)
        rot_err = float(np.degrees(np.arccos(cos)))
        tr_err = float(np.linalg.norm(tr - gt[:3, 3]))
        print(f"{spec['name']}: valid={valid} "
              f"vs GT {rot_err:.3f} deg / {tr_err:.3f} m", flush=True)
        assert valid, f"{spec['name']} failed to register — not golden"
        assert rot_err < GT_ROT_MAX_DEG and tr_err < GT_TRANS_MAX_M, (
            f"{spec['name']} pose is wrong vs GT; refusing to freeze it")
        out[f"{spec['name']}_rot"] = rot.astype(np.float64)
        out[f"{spec['name']}_trans"] = tr.astype(np.float64)
        out[f"{spec['name']}_gt"] = gt.astype(np.float64)
        meta.append({**spec, "vs_gt_rot_deg": round(rot_err, 4),
                     "vs_gt_trans_m": round(tr_err, 4)})

    path = os.path.join(ROOT, "tests", "golden_poses.npz")
    np.savez_compressed(path, meta=json.dumps(meta), **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
