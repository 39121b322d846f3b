"""On-chip equivalence check for the Pallas front-end.

CPU tests exercise segment_matmul's XLA-einsum fallback; the PALLAS path
(one-hot tiles generated in VMEM) only runs on the real TPU. This tool
validates, on-chip:

  1. segment_sums / table_lookup vs NumPy at production shapes;
  2. estimate_ground (Pallas segment kernels) vs the same call on CPU
     (einsum fallback) on a real raycast scan — identical gate decisions
     expected up to f32 matmul accumulation order;
  3. segment_cloud + voxel_downsample TPU-vs-CPU mask agreement, with a
     cascade diagnostic: voxelizing the TPU points under the CPU's
     segment mask shows how much of the voxel-count delta is downstream
     fallout of boundary-pixel segmentation flips vs voxel-stage
     divergence itself;
  4. POSE-LEVEL gate (VERDICT r3 item 4): register_scan_pair on the same
     fixture pair on both backends must agree to the STRICT accuracy
     tier (rot < 1 deg, trans < 0.3 m) — the test that would catch a
     real on-chip front-end bug regardless of mask-level jitter.

Prints one JSON line; nonzero exit on failure.
Usage: python tools/check_tpu_equivalence.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_T0 = time.time()


def _log(msg):
    print(f"[equiv +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _cpu_call(fn_name_args):
    """Run a front-end stage in a forced-CPU subprocess and return npz."""
    import subprocess
    out = os.path.join(ROOT, ".scan_cache", "equiv_cpu.npz")
    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp, sys
sys.path.insert(0, {ROOT!r})
from quatro_tpu.config import PipelineConfig
from quatro_tpu.preprocessing.patchwork import estimate_ground
from quatro_tpu.preprocessing.projection import segment_cloud
from quatro_tpu.ops.voxel import voxel_downsample
from quatro_tpu.pipeline import register_scan_pair
from quatro_tpu.types import PointBatch
z = np.load({os.path.join(ROOT, '.scan_cache', 'equiv_in.npz')!r})
pts, m = jnp.asarray(z["pts"]), jnp.asarray(z["mask"])
cfg = PipelineConfig()
pw = estimate_ground(pts, m, cfg.patchwork)
proj = segment_cloud(pts, pw.nonground, cfg.lidar, cfg.projection)
vox, vm = voxel_downsample(pts, proj.valid_segments, cfg.voxel_size,
                           cfg.max_voxels)
res = register_scan_pair(PointBatch(pts, m),
                         PointBatch(jnp.asarray(z["pts_b"]),
                                    jnp.asarray(z["mask_b"])), cfg)
np.savez({out!r}, ground=np.asarray(pw.ground),
         nonground=np.asarray(pw.nonground),
         accepted=np.asarray(pw.patch_accepted),
         seg=np.asarray(proj.valid_segments),
         vox=np.asarray(vox), vm=np.asarray(vm),
         rot=np.asarray(res.solution.rotation),
         tr=np.asarray(res.solution.translation),
         valid=np.asarray(res.solution.valid))
"""
    subprocess.run([sys.executable, "-c", code], check=True,
                   cwd=ROOT, timeout=900)
    return np.load(out)


def main():
    import jax
    import jax.numpy as jnp

    from quatro_tpu.config import PipelineConfig
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.ops.segment_matmul import segment_sums, table_lookup
    from quatro_tpu.ops.voxel import voxel_downsample
    from quatro_tpu.preprocessing.patchwork import estimate_ground
    from quatro_tpu.preprocessing.projection import segment_cloud

    dev = jax.devices()[0]
    _log(f"device: {dev}")
    ok = True
    report = {"device": str(dev)}

    # --- 1. kernels vs NumPy at production shapes --------------------------
    rng = np.random.default_rng(7)
    N, P = 131072, 640
    ids = jnp.asarray(rng.integers(0, 600, N).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((16, N)).astype(np.float32))
    ref = np.zeros((P, 16), np.float32)
    np.add.at(ref, np.asarray(ids), np.asarray(vals).T)
    got = np.asarray(segment_sums(ids, vals, P))
    seg_err = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
    tab = jnp.asarray(rng.standard_normal((P, 8)).astype(np.float32))
    got2 = np.asarray(table_lookup(ids, tab))
    lut_err = float(np.abs(got2 - np.asarray(tab)[np.asarray(ids)].T).max())
    report["segment_sums_rel_err"] = seg_err
    report["table_lookup_abs_err"] = lut_err
    ok &= seg_err < 1e-5 and lut_err == 0.0
    _log(f"kernels: seg rel err {seg_err:.2e}, lookup abs err {lut_err}")

    # --- 2/3. full front-end TPU vs CPU ------------------------------------
    a, b, gt = make_scan_pair(seed=5, yaw_deg=30.0,
                              translation=(2.5, -1.0, 0.05),
                              cache_dir=os.path.join(ROOT, ".scan_cache"))
    n_cap = 131072

    def cap(arr):
        p = np.zeros((n_cap, 3), np.float32)
        k = min(len(arr), n_cap)
        p[:k] = arr[:k]
        m = np.zeros(n_cap, bool)
        m[:k] = True
        return p, m

    pts, mask = cap(a)
    pts_b, mask_b = cap(b)
    np.savez(os.path.join(ROOT, ".scan_cache", "equiv_in.npz"),
             pts=pts, mask=mask, pts_b=pts_b, mask_b=mask_b)

    cfg = PipelineConfig()
    jp, jm = jnp.asarray(pts), jnp.asarray(mask)
    pw = estimate_ground(jp, jm, cfg.patchwork)
    proj = segment_cloud(jp, pw.nonground, cfg.lidar, cfg.projection)
    vox, vm = voxel_downsample(jp, proj.valid_segments, cfg.voxel_size,
                               cfg.max_voxels)
    _log("TPU front-end done; running CPU reference subprocess...")
    cpu = _cpu_call(None)

    g_t, g_c = np.asarray(pw.ground), cpu["ground"]
    acc_t, acc_c = np.asarray(pw.patch_accepted), cpu["accepted"]
    seg_t, seg_c = np.asarray(proj.valid_segments), cpu["seg"]
    vm_t, vm_c = np.asarray(vm), cpu["vm"]
    g_dis = float((g_t != g_c).mean())
    acc_dis = int((acc_t != acc_c).sum())
    seg_dis = float((seg_t != seg_c).mean())
    report["ground_mask_disagree_frac"] = g_dis
    report["patch_gate_disagree"] = acc_dis
    report["segment_mask_disagree_frac"] = seg_dis
    report["vox_count_tpu"] = int(vm_t.sum())
    report["vox_count_cpu"] = int(vm_c.sum())
    # GATE on the parts that should be backend-stable: the Pallas kernels
    # and the patchwork gate decisions. The projection stages depend on
    # f32 trig (arctan2/round for row/col), whose CPU-vs-TPU ULP
    # differences flip boundary pixels; a flipped pixel can relabel a
    # borderline CLUSTER, so segment/voxel divergence is lumpy (measured
    # ~1.4% of points / ~10% of voxel occupancy on one scan). That is
    # cross-backend segmentation jitter, not a kernel defect — reported,
    # loosely bounded, not tightly gated.
    ok &= g_dis < 0.005 and acc_dis <= 2
    ok &= seg_dis < 0.05
    # cascade diagnostic: voxel count from TPU's voxel stage under the
    # CPU's segment mask — if this matches the CPU count, the voxel-count
    # delta is entirely upstream segmentation jitter cascading, not
    # voxel-stage divergence (VERDICT r3 item 4's "show which").
    _, vm_x = voxel_downsample(jp, jnp.asarray(seg_c), cfg.voxel_size,
                               cfg.max_voxels)
    vox_cross = int(np.asarray(vm_x).sum())
    report["vox_count_tpu_with_cpu_mask"] = vox_cross
    vox_stage_delta = abs(vox_cross - int(vm_c.sum()))
    report["vox_stage_only_delta"] = vox_stage_delta
    ok &= vox_stage_delta <= max(0.01 * int(vm_c.sum()), 8)
    _log(f"ground disagree {g_dis:.4%}, gates {acc_dis}, "
         f"segments {seg_dis:.4%} (trig-jitter, informational), "
         f"vox {int(vm_t.sum())}/{int(vm_c.sum())} "
         f"(TPU-voxels-on-CPU-mask: {vox_cross})")

    # --- 4. pose-level gate: same pair, both backends ----------------------
    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch
    _log("registering the pair on TPU (full pipeline)...")
    res_t = register_scan_pair(PointBatch(jp, jm),
                               PointBatch(jnp.asarray(pts_b),
                                          jnp.asarray(mask_b)), cfg)
    rot_t = np.asarray(res_t.solution.rotation)
    tr_t = np.asarray(res_t.solution.translation)
    rot_c, tr_c = cpu["rot"], cpu["tr"]
    cosang = np.clip((np.trace(rot_t @ rot_c.T) - 1) / 2, -1, 1)
    pose_rot_err = float(np.degrees(np.arccos(cosang)))
    pose_tr_err = float(np.linalg.norm(tr_t - tr_c))
    report["pose_valid_tpu"] = bool(res_t.solution.valid)
    report["pose_valid_cpu"] = bool(cpu["valid"])
    report["pose_rot_err_deg"] = pose_rot_err
    report["pose_trans_err_m"] = pose_tr_err
    # both backends must also be CORRECT vs ground truth, not merely agree
    rot_g, tr_g = gt[:3, :3], gt[:3, 3]
    cosg = np.clip((np.trace(rot_t @ rot_g.T) - 1) / 2, -1, 1)
    report["pose_vs_gt_rot_deg"] = float(np.degrees(np.arccos(cosg)))
    report["pose_vs_gt_trans_m"] = float(np.linalg.norm(tr_t - tr_g))
    ok &= bool(res_t.solution.valid) and bool(cpu["valid"])
    ok &= pose_rot_err < 1.0 and pose_tr_err < 0.3
    ok &= report["pose_vs_gt_rot_deg"] < 1.0
    ok &= report["pose_vs_gt_trans_m"] < 0.3
    _log(f"pose TPU-vs-CPU: {pose_rot_err:.4f} deg / {pose_tr_err:.4f} m; "
         f"TPU-vs-GT: {report['pose_vs_gt_rot_deg']:.4f} deg / "
         f"{report['pose_vs_gt_trans_m']:.4f} m")

    report["ok"] = bool(ok)
    print(json.dumps(report), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
