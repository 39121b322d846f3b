"""Per-stage DEVICE-TIME budget of the batched pipeline (VERDICT r1 item 6).

Times each pipeline stage as its own jitted program at batch B with the
same measurement-integrity rules as bench.py: every timed call folds a
scalar carry derived from the previous call's outputs into its own input
(device-side serialization; no host sync primitive trusted), the clock
closes on a host fetch of the final carry, and XLA cost analysis reports
bytes/FLOPs per call so each stage gets a roofline utilization column.

Stage inputs are REAL intermediates: a subprocess (--prepare, forced CPU)
runs the actual front-end on the synthetic pairs and caches voxel clouds,
normals, descriptors and matched correspondences to npz, so data-dependent
trip counts (GNC iterations, k-core peeling) see production-like data.

Usage:
  python tools/device_budget.py [--batch 64] [--calls 8] [--trials 3]
  (run on the real TPU; each stage is a separate remote compile, so the
   full table takes tens of minutes cold)

Reference equivalent: the chrono stage tables printed by
examples/run_global_registration.cpp:248-251 and fpfh_manager.hpp:145-149.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HBM_BYTES_PER_S = 8.19e11   # v5e-class chip
PEAK_FLOPS = 1.97e14        # f32 MXU

_T0 = time.time()


def _log(msg):
    print(f"[budget +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _fixture_path(args):
    return os.path.join(ROOT, ".scan_cache",
                        f"budget_B{args.batch}_P{args.points}"
                        f"_V{args.voxels}_C{args.corr}.npz")


def prepare(args):
    """Subprocess entry (CPU): compute real per-stage intermediates for
    `batch` pairs and cache them to npz."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quatro_tpu.config import FPFHConfig, PipelineConfig
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.ops.dense_features import dense_fpfh, dense_normals
    from quatro_tpu.ops.matching import match_features
    from quatro_tpu.ops.voxel import voxel_downsample
    from quatro_tpu.pipeline import preprocess
    from quatro_tpu.types import PointBatch

    cfg = PipelineConfig(max_raw_points=args.points, max_voxels=args.voxels,
                         fpfh=FPFHConfig(max_correspondences=args.corr))
    n_distinct = min(args.batch, 8)
    out = {k: [] for k in ("raw_s", "rawm_s", "raw_t", "rawm_t",
                           "seg_s", "seg_t", "vox_s", "voxm_s",
                           "vox_t", "voxm_t", "nrm_t", "nrmv_t",
                           "desc_s", "dm_s", "desc_t", "dm_t",
                           "cs", "ct", "cm")}
    for k in range(n_distinct):
        a, b, _ = make_scan_pair(seed=k, yaw_deg=10.0 + 7 * k,
                                 translation=(2.0 + 0.3 * k, 1.0 - 0.2 * k,
                                              0.05),
                                 cache_dir=os.path.join(ROOT, ".scan_cache"))
        src = PointBatch.from_numpy(a, args.points)
        tgt = PointBatch.from_numpy(b, args.points)
        seg_s, _ = preprocess(src.points, src.mask, cfg)
        seg_t, _ = preprocess(tgt.points, tgt.mask, cfg)
        vs, vms = voxel_downsample(src.points, seg_s, cfg.voxel_size,
                                   cfg.max_voxels)
        vt, vmt = voxel_downsample(tgt.points, seg_t, cfg.voxel_size,
                                   cfg.max_voxels)
        ns = dense_normals(vs, vms, cfg.fpfh.normal_radius)
        nt = dense_normals(vt, vmt, cfg.fpfh.normal_radius)
        ds = dense_fpfh(vs, ns.normals, ns.valid, vms, cfg.fpfh.fpfh_radius)
        dt_ = dense_fpfh(vt, nt.normals, nt.valid, vmt, cfg.fpfh.fpfh_radius)
        dms = vms & ns.valid
        dmt = vmt & nt.valid
        corr = match_features(vs, vt, ds, dt_, dms, dmt,
                              capacity=cfg.fpfh.max_correspondences,
                              use_crosscheck=cfg.fpfh.use_crosscheck,
                              use_tuple_test=cfg.fpfh.use_tuple_test,
                              tuple_scale=cfg.fpfh.tuple_scale,
                              trials_per_corr=cfg.fpfh.tuple_trials_per_corr,
                              seed=cfg.fpfh.tuple_seed)
        vals = dict(raw_s=src.points, rawm_s=src.mask,
                    raw_t=tgt.points, rawm_t=tgt.mask,
                    seg_s=seg_s, seg_t=seg_t,
                    vox_s=vs, voxm_s=vms, vox_t=vt, voxm_t=vmt,
                    nrm_t=nt.normals, nrmv_t=nt.valid,
                    desc_s=ds, dm_s=dms, desc_t=dt_, dm_t=dmt,
                    cs=corr.src_xyz, ct=corr.tgt_xyz, cm=corr.mask)
        for key, v in vals.items():
            out[key].append(np.asarray(v))
        _log(f"prepared pair {k + 1}/{n_distinct} "
             f"(corr {int(np.asarray(corr.mask).sum())})")
    np.savez_compressed(_fixture_path(args),
                        **{k: np.stack(v) for k, v in out.items()})
    _log(f"fixture written: {_fixture_path(args)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--voxels", type=int, default=8192)
    ap.add_argument("--corr", type=int, default=1024)
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--stages", default="all",
                    help="comma list: preprocess,voxel,normals,fpfh,"
                         "match,solver")
    ap.add_argument("--prepare", action="store_true",
                    help="(internal) compute the CPU fixture and exit")
    args = ap.parse_args()

    if args.prepare:
        prepare(args)
        return

    fix = _fixture_path(args)
    if not os.path.exists(fix):
        _log("computing stage-input fixture in a CPU subprocess...")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--prepare", "--batch", str(args.batch),
                        "--points", str(args.points),
                        "--voxels", str(args.voxels),
                        "--corr", str(args.corr)], check=True)
    z = np.load(fix)
    n_distinct = z["raw_s"].shape[0]

    import jax
    import jax.numpy as jnp

    from quatro_tpu.config import FPFHConfig, PipelineConfig
    from quatro_tpu.ops.dense_features import dense_fpfh, dense_normals
    from quatro_tpu.ops.matching import match_features
    from quatro_tpu.ops.voxel import voxel_downsample
    from quatro_tpu.pipeline import preprocess
    from quatro_tpu.solver.quatro import register_correspondences

    cfg = PipelineConfig(max_raw_points=args.points, max_voxels=args.voxels,
                         fpfh=FPFHConfig(max_correspondences=args.corr))
    _log(f"device: {jax.devices()[0]}; fixture pairs: {n_distinct}")

    # Measure the PRODUCTION dispatch: fused Pallas kernels on TPU (same
    # gate as pipeline.extract_features), XLA dense elsewhere.
    from quatro_tpu.ops.pallas_frontend import (frontend_fpfh,
                                                frontend_normals,
                                                use_pallas_frontend_default)
    if use_pallas_frontend_default() and args.voxels % 512 == 0:
        _normals, _fpfh = frontend_normals, frontend_fpfh
        _log("normals/fpfh stages use the Pallas front-end")
    else:
        _normals, _fpfh = dense_normals, dense_fpfh

    def tile(key):
        arr = z[key]
        reps = [arr[i % n_distinct] for i in range(args.batch)]
        return jnp.asarray(np.stack(reps))

    # stage name -> (input arrays (batched), per-example fn)
    stages = {
        "preprocess": ((tile("raw_s"), tile("rawm_s")),
                       lambda p, m: preprocess(p, m, cfg)[0]),
        "voxel": ((tile("raw_s"), tile("seg_s")),
                  lambda p, m: voxel_downsample(
                      p, m, cfg.voxel_size, cfg.max_voxels,
                      active_cap=cfg.max_segment_points)),
        "normals": ((tile("vox_s"), tile("voxm_s")),
                    lambda p, m: _normals(p, m, cfg.fpfh.normal_radius)),
        "fpfh": ((tile("vox_t"), tile("nrm_t"), tile("nrmv_t"),
                  tile("voxm_t")),
                 lambda p, n, nv, m: _fpfh(p, n, nv, m,
                                           cfg.fpfh.fpfh_radius)),
        "match": ((tile("vox_s"), tile("vox_t"), tile("desc_s"),
                   tile("desc_t"), tile("dm_s"), tile("dm_t")),
                  lambda sp, tp, sd, td, sm, tm: match_features(
                      sp, tp, sd, td, sm, tm,
                      capacity=cfg.fpfh.max_correspondences,
                      use_crosscheck=cfg.fpfh.use_crosscheck,
                      use_tuple_test=cfg.fpfh.use_tuple_test,
                      tuple_scale=cfg.fpfh.tuple_scale,
                      trials_per_corr=cfg.fpfh.tuple_trials_per_corr,
                      seed=cfg.fpfh.tuple_seed)),
        "solver": ((tile("cs"), tile("ct"), tile("cm")),
                   lambda s, t, m: register_correspondences(
                       s, t, m, cfg.solver)),
    }
    wanted = (list(stages) if args.stages == "all"
              else args.stages.split(","))

    def chained(step):
        def fn(carry, *inputs):
            eps = jnp.where(jnp.isnan(carry), 1.0, 0.0).astype(jnp.float32)
            first, rest = inputs[0], inputs[1:]
            first = first + eps.astype(first.dtype) if jnp.issubdtype(
                first.dtype, jnp.floating) else first
            out = jax.vmap(step)(first, *rest)
            s = sum(jnp.sum(jnp.asarray(l, jnp.float32))
                    for l in jax.tree.leaves(out)
                    if jnp.issubdtype(jnp.asarray(l).dtype, jnp.number)
                    or jnp.asarray(l).dtype == jnp.bool_)
            return carry + s * 1e-30
        return fn

    rows = []
    for name in wanted:
        inputs, step = stages[name]
        fn = jax.jit(chained(step))
        _log(f"compiling stage '{name}' (remote compile)...")
        compiled = fn.lower(jnp.zeros((), jnp.float32), *inputs).compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = float(ca.get("bytes accessed", 0.0)) / 1e9
            tflop = float(ca.get("flops", 0.0)) / 1e12
        except Exception:
            gb, tflop = 0.0, 0.0
        carry = compiled(jnp.zeros((), jnp.float32), *inputs)
        float(np.asarray(carry))  # drain warmup
        times = []
        for _ in range(args.trials):
            c = jnp.zeros((), jnp.float32)
            t0 = time.time()
            for _ in range(args.calls):
                c = compiled(c, *inputs)
            float(np.asarray(c))  # clock closes on the carry fetch
            times.append((time.time() - t0) / args.calls)
        dt = float(np.median(times))
        hbm_s = gb / 819.0          # seconds at peak HBM bandwidth
        mxu_s = tflop / 197.0       # seconds at peak f32 MXU
        rows.append({
            "stage": name, "ms_per_call": round(dt * 1e3, 3),
            "ms_per_item": round(dt * 1e3 / args.batch, 4),
            "GB_per_call": round(gb, 2), "TFLOP_per_call": round(tflop, 3),
            "hbm_util": round(hbm_s / dt, 3) if dt else None,
            "mxu_util": round(mxu_s / dt, 3) if dt else None,
        })
        _log(f"{name}: {dt * 1e3:.2f} ms/call ({dt * 1e3 / args.batch:.3f} "
             f"ms/item), {gb:.1f} GB, {tflop:.2f} TFLOP, "
             f"HBM util {rows[-1]['hbm_util']}, MXU util "
             f"{rows[-1]['mxu_util']}")

    print(json.dumps({"batch": args.batch, "device": str(jax.devices()[0]),
                      "stages": rows}, indent=1), flush=True)


if __name__ == "__main__":
    main()
