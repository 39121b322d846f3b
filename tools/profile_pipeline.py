"""Per-stage wall-clock profile of the full pipeline on the current backend.

WARNING — superseded for OFFICIAL numbers by tools/device_budget.py and
tools/profile_preprocess.py (dependency-chained dispatch, cost-analysis
rooflines). Single-call block_until_ready timing over the axon relay
carries ±40% tunnel jitter and understates sub-ms stages; round 2's
discredited per-stage table came from this methodology (RESULTS.md). Keep
for quick interactive smoke checks only.

Usage: python tools/profile_pipeline.py [n_reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from quatro_tpu.config import FPFHConfig, PipelineConfig
from quatro_tpu.io.synthetic import make_scan_pair
from quatro_tpu.ops.matching import match_features
from quatro_tpu.ops.voxel import voxel_downsample
from quatro_tpu.pipeline import preprocess, register_scan_pair
from quatro_tpu.solver.quatro import register_correspondences
from quatro_tpu.types import PointBatch


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<28s} {dt:8.3f} ms")
    return out, dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    config = PipelineConfig(max_raw_points=131072, max_voxels=8192,
                            fpfh=FPFHConfig(max_correspondences=1024))
    a, b, _ = make_scan_pair(seed=0, yaw_deg=25.0, translation=(2.0, 1.0, 0.05),
                             cache_dir="/root/repo/.scan_cache")
    src = PointBatch.from_numpy(a, config.max_raw_points)
    tgt = PointBatch.from_numpy(b, config.max_raw_points)
    print(f"device: {jax.devices()[0]}  raw pts: {a.shape[0]} / {b.shape[0]}")

    total = 0.0

    pre = jax.jit(lambda p, m: preprocess(p, m, config))
    (seg_s, _), dt = timeit("preprocess (patchwork+proj)", pre, src.points,
                            src.mask, reps=reps)
    total += 2 * dt
    seg_t, _ = pre(tgt.points, tgt.mask)

    vox = jax.jit(lambda p, m: voxel_downsample(p, m, config.voxel_size,
                                                config.max_voxels))
    (vp, vm), dt = timeit("voxel_downsample", vox, src.points, seg_s,
                          reps=reps)
    total += 2 * dt
    tp, tm = vox(tgt.points, seg_t)

    # The pipeline hot path runs the DENSE tiled front-end
    # (ops/dense_features.py) — no neighbor lists; see
    # docs/architecture.md "Gathers are the enemy".
    from quatro_tpu.ops.dense_features import dense_fpfh, dense_normals

    nrm = jax.jit(lambda p, m: dense_normals(p, m,
                                             config.fpfh.normal_radius))
    normals, dt = timeit("dense_normals", nrm, vp, vm, reps=reps)
    total += 2 * dt

    fp = jax.jit(lambda p, n, nv, m: dense_fpfh(p, n, nv, m,
                                                config.fpfh.fpfh_radius))
    desc, dt = timeit("dense_fpfh", fp, vp, normals.normals, normals.valid,
                      vm, reps=reps)
    total += 2 * dt
    t_normals = nrm(tp, tm)
    t_desc = fp(tp, t_normals.normals, t_normals.valid, tm)

    # NB: pass device arrays as ARGUMENTS, never close over them — a closed-
    # over array becomes an executable constant, and constants are re-staged
    # to the device on every call under the axon relay (100x skew observed).
    # Match/solve on the REAL src-vs-tgt pair: self-matching would hand the
    # solver zero-residual input whose GNC while_loop exits after ~1
    # iteration, understating the solver stage.
    dmask = vm & normals.valid
    t_dmask = tm & t_normals.valid
    mt = jax.jit(lambda sp, tp_, sd, td, sm, tm_: match_features(
        sp, tp_, sd, td, sm, tm_,
        capacity=config.fpfh.max_correspondences,
        use_crosscheck=config.fpfh.use_crosscheck,
        use_tuple_test=config.fpfh.use_tuple_test,
        tuple_scale=config.fpfh.tuple_scale,
        trials_per_corr=config.fpfh.tuple_trials_per_corr,
        seed=config.fpfh.tuple_seed))
    corr, dt = timeit("match_features", mt, vp, tp, desc, t_desc,
                      dmask, t_dmask, reps=reps)
    total += dt

    sv = jax.jit(lambda s, t, m: register_correspondences(s, t, m,
                                                          config.solver))
    _, dt = timeit("solver (register_corr)", sv, corr.src_xyz, corr.tgt_xyz,
                   corr.mask, reps=reps)
    total += dt

    print(f"{'—— sum of stages (x2 clouds)':<28s} {total:8.3f} ms")

    full = jax.jit(lambda s, t: register_scan_pair(s, t, config))
    timeit("FULL fused pipeline", full, src, tgt, reps=reps)


if __name__ == "__main__":
    main()
