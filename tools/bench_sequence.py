"""Streaming trajectory throughput: scans-from-DISK -> poses (VERDICT r1
item 8).

The reference's actual use pattern is sequential odometry with descriptor
reuse (swapTgt2Src, reference: include/fpfh_manager.hpp:74-118): each new
frame is extracted once and registered against the previous frame's cached
features. This bench measures that end to end on real files:

  synthetic trajectory -> KITTI .bin files on disk
  -> native async prefetch loader (quatro_tpu/native/quatro_native.c:
     mmap readers + a worker ring that packs PointBatches while the device
     computes)
  -> OdometryRunner.step per frame (extract once, register vs previous)
  -> block on every solution; count valids in-band.

Timing closes only after fetching every frame's valid flag + a pose
checksum (data-dependent on all device work), per the bench-integrity
rules of bench.py. Loader stalls and device waits are timed separately so
the IO/compute overlap is visible.

Usage: python tools/bench_sequence.py [--frames 64] [--points 131072]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_T0 = time.time()


def _log(msg):
    print(f"[seq-bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def write_trajectory_bins(out_dir: str, n_frames: int, seed: int = 0,
                          step_m: float = 1.5, yaw_step_deg: float = 4.0,
                          cache_dir: str | None = None) -> list:
    """Ray-cast a driving trajectory and write KITTI-format .bin files.

    Consecutive frames see the same world from poses `step_m` apart, so
    every odometry step is a genuine partial-overlap registration problem.
    Returns the file paths in order.
    """
    from quatro_tpu.io.synthetic import make_scan_pair

    paths = []
    for k in range(n_frames):
        # reuse the pair generator: frame k is the 'target' scan of pair k
        # (one scene per pair keeps generation embarrassingly cacheable;
        # consecutive frames come from the same scene via the pair's src)
        a, b, _ = make_scan_pair(seed=seed + k // 2, yaw_deg=yaw_step_deg,
                                 translation=(step_m, 0.3, 0.0),
                                 cache_dir=cache_dir)
        xyz = a if k % 2 else b
        arr = np.zeros((xyz.shape[0], 4), np.float32)
        arr[:, :3] = xyz
        p = os.path.join(out_dir, f"{k:06d}.bin")
        arr.tofile(p)
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--voxels", type=int, default=8192)
    ap.add_argument("--corr", type=int, default=1024)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--queue-depth", type=int, default=8)
    ap.add_argument("--scan-dir", default=None,
                    help="directory of existing .bin scans (else synthetic)")
    ap.add_argument("--window", type=int, default=0,
                    help="windowed mode: buffer W frames and register W "
                         "consecutive pairs in ONE batched device call "
                         "(odometry.run_odometry_windowed); 0 = the "
                         "frame-by-frame path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from quatro_tpu.config import FPFHConfig, PipelineConfig
    from quatro_tpu.odometry import OdometryRunner
    from quatro_tpu.types import PointBatch

    config = PipelineConfig(max_raw_points=args.points,
                            max_voxels=args.voxels,
                            fpfh=FPFHConfig(max_correspondences=args.corr))

    if args.scan_dir:
        paths = sorted(os.path.join(args.scan_dir, f)
                       for f in os.listdir(args.scan_dir)
                       if f.endswith(".bin"))[:args.frames]
        tmp = None
    else:
        tmp = tempfile.TemporaryDirectory(prefix="seqbench_")
        _log(f"ray-casting {args.frames} trajectory frames to {tmp.name}")
        paths = write_trajectory_bins(tmp.name, args.frames,
                                      cache_dir=os.path.join(ROOT,
                                                             ".scan_cache"))
    total_bytes = sum(os.path.getsize(p) for p in paths)
    _log(f"{len(paths)} scans on disk ({total_bytes / 1e6:.0f} MB)")

    from quatro_tpu import native
    use_native = native.available()
    _log(f"native loader available: {use_native}")

    runner = OdometryRunner(config)

    def make_stream():
        if use_native:
            return native.ScanLoader(paths, capacity=args.points,
                                     n_workers=args.workers,
                                     queue_depth=args.queue_depth)
        def gen():
            from quatro_tpu.io.kitti import load_kitti_bin
            for p in paths:
                pb = PointBatch.from_numpy(load_kitti_bin(p), args.points)
                yield np.asarray(pb.points), np.asarray(pb.mask)
        return gen()

    if args.window > 0:
        # ---- windowed mode: 2 device calls per W frames ------------------
        from quatro_tpu.odometry import run_odometry_windowed
        _log(f"windowed mode W={args.window}: warming the two batched "
             "programs (remote compile)...")
        # warm-up: run one full window through the generator on the first
        # W frames so both vmapped programs compile outside the timed run.
        stream = make_stream()
        it = iter(stream)
        warm = [next(it) for _ in range(min(args.window, len(paths)))]
        for _ in run_odometry_windowed(iter(warm), config,
                                       window=args.window):
            pass
        if hasattr(stream, "close"):
            stream.close()
        _log("compiled; timing the streamed trajectory")

        class TimedStream:
            """Accumulates time blocked on the loader's next()."""

            def __init__(self, inner):
                self.inner = inner
                self.wait = 0.0

            def __iter__(self):
                it = iter(self.inner)
                while True:
                    t0 = time.time()
                    try:
                        item = next(it)
                    except StopIteration:
                        return
                    self.wait += time.time() - t0
                    yield item

            def close(self):
                close = getattr(self.inner, "close", None)
                if close:
                    close()

        stream = TimedStream(make_stream())
        stats = {}
        sols = []
        t_start = time.time()
        for idx, sol, _ovl in run_odometry_windowed(stream, config,
                                                    window=args.window,
                                                    stats=stats):
            if sol is not None:
                sols.append(sol)
        # windowed results are device_get'd inside the generator — the
        # clock already covers every fetch
        valid = int(sum(int(np.asarray(s.valid)) for s in sols))
        chk = float(sum(float(np.asarray(s.rotation).sum()
                              + np.asarray(s.translation).sum())
                        for s in sols))
        wall = time.time() - t_start
        load_wait = stream.wait
        dispatch_time = stats.get("dispatch_s", 0.0)
        fetch_s = stats.get("fetch_s", 0.0)
        stream.close()
        n_pairs = len(sols)
    else:
      # ---- warm up both jitted programs (extract + register) --------------
      _log("compiling extract + register programs (remote compile)...")
      stream = make_stream()
      it = iter(stream)
      pts, mask = next(it)
      f0 = runner.extract(PointBatch(jnp.asarray(pts), jnp.asarray(mask)))
      sol0, *_ = runner._register(f0, f0)
      jax.block_until_ready(sol0.rotation)
      if hasattr(stream, "close"):
          stream.close()
      runner.reset()
      _log("compiled; timing the streamed trajectory")

      # ---- timed streamed run ---------------------------------------------
      stream = make_stream()
      sols = []
      load_wait = 0.0
      dispatch_time = 0.0
      fetch_s = None
      t_start = time.time()
      it = iter(stream)
      for k in range(len(paths)):
          t0 = time.time()
          try:
              pts, mask = next(it)
          except StopIteration:
              break
          t1 = time.time()
          sol = runner.step(PointBatch(jnp.asarray(pts), jnp.asarray(mask)))
          t2 = time.time()
          load_wait += t1 - t0
          dispatch_time += t2 - t1
          if sol is not None:
              sols.append(sol)
      # clock closes on fetching every solution's validity + pose checksum
      valid = int(sum(int(np.asarray(s.valid)) for s in sols))
      chk = float(sum(float(np.asarray(jnp.sum(s.rotation) + jnp.sum(
          s.translation))) for s in sols))
      wall = time.time() - t_start
      if hasattr(stream, "close"):
          stream.close()

      n_pairs = len(sols)
    fps = n_pairs / wall
    result = {
        "metric": "streaming_trajectory_pairs_per_sec",
        "value": round(fps, 2),
        "unit": "pairs/s",
        "vs_baseline": round(fps / 100.0, 3),
        "detail": {
            "frames": len(paths),
            "pairs_registered": n_pairs,
            "valid_pairs": f"{valid}/{n_pairs}",
            "pose_checksum": round(chk, 4),
            "wall_s": round(wall, 3),
            "loader_wait_s": round(load_wait, 3),
            "dispatch_s": round(dispatch_time, 3),
            "fetch_s": round(fetch_s, 3) if fetch_s is not None else None,
            "loader_wait_frac": round(load_wait / wall, 4),
            "window": args.window,
            "native_loader": use_native,
            "disk_mb": round(total_bytes / 1e6, 1),
            "points_per_scan_capacity": args.points,
            "device": str(jax.devices()[0]),
            "timing": "clock closes after fetching every pair's valid flag "
                      "and pose checksum",
        },
    }
    print(json.dumps(result), flush=True)
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
