"""Evaluation harnesses: loop-closure success rate and scaling efficiency.

The reference publishes qualitative robustness plots only (reference:
README.md:34-44); the driver's build targets are quantitative (BASELINE.md):
>=99% registration success on loop-closure pairs, >100 pairs/s/chip,
>=0.8 scaling efficiency. These harnesses measure all three on procedurally
generated scan pairs with exact ground truth.

Success criterion (standard loop-closure accounting): rotation error < 5 deg
AND translation error < 2 m.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from quatro_tpu.config import PipelineConfig


@dataclass
class PairEval:
    seed: int
    valid: bool
    rot_err_deg: float
    trans_err_m: float
    n_corr: int
    success: bool
    strict: bool = False  # tighter tier: rot < 1 deg AND trans < 0.3 m


@dataclass
class EvalReport:
    pairs: List[PairEval]
    wall_s: float
    compile_s: float

    @property
    def success_rate(self) -> float:
        return float(np.mean([p.success for p in self.pairs]))

    @property
    def strict_rate(self) -> float:
        return float(np.mean([p.strict for p in self.pairs]))

    @property
    def pairs_per_s(self) -> float:
        return len(self.pairs) / self.wall_s if self.wall_s > 0 else 0.0

    def summary(self) -> dict:
        rot = [p.rot_err_deg for p in self.pairs if p.success]
        tr = [p.trans_err_m for p in self.pairs if p.success]
        return {
            "n_pairs": len(self.pairs),
            "success_rate": round(self.success_rate, 4),
            "strict_success_rate": round(self.strict_rate, 4),
            "median_rot_err_deg": round(float(np.median(rot)), 4) if rot else None,
            "median_trans_err_m": round(float(np.median(tr)), 4) if tr else None,
            "pairs_per_s": round(self.pairs_per_s, 2),
            "compile_s": round(self.compile_s, 1),
            "failures": [p.seed for p in self.pairs if not p.success],
        }


def _pose_error(transform: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    r_est, r_gt = transform[:3, :3], gt[:3, :3]
    # Frobenius-based angle: well conditioned near zero (unlike arccos-trace)
    rel = r_est.T @ r_gt
    angle = np.arctan2(
        np.linalg.norm([rel[2, 1] - rel[1, 2], rel[0, 2] - rel[2, 0],
                        rel[1, 0] - rel[0, 1]]) / 2.0,
        (np.trace(rel) - 1.0) / 2.0)
    trans = np.linalg.norm(transform[:3, 3] - gt[:3, 3])
    return float(np.degrees(angle)), float(trans)


def _tilt_pair(src_xyz: np.ndarray, tgt_xyz: np.ndarray, gt: np.ndarray,
               tilt_deg: float, rng: np.random.Generator):
    """Tilt each scan by an independent random roll/pitch (a non-level
    platform) and return the adjusted ground truth:
    tgt = R src + t  =>  (B tgt) = (B R A^T)(A src) + B t."""
    def tilt_rot():
        roll, pitch = np.deg2rad(rng.uniform(-tilt_deg, tilt_deg, 2))
        cr, sr = np.cos(roll), np.sin(roll)
        cp, sp = np.cos(pitch), np.sin(pitch)
        rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        return (ry @ rx).astype(np.float32)

    a, b = tilt_rot(), tilt_rot()
    gt2 = np.eye(4, dtype=np.float32)
    gt2[:3, :3] = b @ gt[:3, :3] @ a.T
    gt2[:3, 3] = b @ gt[:3, 3]
    return src_xyz @ a.T, tgt_xyz @ b.T, gt2


def evaluate_loop_closures(n_pairs: int = 50,
                           config: Optional[PipelineConfig] = None,
                           rot_thresh_deg: float = 5.0,
                           trans_thresh_m: float = 2.0,
                           yaw_range: Tuple[float, float] = (-180.0, 180.0),
                           trans_range: float = 5.0,
                           seed0: int = 0,
                           raw_capacity: int = 131072,
                           cache_dir: Optional[str] = None,
                           tilt_deg: float = 0.0,
                           terrain=None,
                           dynamic_fraction: float = 0.0,
                           strict_rot_deg: float = 1.0,
                           strict_trans_m: float = 0.3,
                           batch: int = 1) -> EvalReport:
    """Register n synthetic loop-closure pairs; report success statistics.

    Pairs sample the full yaw circle (loop closures arrive at arbitrary
    heading) and up to `trans_range` meters of displacement. With
    tilt_deg > 0 each scan is additionally tilted by an independent random
    roll/pitch in [-tilt_deg, tilt_deg] — the non-level-platform case that
    needs config.ground_alignment (solver/ground.py) for full accuracy.
    `terrain` (io/synthetic.Terrain) makes the world sloped/curved;
    `dynamic_fraction` moves that share of cars between captures.
    Every report carries BOTH tiers: the loop-closure criterion
    (rot_thresh_deg / trans_thresh_m, default 5 deg / 2 m) and a strict
    tier (default 1 deg / 0.3 m) keyed to the claimed median accuracy.

    batch > 1 registers pairs in jit(vmap) chunks of that size — the
    bench's serving pattern. The round-4 eval-vs-bench throughput gap
    (40-45 vs 70 pairs/s, VERDICT r4 item 7) was exactly this: the eval
    loop dispatched single-pair programs whose per-dispatch overhead and
    B=1 irregular ops don't amortize. Batched evaluation makes n >= 300
    runs cheap enough for statistical power on the >= 99% claim.
    """
    import jax
    import jax.numpy as jnp
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch

    config = config or PipelineConfig(max_voxels=8192)
    rng = np.random.default_rng(seed0)
    fn = jax.jit(lambda s, t: register_scan_pair(s, t, config))
    pair_kwargs = dict(terrain=terrain, dynamic_fraction=dynamic_fraction)

    cases = []
    for k in range(n_pairs):
        yaw = rng.uniform(*yaw_range)
        t = rng.uniform(-trans_range, trans_range, 3)
        t[2] = rng.uniform(-0.3, 0.3)
        cases.append((seed0 + k, yaw, t))

    if cache_dir is not None:
        # Host-side ray-casting dominates wall-clock (~tens of seconds per
        # pair); warm the disk cache with a process pool so the solve loop
        # below only reads npz files.
        import concurrent.futures as cf
        import os
        with cf.ProcessPoolExecutor(max_workers=min(os.cpu_count() or 4,
                                                    16)) as pool:
            futs = [pool.submit(make_scan_pair, seed=sd, yaw_deg=yaw,
                                translation=tuple(tr), lidar=config.lidar,
                                cache_dir=cache_dir, **pair_kwargs)
                    for sd, yaw, tr in cases]
            for f in futs:
                f.result()

    tilt_rng = np.random.default_rng(seed0 + 777)

    if batch > 1:
        # Batched serving pattern: chunks of `batch` pairs per device call.
        def load(sd, yaw, tr):
            s, t, gt = make_scan_pair(seed=sd, yaw_deg=yaw,
                                      translation=tuple(tr),
                                      lidar=config.lidar,
                                      cache_dir=cache_dir, **pair_kwargs)
            if tilt_deg > 0.0:
                s, t, gt = _tilt_pair(s, t, gt, tilt_deg, tilt_rng)
            return s, t, gt

        loaded = [load(*c) for c in cases]
        bfn = jax.jit(jax.vmap(lambda s, t: register_scan_pair(s, t,
                                                               config)))

        def to_batch(chunk):
            src = [PointBatch.from_numpy(s, raw_capacity)
                   for s, _, _ in chunk]
            tgt = [PointBatch.from_numpy(t, raw_capacity)
                   for _, t, _ in chunk]
            # pad the last chunk by repeating its first pair (results
            # beyond the real count are discarded)
            while len(src) < batch:
                src.append(src[0])
                tgt.append(tgt[0])
            stack = lambda l: jax.tree.map(lambda *x: jnp.stack(x), *l)
            return stack(src), stack(tgt)

        chunks = [loaded[i:i + batch] for i in range(0, len(loaded), batch)]
        tA = time.time()
        out0 = bfn(*to_batch(chunks[0]))
        jax.block_until_ready(out0.solution.rotation)
        compile_s = time.time() - tA

        t_start = time.time()
        outs_b = [out0 if i == 0 else bfn(*to_batch(c))
                  for i, c in enumerate(chunks)]
        jax.block_until_ready([o.solution.rotation for o in outs_b])
        wall = time.time() - t_start

        results = []
        idx = 0
        for ci, chunk in enumerate(chunks):
            sol = outs_b[ci].solution
            rot_b = np.asarray(sol.rotation)
            tr_b = np.asarray(sol.translation)
            val_b = np.asarray(sol.valid)
            ncorr_b = np.asarray(outs_b[ci].correspondences.mask).sum(1)
            for j in range(len(chunk)):
                gt = chunk[j][2]
                T = np.eye(4)
                T[:3, :3] = rot_b[j]
                T[:3, 3] = tr_b[j]
                rot_err, trans_err = _pose_error(T, gt)
                valid = bool(val_b[j])
                results.append(PairEval(
                    seed=cases[idx][0], valid=valid,
                    rot_err_deg=rot_err, trans_err_m=trans_err,
                    n_corr=int(ncorr_b[j]),
                    success=(valid and rot_err < rot_thresh_deg
                             and trans_err < trans_thresh_m),
                    strict=(valid and rot_err < strict_rot_deg
                            and trans_err < strict_trans_m)))
                idx += 1
        return EvalReport(results, wall, compile_s)

    # compile once
    s0, t0_, gt0 = make_scan_pair(seed=seed0, yaw_deg=cases[0][1],
                                  translation=tuple(cases[0][2]),
                                  lidar=config.lidar, cache_dir=cache_dir,
                                  **pair_kwargs)
    tA = time.time()
    out = fn(PointBatch.from_numpy(s0, raw_capacity),
             PointBatch.from_numpy(t0_, raw_capacity))
    jax.block_until_ready(out.solution.rotation)
    compile_s = time.time() - tA

    results: List[PairEval] = []
    t_start = time.time()
    outs = []
    for (sd, yaw, tr) in cases:
        src_xyz, tgt_xyz, gt = make_scan_pair(seed=sd, yaw_deg=yaw,
                                              translation=tuple(tr),
                                              lidar=config.lidar,
                                              cache_dir=cache_dir,
                                              **pair_kwargs)
        if tilt_deg > 0.0:
            src_xyz, tgt_xyz, gt = _tilt_pair(src_xyz, tgt_xyz, gt,
                                              tilt_deg, tilt_rng)
        out = fn(PointBatch.from_numpy(src_xyz, raw_capacity),
                 PointBatch.from_numpy(tgt_xyz, raw_capacity))
        outs.append((sd, gt, out))
    jax.block_until_ready([o.solution.rotation for _, _, o in outs])
    wall = time.time() - t_start

    for sd, gt, out in outs:
        T = np.asarray(out.solution.transform())
        rot_err, trans_err = _pose_error(T, gt)
        valid = bool(out.solution.valid)
        ok = (valid and rot_err < rot_thresh_deg
              and trans_err < trans_thresh_m)
        strict = (valid and rot_err < strict_rot_deg
                  and trans_err < strict_trans_m)
        results.append(PairEval(
            seed=sd, valid=valid,
            rot_err_deg=rot_err, trans_err_m=trans_err,
            n_corr=int(np.asarray(out.correspondences.mask).sum()),
            success=ok, strict=strict))
    return EvalReport(results, wall, compile_s)


def measured_overlap(src_xyz: np.ndarray, tgt_xyz: np.ndarray,
                     gt: np.ndarray, radius: float = 0.5,
                     sample: int = 2048, seed: int = 0) -> float:
    """Fraction of (subsampled) GT-transformed source points with a target
    point within `radius` — the ground-truth overlap of a pair."""
    rng = np.random.default_rng(seed)
    s = src_xyz[rng.choice(src_xyz.shape[0],
                           min(sample, src_xyz.shape[0]), replace=False)]
    t = tgt_xyz[rng.choice(tgt_xyz.shape[0],
                           min(4 * sample, tgt_xyz.shape[0]), replace=False)]
    m = s @ gt[:3, :3].T + gt[:3, 3]
    # blockwise NN to bound memory
    hits = 0
    r2 = radius * radius
    for b in range(0, m.shape[0], 256):
        d2 = ((m[b:b + 256, None, :] - t[None, :, :]) ** 2).sum(-1).min(1)
        hits += int((d2 < r2).sum())
    return hits / m.shape[0]


def evaluate_overlap_sweep(baselines=(2.0, 5.0, 10.0, 15.0, 20.0, 25.0),
                           n_pairs: int = 16,
                           config: Optional[PipelineConfig] = None,
                           rot_thresh_deg: float = 5.0,
                           trans_thresh_m: float = 2.0,
                           seed0: int = 0,
                           raw_capacity: int = 131072,
                           cache_dir: Optional[str] = None) -> dict:
    """Success vs baseline distance (partial overlap). Wider baselines see
    less common structure; this measures where registration degrades and
    reports the MEASURED mean overlap per baseline alongside success.
    The reference never quantifies this (its fixture is one ~14 m KITTI
    pair, reference: CMakeLists.txt:57-58).
    """
    import jax
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch

    config = config or PipelineConfig(max_voxels=8192)
    fn = jax.jit(lambda s, t: register_scan_pair(s, t, config))
    rng = np.random.default_rng(seed0)

    out = {}
    for dist in baselines:
        succ, overlaps, rot_errs, trans_errs = [], [], [], []
        for k in range(n_pairs):
            yaw = rng.uniform(-180.0, 180.0)
            ang = rng.uniform(0, 2 * np.pi)
            tr = (dist * np.cos(ang), dist * np.sin(ang),
                  rng.uniform(-0.2, 0.2))
            src_xyz, tgt_xyz, gt = make_scan_pair(
                seed=seed0 + 100 * int(dist) + k, yaw_deg=yaw,
                translation=tr, lidar=config.lidar, cache_dir=cache_dir)
            res = fn(PointBatch.from_numpy(src_xyz, raw_capacity),
                     PointBatch.from_numpy(tgt_xyz, raw_capacity))
            T = np.asarray(res.solution.transform())
            rot_err, trans_err = _pose_error(T, gt)
            ok = (bool(res.solution.valid) and rot_err < rot_thresh_deg
                  and trans_err < trans_thresh_m)
            succ.append(ok)
            rot_errs.append(rot_err)
            trans_errs.append(trans_err)
            overlaps.append(measured_overlap(src_xyz, tgt_xyz, gt))
        out[float(dist)] = {
            "success_rate": round(float(np.mean(succ)), 4),
            "mean_overlap": round(float(np.mean(overlaps)), 3),
            "median_rot_err_deg": round(float(np.median(rot_errs)), 4),
            "median_trans_err_m": round(float(np.median(trans_errs)), 4),
            "n_pairs": n_pairs,
        }
    return out


def evaluate_scaling(batch_per_device: int = 4,
                     device_counts: Optional[List[int]] = None,
                     n_corr: int = 512, iters: int = 10) -> dict:
    """Weak-scaling efficiency of the sharded correspondence solver across
    mesh sizes (throughput_n / (n * throughput_1)).

    CAVEAT: on *virtual* devices (xla_force_host_platform_device_count)
    all mesh sizes share the same physical cores, so this measures core
    contention, not scaling — expect efficiency ~1/n there. The structural
    scaling evidence (zero collectives in the compiled registration HLO)
    lives in parallel/diagnostics.py::collective_profile; run this
    function on real multi-chip hardware only."""
    import jax
    import jax.numpy as jnp
    from quatro_tpu.io.synthetic import make_correspondences
    from quatro_tpu.parallel import make_pairs_mesh, sharded_register_batch

    avail = len(jax.devices())
    device_counts = device_counts or [d for d in (1, 2, 4, 8) if d <= avail]
    results = {}
    base = None
    for nd in device_counts:
        b = batch_per_device * nd
        pairs = [make_correspondences(seed=s, n_inliers=max(8, n_corr // 8),
                                      n_outliers=n_corr - max(8, n_corr // 8))
                 for s in range(b)]
        src = jnp.stack([jnp.asarray(p[0]) for p in pairs])
        tgt = jnp.stack([jnp.asarray(p[1]) for p in pairs])
        mask = jnp.ones(src.shape[:2], bool)
        fn = sharded_register_batch(make_pairs_mesh(nd))
        out = fn(src, tgt, mask)
        jax.block_until_ready(out.rotation)
        t0 = time.time()
        for _ in range(iters):
            out = fn(src, tgt, mask)
        jax.block_until_ready(out.rotation)
        thr = b * iters / (time.time() - t0)
        if base is None:
            # Per-device baseline from the FIRST measured count (which need
            # not be 1): efficiency = (thr/nd) / (thr_first/nd_first).
            base = thr / nd
        results[nd] = {"pairs_per_s": round(thr, 1),
                       "efficiency": round(thr / (base * nd), 3)}
    return results


def evaluate_outlier_robustness(
        outlier_rates: Optional[List[float]] = None,
        n_trials: int = 64,
        n_corr: int = 512,
        config=None,
        rot_thresh_deg: float = 5.0,
        trans_thresh_m: float = 2.0,
        noise_std: float = 0.05,
        seed0: int = 0) -> dict:
    """Correspondence-level robustness sweep over outlier rates.

    The reference's headline claim is surviving >95% outlier correspondence
    rates (reference: README.md:15, "A Single Correspondence Is Enough"); it
    never measures this in-repo. Here each rate runs `n_trials` random
    problems (uniform yaw in [-180, 180), translation up to 5 m) through the
    vmapped batch solver in ONE device dispatch per rate.

    Returns {rate: {success_rate, median_rot_err_deg, median_trans_err_m,
    n_inliers}}.
    """
    import jax
    import jax.numpy as jnp
    from quatro_tpu.config import SolverConfig
    from quatro_tpu.io.synthetic import make_correspondences
    from quatro_tpu.solver.quatro import register_batch

    solver = (config.solver if config is not None else SolverConfig())
    outlier_rates = outlier_rates or [0.5, 0.8, 0.9, 0.95, 0.99]
    rng = np.random.default_rng(seed0)
    fn = jax.jit(lambda s, t, m: register_batch(s, t, m, solver))

    out = {}
    for rate in outlier_rates:
        n_in = max(3, int(round(n_corr * (1.0 - rate))))
        srcs, tgts, gts = [], [], []
        for k in range(n_trials):
            yaw = rng.uniform(-180.0, 180.0)
            tr = rng.uniform(-5.0, 5.0, 3)
            tr[2] = rng.uniform(-0.3, 0.3)
            s, t, gt, _ = make_correspondences(
                seed=seed0 + 7919 * k + int(1000 * rate), n_inliers=n_in,
                n_outliers=n_corr - n_in, yaw_deg=yaw,
                translation=tuple(tr), noise_std=noise_std)
            srcs.append(s)
            tgts.append(t)
            gts.append(gt)
        sol = fn(jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(tgts)),
                 jnp.ones((n_trials, n_corr), bool))
        jax.block_until_ready(sol.rotation)

        rots = np.asarray(sol.rotation)
        trans = np.asarray(sol.translation)
        rot_errs, trans_errs, succ = [], [], []
        for k in range(n_trials):
            T = np.eye(4, dtype=np.float64)
            T[:3, :3] = rots[k]
            T[:3, 3] = trans[k]
            rot_err, trans_err = _pose_error(T, gts[k])
            ok = (bool(np.asarray(sol.valid)[k]) and rot_err < rot_thresh_deg
                  and trans_err < trans_thresh_m)
            rot_errs.append(rot_err)
            trans_errs.append(trans_err)
            succ.append(ok)
        out[rate] = {
            "success_rate": round(float(np.mean(succ)), 4),
            "median_rot_err_deg": round(float(np.median(rot_errs)), 4),
            "median_trans_err_m": round(float(np.median(trans_errs)), 4),
            "n_inliers": n_in,
            "n_trials": n_trials,
        }
    return out
