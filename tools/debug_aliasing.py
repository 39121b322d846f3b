"""Reproduce + dissect the persistent planar-aliasing eval failures.

The level-world loop-closure eval fails on seeds 14 and 16 at every
hypothesis count tried (K=4 and K=8 give the same failures — RESULTS.md):
the correct clique is NOT among the top K, so clique size as the only
hypothesis generator cannot recover them. This tool reproduces those pairs
(CPU by default, fast enough at n=2) and reports, per pair:

  - GT yaw/translation vs every hypothesis' solved pose and overlap score
  - whether the GT-consistent correspondences (inliers under GT within
    2x noise_bound) form a consistency-graph clique, and its size vs the
    winning clique
  - the translation-vote spectrum at the winning hypothesis' yaw (the
    proposed clique-independent recovery signal)

Usage: python tools/debug_aliasing.py [--seeds 14 16] [--tpu] [--k 4]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[14, 16])
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--n-pairs", type=int, default=50,
                    help="regenerate the eval case list at this length")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quatro_tpu.config import FPFHConfig, PipelineConfig, SolverConfig
    from quatro_tpu.eval import _pose_error
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch
    from quatro_tpu.solver.quatro import register_hypotheses
    from quatro_tpu.solver.scale import tim_consistency_graph
    from quatro_tpu.solver.verify import alignment_overlap

    # Regenerate the exact eval cases (eval.py uses one rng stream).
    rng = np.random.default_rng(0)
    cases = {}
    for k in range(args.n_pairs):
        yaw = rng.uniform(-180.0, 180.0)
        t = rng.uniform(-5.0, 5.0, 3)
        t[2] = rng.uniform(-0.3, 0.3)
        cases[k] = (yaw, t)

    config = PipelineConfig(max_voxels=8192,
                            solver=SolverConfig(num_hypotheses=args.k))
    cap = 131072

    for sd in args.seeds:
        yaw, tr = cases[sd]
        src_xyz, tgt_xyz, gt = make_scan_pair(
            seed=sd, yaw_deg=yaw, translation=tuple(tr),
            lidar=config.lidar, cache_dir="/root/repo/.scan_cache")
        out = register_scan_pair(PointBatch.from_numpy(src_xyz, cap),
                                 PointBatch.from_numpy(tgt_xyz, cap), config)
        T = np.asarray(out.solution.transform())
        rot_err, trans_err = _pose_error(T, gt)
        print(f"\n=== seed {sd}: gt yaw {yaw:.1f} deg, gt t {tr.round(2)} ===")
        print(f"pipeline pose err: {rot_err:.3f} deg / {trans_err:.3f} m "
              f"valid={bool(out.solution.valid)}")

        corr = out.correspondences
        src_c = np.asarray(corr.src_xyz)
        tgt_c = np.asarray(corr.tgt_xyz)
        msk = np.asarray(corr.mask)
        n = int(msk.sum())
        # GT-consistent correspondences
        R_gt, t_gt = gt[:3, :3], gt[:3, 3]
        res = np.linalg.norm((src_c @ R_gt.T + t_gt) - tgt_c, axis=1)
        nb = config.solver.noise_bound
        gt_in = msk & (res < 2 * nb)
        print(f"correspondences: {n}; GT-consistent (2*nb): {gt_in.sum()}")

        # All hypotheses' poses + overlaps
        sols = register_hypotheses(corr.src_xyz, corr.tgt_xyz, corr.mask,
                                   config.solver, k=args.k)
        vox_s, vox_t = out.src_voxels, out.tgt_voxels
        for h in range(args.k):
            Rh = np.asarray(sols.rotation[h])
            th = np.asarray(sols.translation[h])
            Th = np.eye(4); Th[:3, :3] = Rh; Th[:3, 3] = th
            re, te = _pose_error(Th, gt)
            ov = float(alignment_overlap(
                vox_s.points, vox_s.mask, vox_t.points, vox_t.mask,
                sols.rotation[h], sols.translation[h],
                2.0 * config.voxel_size))
            csz = int(np.asarray(sols.max_clique_mask[h]).sum())
            print(f"  hyp {h}: clique {csz:4d}  err {re:7.3f} deg /"
                  f" {te:6.2f} m  overlap {ov:.3f}")

        # Does the GT-inlier set form a clique in the consistency graph?
        adj = np.asarray(tim_consistency_graph(
            corr.src_xyz, corr.tgt_xyz, corr.mask, nb,
            config.solver.cbar2, use_pallas=False))
        gi = np.where(gt_in)[0]
        sub = adj[np.ix_(gi, gi)]
        np.fill_diagonal(sub, True)
        print(f"GT-inlier subgraph: {len(gi)} vertices, "
              f"edge density {sub.mean():.2f} "
              f"(min degree {sub.sum(0).min() - 1 if len(gi) else 0})")

        # Translation-vote spectrum at the winning hypothesis' yaw
        best = int(np.argmax(np.where(np.asarray(sols.valid),
                                      [float(alignment_overlap(
                                          vox_s.points, vox_s.mask,
                                          vox_t.points, vox_t.mask,
                                          sols.rotation[h],
                                          sols.translation[h],
                                          2 * config.voxel_size))
                                       for h in range(args.k)], -1.0)))
        R0 = np.asarray(sols.rotation[best])
        tv = tgt_c - src_c @ R0.T           # per-correspondence translation
        tv = tv[msk]
        binsz = max(2 * nb, 0.5)
        q = np.floor(tv / binsz).astype(int)
        keys, counts = np.unique(q, axis=0, return_counts=True)
        order = np.argsort(-counts)[:8]
        print(f"translation votes at best-hyp yaw (bin {binsz} m):")
        t_gt_rot = t_gt  # GT translation for reference
        for o in order:
            c = (keys[o] + 0.5) * binsz
            print(f"  bin center {np.round(c, 2)}  votes {counts[o]:4d}"
                  f"  |c - t_gt| = {np.linalg.norm(c - t_gt_rot):.2f} m")
        # also at GT yaw
        tvg = (tgt_c - src_c @ R_gt.T)[msk]
        qg = np.floor(tvg / binsz).astype(int)
        keysg, countsg = np.unique(qg, axis=0, return_counts=True)
        og = np.argsort(-countsg)[:8]
        print("translation votes at GT yaw:")
        for o in og:
            c = (keysg[o] + 0.5) * binsz
            print(f"  bin center {np.round(c, 2)}  votes {countsg[o]:4d}"
                  f"  |c - t_gt| = {np.linalg.norm(c - t_gt_rot):.2f} m")


if __name__ == "__main__":
    main()
