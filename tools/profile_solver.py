"""Sub-stage attribution for the solver + matcher (round 5).

The round-5 budget table puts solver at 1.45 ms/pair and match at
1.05 ms/pair (batch 64) — together ~20% of the pipeline. This times the
pieces INSIDE those stages on the real chip with the chained-carry
methodology of tools/device_budget.py: consistency graph, clique
selection, GNC rotation, COTE translation, the NN passes, and the full
stages, so the op-count attack targets measured cost.

Usage: python tools/profile_solver.py [--batch 64] [--stages a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_T0 = time.time()


def _log(msg):
    print(f"[prof-solver +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    fix = os.path.join(ROOT, ".scan_cache",
                       "budget_B64_P131072_V8192_C1024.npz")
    z = np.load(fix)
    n_distinct = z["cs"].shape[0]

    import jax
    import jax.numpy as jnp

    from quatro_tpu.config import SolverConfig
    from quatro_tpu.ops.matching import match_features, _nearest_neighbors
    from quatro_tpu.solver import clique as clique_mod
    from quatro_tpu.solver import rotation as rot_mod
    from quatro_tpu.solver import translation as trans_mod
    from quatro_tpu.solver.quatro import (register_correspondences,
                                          _chain_order)
    from quatro_tpu.solver.scale import tim_consistency_graph
    from quatro_tpu.solver.vote import vote_hypotheses
    from quatro_tpu.solver.verify import alignment_overlap

    cfg = SolverConfig()
    B = args.batch
    _log(f"device: {jax.devices()[0]}")

    def tile(key):
        arr = z[key]
        reps = (B + n_distinct - 1) // n_distinct
        return jnp.asarray(np.tile(arr, (reps,) + (1,) * (arr.ndim - 1))[:B])

    cs, ct, cm = tile("cs"), tile("ct"), tile("cm")
    vox_s, voxm_s = tile("vox_s"), tile("voxm_s")
    vox_t, voxm_t = tile("vox_t"), tile("voxm_t")
    desc_s, desc_t = tile("desc_s"), tile("desc_t")
    dm_s, dm_t = tile("dm_s"), tile("dm_t")

    # precomputed per-pair graph + clique for downstream stages
    graph_b = jax.jit(jax.vmap(
        lambda s, t, m: tim_consistency_graph(s, t, m, cfg.noise_bound,
                                              cfg.cbar2)))
    adj = graph_b(cs, ct, cm)
    sel_b = jax.jit(jax.vmap(
        lambda a, m: clique_mod.select_inliers(
            a, m, num_seeds=cfg.clique_num_seeds,
            swap_rounds=cfg.clique_swap_rounds)[0]))
    sel = sel_b(adj, cm)
    jax.block_until_ready(sel)

    def chain_tims(s, t, selm):
        order, leaf, chain_mask, _ = _chain_order(selm)
        f = chain_mask.astype(s.dtype)[:, None]
        return (s[leaf] - s[order]) * f, (t[leaf] - t[order]) * f, chain_mask

    ptims = jax.jit(jax.vmap(chain_tims))(cs, ct, sel)
    jax.block_until_ready(ptims)

    stages = {
        "graph": ((cs, ct, cm),
                  lambda s, t, m: tim_consistency_graph(
                      s, t, m, cfg.noise_bound, cfg.cbar2).sum(1)
                  .astype(jnp.float32)),
        "clique_select": ((adj, cm),
                          lambda a, m: clique_mod.select_inliers(
                              a, m, num_seeds=cfg.clique_num_seeds,
                              swap_rounds=cfg.clique_swap_rounds)[0]
                          .astype(jnp.float32)),
        "kcore": ((adj, cm),
                  lambda a, m: clique_mod.max_kcore(a, m)[1]
                  .astype(jnp.float32)),
        "grow": ((adj, cm),
                 lambda a, m: clique_mod.grow_greedy_cliques(
                     a, jnp.sum(a & m[None, :], 1).astype(jnp.float32), m,
                     num_seeds=cfg.clique_num_seeds).astype(jnp.float32)),
        "improve": ((adj, cm),
                    lambda a, m: clique_mod.improve_top_cliques(
                        a, (a & m[None, :])[:16], m,
                        rounds=cfg.clique_swap_rounds).astype(jnp.float32)),
        "gnc_rotation": (ptims,
                         lambda st, dt_, m: rot_mod.gnc_rotation_2d(
                             st[:, :2], dt_[:, :2], m,
                             cfg.noise_bound * cfg.rotation_noise_bound_scale,
                             cfg.rotation_gnc_factor,
                             cfg.rotation_max_iterations,
                             cfg.rotation_cost_threshold).rotation),
        "cote": ((cs, ct, sel),
                 lambda s, t, m: trans_mod.solve_translation(
                     s, t, m, cfg.noise_bound * cfg.cote_noise_bound_coeff,
                     cfg.cbar2, use_median=True).translation),
        "vote_gen": ((cs, ct, cm, adj),
                     lambda s, t, m, a: vote_hypotheses(
                         s, t, m, a, jnp.asarray(1.0, s.dtype), 2,
                         bin_m=2.5 * cfg.noise_bound)[0]
                     .astype(jnp.float32)),
        "overlap_1hyp": ((vox_s, voxm_s, vox_t, voxm_t),
                         lambda s, sm, t, tm: alignment_overlap(
                             s[::4], sm[::4], t, tm,
                             jnp.eye(3, dtype=s.dtype),
                             jnp.zeros(3, s.dtype), 0.6)),
        "solver_full": ((cs, ct, cm),
                        lambda s, t, m: register_correspondences(
                            s, t, m, cfg).rotation),
        "nn_pass": ((desc_s, desc_t, dm_s, dm_t),
                    lambda a, b, ma, mb: _nearest_neighbors(a, b, ma, mb)[1]),
        "match_full": ((vox_s, vox_t, desc_s, desc_t, dm_s, dm_t),
                       lambda sp, tp, sd, td, sm, tm: match_features(
                           sp, tp, sd, td, sm, tm, capacity=1024).src_xyz),
    }

    only = None if args.stages == "all" else set(args.stages.split(","))
    rows = []
    for name, (inputs, fn) in stages.items():
        if only and name not in only:
            continue

        def body(carry, *inp):
            eps = jnp.where(jnp.isnan(carry), 1.0, 0.0)
            first = inp[0]
            perturbed = (first + eps.astype(first.dtype)
                         if jnp.issubdtype(first.dtype, jnp.floating)
                         else first)
            out = jax.vmap(fn)(perturbed, *inp[1:])
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-9

        f = jax.jit(body)
        _log(f"compiling '{name}'...")
        c0 = jnp.zeros((), jnp.float32)
        w = f(c0, *inputs)
        float(np.asarray(w))
        best = None
        for _ in range(args.trials):
            t0 = time.perf_counter()
            c = c0
            for _ in range(args.calls):
                c = f(c, *inputs)
            float(np.asarray(c))
            dt = (time.perf_counter() - t0) / args.calls
            best = dt if best is None else min(best, dt)
        ms_item = best * 1e3 / B
        rows.append({"stage": name, "ms_per_call": round(best * 1e3, 3),
                     "ms_per_item": round(ms_item, 4)})
        _log(f"{name}: {ms_item:.4f} ms/item")

    print(json.dumps({"batch": B, "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
