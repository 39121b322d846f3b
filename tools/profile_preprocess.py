"""Sub-stage attribution for the preprocess + voxel hot spots (round 3).

The round-3 'before' device budget (RESULTS.md) showed preprocess at
153 ms/pair (41 GB/pair) and voxel at 19 ms/pair — 95% of the pipeline.
This tool times the pieces INSIDE those stages on the real chip with the
same chained-carry methodology as tools/device_budget.py, so the redesign
targets measured traffic, not guesses.

Usage: python tools/profile_preprocess.py [--batch 8] [--calls 4]
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
    print(f"[prof +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    fix = os.path.join(ROOT, ".scan_cache",
                       "budget_B64_P131072_V8192_C1024.npz")
    z = np.load(fix)
    n_distinct = z["raw_s"].shape[0]

    import jax
    import jax.numpy as jnp

    from quatro_tpu.config import PipelineConfig
    from quatro_tpu.preprocessing.patchwork import estimate_ground
    from quatro_tpu.preprocessing.projection import (label_components,
                                                     project_to_range_image,
                                                     segment_cloud)
    from quatro_tpu.ops.voxel import voxel_downsample

    cfg = PipelineConfig()
    _log(f"device: {jax.devices()[0]}")

    def tile(key):
        arr = z[key]
        reps = [arr[i % n_distinct] for i in range(args.batch)]
        return jnp.asarray(np.stack(reps))

    raw, rawm = tile("raw_s"), tile("rawm_s")
    seg = tile("seg_s")

    # Precompute one (batch,) range image set for label_components isolation.
    def proj_only(p, m):
        row, col, rng, ok, _flat, rimg, owner = project_to_range_image(
            p, m, cfg.lidar, cfg.projection.min_range)
        return rimg, owner >= 0

    rimg_b, occ_b = jax.jit(jax.vmap(proj_only))(raw, seg)
    rimg_b = jax.device_get(rimg_b)
    occ_b = jax.device_get(occ_b)
    rimg_b, occ_b = jnp.asarray(rimg_b), jnp.asarray(occ_b)

    def _micro_sort5(p, m):
        n = p.shape[0]
        key = jnp.where(m, (p[:, 2] * 1000).astype(jnp.int32), 2**30)
        return jax.lax.sort((key, p[:, 0], p[:, 1], p[:, 2],
                             jnp.arange(n, dtype=jnp.int32)), num_keys=1)

    def _micro_scatter3(p, m):
        n = p.shape[0]
        slot = jnp.where(m, jnp.arange(n, dtype=jnp.int32) * 4 % (4 * n),
                         4 * n)
        def tab(v):
            return jnp.zeros((4 * n + 1,), p.dtype).at[slot].set(v)[:-1]
        return tab(p[:, 0]), tab(p[:, 1]), tab(p[:, 2])

    def _micro_ffill6(p, m):
        from quatro_tpu.preprocessing.patchwork import _forward_fill
        has = m & (jnp.arange(p.shape[0]) % 17 == 0)
        ch = (p[:, 0], p[:, 1], p[:, 2], p[:, 0] + 1.0,
              (p[:, 1] > 0).astype(jnp.int32))
        return _forward_fill(has, ch)

    stages = {
        "patchwork": ((raw, rawm),
                      lambda p, m: estimate_ground(p, m, cfg.patchwork)),
        "projection_full": ((raw, seg),
                            lambda p, m: segment_cloud(
                                p, m, cfg.lidar, cfg.projection,
                                ground_mode="Patchwork")),
        "project_image": ((raw, seg), proj_only),
        "label_components": ((rimg_b, occ_b),
                             lambda r, v: label_components(
                                 r, v, cfg.lidar, cfg.projection)),
        "argsort_gather": ((raw, rawm),
                           lambda p, m: p[jnp.argsort(
                               jnp.where(m, p[:, 2], jnp.inf))]),
        "voxel": ((raw, seg),
                  lambda p, m: voxel_downsample(p, m, cfg.voxel_size,
                                                cfg.max_voxels)),
        # micro-benchmarks attributing the rewritten patchwork's cost:
        # the 5-operand sorting network, the 3 N-sized table scatters,
        # and the 6-channel forward-fill scan.
        "micro_sort5": ((raw, rawm), _micro_sort5),
        "micro_scatter3": ((raw, rawm), _micro_scatter3),
        "micro_ffill6": ((raw, rawm), _micro_ffill6),
    }
    wanted = list(stages) if args.stages == "all" else args.stages.split(",")

    def chained(step):
        def fn(carry, *inputs):
            eps = jnp.where(jnp.isnan(carry), 1.0, 0.0)
            first, rest = inputs[0], inputs[1:]
            if jnp.issubdtype(first.dtype, jnp.floating):
                first = first + eps.astype(first.dtype)
            out = jax.vmap(step)(first, *rest)
            s = sum(jnp.sum(jnp.asarray(l, jnp.float32))
                    for l in jax.tree.leaves(out))
            return carry + s * 1e-30
        return fn

    rows = []
    for name in wanted:
        inputs, step = stages[name]
        fn = jax.jit(chained(step))
        _log(f"compiling '{name}'...")
        compiled = fn.lower(jnp.zeros((), jnp.float32), *inputs).compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        except Exception:
            gb = 0.0
        c = compiled(jnp.zeros((), jnp.float32), *inputs)
        float(np.asarray(c))
        times = []
        for _ in range(args.trials):
            c = jnp.zeros((), jnp.float32)
            t0 = time.time()
            for _ in range(args.calls):
                c = compiled(c, *inputs)
            float(np.asarray(c))
            times.append((time.time() - t0) / args.calls)
        dt = float(np.median(times))
        rows.append({"stage": name, "ms_per_item": round(dt * 1e3 / args.batch, 3),
                     "GB_per_item": round(gb / args.batch, 3)})
        _log(f"{name}: {dt * 1e3 / args.batch:.3f} ms/item, "
             f"{gb / args.batch:.2f} GB/item")

    print(json.dumps({"batch": args.batch, "rows": rows}, indent=1),
          flush=True)


if __name__ == "__main__":
    main()
