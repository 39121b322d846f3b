"""On-chip validation + timing of the fused Pallas front-end kernels.

Compares the Mosaic-compiled kernels (ops/pallas_frontend.py) against the
XLA dense formulation on the REAL device at production shape (V=8192), then
times both with the chained-carry methodology. Interpret-mode equivalence
already holds (tests/test_pallas_frontend.py); this checks the actual TPU
lowering (precision, tiling) and measures the win.

Usage: python tools/check_pallas_frontend.py [--voxels 8192] [--batch 8]
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
    print(f"[check +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calls", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from quatro_tpu.config import PipelineConfig
    from quatro_tpu.ops.dense_features import dense_fpfh, dense_normals
    from quatro_tpu.ops.pallas_frontend import (frontend_fpfh,
                                                frontend_normals,
                                                nearest_neighbors_pallas)
    from quatro_tpu.ops.matching import _nearest_neighbors

    cfg = PipelineConfig()
    fix = os.path.join(ROOT, ".scan_cache",
                       "budget_B64_P131072_V8192_C1024.npz")
    z = np.load(fix)
    v = args.voxels
    vox = jnp.asarray(z["vox_s"][0][:v])
    vm = jnp.asarray(z["voxm_s"][0][:v])
    _log(f"device: {jax.devices()[0]}; cloud {int(vm.sum())}/{v} voxels")

    report = {}

    # --- correctness on chip ------------------------------------------------
    nr, fr = cfg.fpfh.normal_radius, cfg.fpfh.fpfh_radius
    dn = dense_normals(vox, vm, nr)
    pn = frontend_normals(vox, vm, nr)
    nrm_ok = bool(jnp.all(dn.valid == pn.valid))
    nrm_err = float(jnp.max(jnp.abs(dn.normals - pn.normals)))
    _log(f"normals: valid match={nrm_ok}, max|dn-pn|={nrm_err:.2e}")

    dd = dense_fpfh(vox, dn.normals, dn.valid, vm, fr)
    pd = frontend_fpfh(vox, pn.normals, pn.valid, vm, fr)
    fp_err = float(jnp.max(jnp.abs(dd - pd)))
    fp_mean = float(jnp.mean(jnp.abs(dd - pd)))
    _log(f"fpfh: max|dd-pd|={fp_err:.3f}, mean={fp_mean:.4f} "
         "(bins normalized to sum 100)")

    ri, rd = _nearest_neighbors(dd, dd, vm, vm)
    pi_, pd2 = nearest_neighbors_pallas(jnp.asarray(dd), jnp.asarray(dd),
                                        vm, vm)
    nn_agree = float(jnp.mean((ri == pi_) | ~vm))
    _log(f"nn: index agreement {nn_agree:.4f}")

    report["normals_valid_match"] = nrm_ok
    report["normals_max_abs_err"] = nrm_err
    report["fpfh_max_abs_err"] = fp_err
    report["nn_index_agreement"] = nn_agree

    # --- chained timing (batched) -------------------------------------------
    vb = jnp.stack([vox] * args.batch)
    mb = jnp.stack([vm] * args.batch)

    def timed(name, fn):
        def chained(carry, p, m):
            eps = jnp.where(jnp.isnan(carry), 1.0, 0.0).astype(p.dtype)
            out = jax.vmap(fn)(p + eps, m)
            s = sum(jnp.sum(jnp.asarray(l, jnp.float32))
                    for l in jax.tree.leaves(out))
            return carry + s * 1e-30
        f = jax.jit(chained)
        _log(f"compiling {name}...")
        compiled = f.lower(jnp.zeros((), jnp.float32), vb, mb).compile()
        c = compiled(jnp.zeros((), jnp.float32), vb, mb)
        float(np.asarray(c))
        t0 = time.time()
        c = jnp.zeros((), jnp.float32)
        for _ in range(args.calls):
            c = compiled(c, vb, mb)
        float(np.asarray(c))
        dt = (time.time() - t0) / args.calls / args.batch
        _log(f"{name}: {dt * 1e3:.3f} ms/item")
        return dt * 1e3

    def full_dense(p, m):
        nn = dense_normals(p, m, nr)
        return dense_fpfh(p, nn.normals, nn.valid, m, fr)

    def full_pallas(p, m):
        nn = frontend_normals(p, m, nr)
        return frontend_fpfh(p, nn.normals, nn.valid, m, fr)

    report["dense_ms_per_cloud"] = timed("dense normals+fpfh", full_dense)
    report["pallas_ms_per_cloud"] = timed("pallas normals+fpfh", full_pallas)

    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
