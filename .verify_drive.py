"""End-to-end /verify drive: full pipeline on the real TPU, known GT."""
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
from quatro_tpu.config import FPFHConfig, PipelineConfig
from quatro_tpu.io.synthetic import make_scan_pair
from quatro_tpu.pipeline import register_scan_pair
from quatro_tpu.types import PointBatch

print("device:", jax.devices()[0], flush=True)
cfg = PipelineConfig(max_raw_points=131072, max_voxels=8192,
                     fpfh=FPFHConfig(max_correspondences=1024))
a, b, gt = make_scan_pair(seed=3, yaw_deg=47.0, translation=(3.0, -1.5, 0.05),
                          cache_dir="/root/repo/.scan_cache")
src = PointBatch.from_numpy(a, 131072)
tgt = PointBatch.from_numpy(b, 131072)
print(f"scans ready (+{time.time()-t0:.0f}s), compiling...", flush=True)
res = register_scan_pair(src, tgt, cfg)
T = np.asarray(res.solution.transform())
valid = bool(res.solution.valid)
rot_err = np.degrees(np.arccos(np.clip(
    (np.trace(T[:3, :3] @ gt[:3, :3].T) - 1) / 2, -1, 1)))
tr_err = float(np.linalg.norm(T[:3, 3] - gt[:3, 3]))
print(f"valid={valid} rot_err={rot_err:.3f} deg trans_err={tr_err:.3f} m "
      f"(+{time.time()-t0:.0f}s)", flush=True)

# junk probe: all-False mask must stay finite and invalid
z = PointBatch(jnp.zeros((131072, 3), jnp.float32),
               jnp.zeros((131072,), bool))
rz = register_scan_pair(z, z, cfg)
print("junk: valid=", bool(rz.solution.valid),
      "finite=", bool(np.isfinite(np.asarray(rz.solution.transform())).all()),
      flush=True)
ok = valid and rot_err < 5.0 and tr_err < 2.0 and not bool(rz.solution.valid)
print("VERIFY_RESULT", "PASS" if ok else "FAIL", flush=True)
