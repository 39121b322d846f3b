"""KITTI Velodyne ``.bin`` IO.

The reference reads float32 (x, y, z, intensity) quads with fread
(reference: examples/run_global_registration.cpp:377-402) and discards
intensity.  Here the fast path is the native C loader
(quatro_tpu/native); the numpy fallback is a single fromfile+reshape.
"""

from __future__ import annotations

import os

import numpy as np

try:  # optional native fast path
    from quatro_tpu.native import load_kitti_bin as _native_load
except Exception:  # pragma: no cover - native ext not built
    _native_load = None


_native_broken = False


def load_kitti_bin(path: str, with_intensity: bool = False) -> np.ndarray:
    """Load a KITTI .bin scan -> (N, 3) or (N, 4) float32 array."""
    global _native_broken
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    arr = None
    if _native_load is not None and not _native_broken:
        try:
            arr = _native_load(path)
        except (OSError, RuntimeError):
            # The native module imports lazily: the .so build/load is
            # deferred to first call, so a missing toolchain surfaces HERE,
            # not at import — fall back to numpy and stop retrying.
            _native_broken = True
    if arr is None:
        arr = np.fromfile(path, dtype=np.float32)
        arr = arr[: (arr.size // 4) * 4].reshape(-1, 4)
    return arr if with_intensity else arr[:, :3]


def save_kitti_bin(path: str, xyz: np.ndarray,
                   intensity: np.ndarray | None = None) -> None:
    """Write an (N,3) array (plus optional intensity) as a KITTI .bin."""
    xyz = np.asarray(xyz, dtype=np.float32).reshape(-1, 3)
    if intensity is None:
        intensity = np.zeros((xyz.shape[0],), dtype=np.float32)
    out = np.concatenate([xyz, np.asarray(intensity, np.float32).reshape(-1, 1)],
                         axis=1)
    out.astype(np.float32).tofile(path)
