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


_native_ok: bool | None = None  # tri-state: unknown / usable / unavailable


def _native_ready() -> bool:
    """Probe the native library ONCE (its .so builds lazily, so a missing
    toolchain surfaces at first call, not at import). Only library-level
    failure disables the fast path; per-file I/O errors propagate loudly
    and never poison subsequent loads."""
    global _native_ok
    if _native_ok is None:
        if _native_load is None:
            _native_ok = False
        else:
            from quatro_tpu import native as _native_mod
            _native_ok = _native_mod.available()
    return _native_ok


def load_kitti_bin(path: str, with_intensity: bool = False) -> np.ndarray:
    """Load a KITTI .bin scan -> (N, 3) or (N, 4) float32 array."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if os.path.getsize(path) == 0:
        # Empty scan file: both backends agree it is a 0-point cloud (the
        # native mmap path cannot map 0 bytes and would raise).
        arr = np.zeros((0, 4), np.float32)
    elif _native_ready():
        arr = _native_load(path)
    else:
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
