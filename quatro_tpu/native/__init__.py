"""ctypes bindings for the native host-side data path.

Builds lazily with the system compiler on first import (cached as a .so in
this directory); all callers fall back to numpy implementations when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "quatro_native.c")
_SO = os.path.join(_DIR, "libquatro_native.so")

_lib = None


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            raise OSError("no working C compiler for quatro_native")
    lib = ctypes.CDLL(_SO)
    lib.quatro_load_kitti_bin.restype = ctypes.c_long
    lib.quatro_load_kitti_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.quatro_pack_batch.restype = ctypes.c_int
    lib.quatro_pack_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.quatro_loader_create.restype = ctypes.c_void_p
    lib.quatro_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int]
    lib.quatro_loader_next.restype = ctypes.c_long
    lib.quatro_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte)]
    lib.quatro_loader_stop.restype = None
    lib.quatro_loader_stop.argtypes = [ctypes.c_void_p]
    lib.quatro_loader_destroy.restype = None
    lib.quatro_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    """True iff the native library is built and loadable.

    Distinguishes "no toolchain / build failed" (permanent: callers should
    fall back to numpy) from per-file I/O errors (which the loaders raise
    loudly and must NOT disable the native path)."""
    try:
        _load()
        return True
    except OSError:
        return False


def load_kitti_bin(path: str) -> np.ndarray:
    """mmap-backed KITTI .bin load -> (N, 4) float32 (x, y, z, intensity)."""
    lib = _load()
    n = lib.quatro_load_kitti_bin(path.encode(), None, 0)
    if n < 0:
        raise IOError(f"failed to load {path}")
    out = np.empty((n, 4), np.float32)
    got = lib.quatro_load_kitti_bin(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got < 0:
        raise IOError(f"failed to read {path}")
    return out[:got]


def pack_batch(clouds, capacity: int, n_threads: int = 0):
    """Pack a list of (n_i, 3|4) float32 arrays into padded
    (B, capacity, 3) points + (B, capacity) bool mask, in parallel."""
    if n_threads <= 0:
        n_threads = min(len(clouds), os.cpu_count() or 1)
    lib = _load()
    b = len(clouds)
    clouds = [np.ascontiguousarray(c, np.float32) for c in clouds]
    stride = clouds[0].shape[1] if clouds else 3
    assert all(c.shape[1] == stride for c in clouds)
    ptrs = (ctypes.POINTER(ctypes.c_float) * b)(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for c in clouds])
    sizes = (ctypes.c_long * b)(*[c.shape[0] for c in clouds])
    out_points = np.empty((b, capacity, 3), np.float32)
    out_mask = np.empty((b, capacity), np.uint8)
    rc = lib.quatro_pack_batch(
        ptrs, sizes, b, stride, capacity,
        out_points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads)
    if rc != 0:
        raise RuntimeError("quatro_pack_batch failed")
    return out_points, out_mask.astype(bool)


class ScanLoader:
    """Async prefetching KITTI scan loader (native pthread ring buffer).

    Worker threads read + pad scans ahead of the consumer so host IO
    overlaps device compute — the streaming redesign of the reference's
    synchronous per-frame fread loop (reference:
    examples/run_global_registration.cpp:377-402). Yields
    (points (capacity, 3) f32, mask (capacity,) bool) in file order.

    Use as a context manager or iterator:

        with ScanLoader(paths, capacity=131072) as loader:
            for points, mask in loader:
                ...
    """

    def __init__(self, paths, capacity: int, n_workers: int = 4,
                 queue_depth: int = 8):
        import threading
        self._lib = _load()
        self._paths = [os.fspath(p) for p in paths]
        self.capacity = int(capacity)
        # close()/next() handshake: _cond guards _handle/_active/_closing;
        # a consumer may only enter the C call while registered in _active,
        # and close() quiesces (stop -> wait active==0) before destroy —
        # otherwise a consumer that read the handle but had not yet entered
        # C could call into freed memory.
        self._cond = threading.Condition()
        self._active = 0
        self._closing = False
        if not self._paths:  # empty sequence: a valid, exhausted iterator
            self._handle = None
            return
        arr = (ctypes.c_char_p * len(self._paths))(
            *[os.fsencode(p) for p in self._paths])
        self._handle = self._lib.quatro_loader_create(
            arr, len(self._paths), self.capacity, n_workers, queue_depth)
        if not self._handle:
            raise RuntimeError("quatro_loader_create failed")

    def __iter__(self):
        return self

    def __next__(self):
        with self._cond:
            if self._handle is None or self._closing:
                raise StopIteration
            self._active += 1
            handle = self._handle
        try:
            points = np.empty((self.capacity, 3), np.float32)
            mask = np.empty(self.capacity, np.uint8)
            n = self._lib.quatro_loader_next(
                handle,
                points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        finally:
            with self._cond:
                self._active -= 1
                self._cond.notify_all()
        if n == -2:
            raise StopIteration
        if n == -1:
            raise IOError("scan load failed (bad path or unreadable file)")
        return points, mask.astype(bool)

    def close(self):
        with self._cond:
            if self._handle is None:
                return
            if self._closing:
                # another close() owns the teardown: wait it out
                while self._handle is not None:
                    self._cond.wait()
                return
            self._closing = True
            handle = self._handle
        # 1) signal shutdown (unblocks consumers waiting inside C, and any
        #    consumer entering C after this sees the flag — memory is still
        #    alive), 2) quiesce Python-side consumers, 3) free.
        self._lib.quatro_loader_stop(handle)
        with self._cond:
            while self._active > 0:
                self._cond.wait()
            self._handle = None
            self._cond.notify_all()
        self._lib.quatro_loader_destroy(handle)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
