"""IO tests: KITTI .bin roundtrip (numpy + native paths), batch packing,
PLY export, odometry feature cache."""

import os

import numpy as np
import pytest

from quatro_tpu.io.kitti import load_kitti_bin, save_kitti_bin
from quatro_tpu.io.ply import save_correspondences_ply, save_ply


def test_kitti_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    inten = rng.random(1000).astype(np.float32)
    path = str(tmp_path / "scan.bin")
    save_kitti_bin(path, xyz, inten)
    back = load_kitti_bin(path)
    np.testing.assert_allclose(back, xyz, atol=0)
    back4 = load_kitti_bin(path, with_intensity=True)
    np.testing.assert_allclose(back4[:, 3], inten, atol=0)


def test_native_loader_matches_numpy(tmp_path, rng):
    native = pytest.importorskip("quatro_tpu.native")
    try:
        native._load()
    except OSError:
        pytest.skip("no C toolchain")
    xyz = rng.normal(size=(4321, 3)).astype(np.float32)
    path = str(tmp_path / "scan.bin")
    save_kitti_bin(path, xyz)
    got = native.load_kitti_bin(path)
    assert got.shape == (4321, 4)
    np.testing.assert_allclose(got[:, :3], xyz, atol=0)


def test_kitti_empty_file_and_per_file_errors(tmp_path, rng):
    """An empty .bin is a 0-point cloud on both backends; a per-file load
    failure raises loudly and must NOT disable the native fast path for
    subsequent good files (only a missing toolchain does)."""
    import quatro_tpu.io.kitti as kitti

    empty = str(tmp_path / "empty.bin")
    open(empty, "wb").close()
    assert load_kitti_bin(empty).shape == (0, 3)
    assert load_kitti_bin(empty, with_intensity=True).shape == (0, 4)

    # A directory exists and is non-empty by size but cannot be loaded:
    # both the native mmap and np.fromfile raise.
    with pytest.raises((IOError, OSError)):
        load_kitti_bin(str(tmp_path))

    # The failure above must not have poisoned the loader.
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    good = str(tmp_path / "good.bin")
    save_kitti_bin(good, xyz)
    np.testing.assert_allclose(load_kitti_bin(good), xyz, atol=0)
    try:
        from quatro_tpu import native
        native_works = native.available()
    except Exception:
        native_works = False
    if native_works:
        assert kitti._native_ready(), \
            "per-file error wrongly disabled the native path"


def test_native_empty_batch_and_empty_bin(tmp_path):
    """pack_batch([]) must return an empty batch (the C side divided by
    zero and killed the process); a 0-byte .bin is a legitimate 0-point
    scan on the native path too (mmap(0) is EINVAL and returned -1)."""
    native = pytest.importorskip("quatro_tpu.native")
    try:
        native._load()
    except OSError:
        pytest.skip("no C toolchain")
    pts, mask = native.pack_batch([], capacity=16)
    assert pts.shape == (0, 16, 3) and mask.shape == (0, 16)

    empty = str(tmp_path / "e.bin")
    open(empty, "wb").close()
    out = native.load_kitti_bin(empty)
    assert out.shape == (0, 4)


def test_native_pack_batch(rng):
    native = pytest.importorskip("quatro_tpu.native")
    try:
        native._load()
    except OSError:
        pytest.skip("no C toolchain")
    clouds = [rng.normal(size=(n, 4)).astype(np.float32)
              for n in (10, 300, 0, 150)]
    pts, mask = native.pack_batch(clouds, capacity=200)
    assert pts.shape == (4, 200, 3) and mask.shape == (4, 200)
    assert mask.sum(1).tolist() == [10, 200, 0, 150]
    np.testing.assert_allclose(pts[0, :10], clouds[0][:10, :3])
    np.testing.assert_allclose(pts[1, :200], clouds[1][:200, :3])
    assert (pts[0, 10:] == 0).all()


def test_ply_export(tmp_path, rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    p1 = str(tmp_path / "cloud.ply")
    save_ply(p1, xyz, color=(255, 0, 0))
    data = open(p1, "rb").read()
    assert b"element vertex 50" in data
    p2 = str(tmp_path / "corr.ply")
    save_correspondences_ply(p2, xyz, xyz + 1.0,
                             mask=np.arange(50) % 2 == 0)
    data = open(p2, "rb").read()
    assert b"element vertex 50" in data and b"element edge 25" in data


def _native_or_skip():
    native = pytest.importorskip("quatro_tpu.native")
    try:
        native._load()
    except OSError:
        pytest.skip("no C toolchain")
    return native


def test_scan_loader_streams_in_order(tmp_path, rng):
    native = _native_or_skip()
    n_files, cap = 12, 256
    paths, refs = [], []
    for i in range(n_files):
        n = int(rng.integers(10, 300))  # some exceed capacity -> truncated
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        save_kitti_bin(p, xyz)
        paths.append(p)
        refs.append(xyz)

    # small queue + several workers stresses the ring-slot reuse protocol
    with native.ScanLoader(paths, capacity=cap, n_workers=4,
                           queue_depth=3) as loader:
        got = list(loader)
    assert len(got) == n_files
    for (pts, mask), ref in zip(got, refs):
        n = min(len(ref), cap)
        assert mask.sum() == n
        np.testing.assert_allclose(pts[:n], ref[:n], atol=0)
        assert not mask[n:].any()
        np.testing.assert_allclose(pts[n:], 0.0, atol=0)


def test_scan_loader_bad_file_and_early_close(tmp_path, rng):
    native = _native_or_skip()
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    good = str(tmp_path / "good.bin")
    save_kitti_bin(good, xyz)
    paths = [good, str(tmp_path / "missing.bin"), good]
    loader = native.ScanLoader(paths, capacity=64, n_workers=2)
    pts, mask = next(loader)
    assert mask.sum() == 50
    with pytest.raises(IOError):
        next(loader)
    # recoverable: the sequence continues past the bad file
    pts, mask = next(loader)
    assert mask.sum() == 50
    loader.close()   # idempotent
    loader.close()
    with pytest.raises(StopIteration):
        next(loader)


def test_scan_loader_close_while_pending(tmp_path, rng):
    # destroying with scans still queued must not deadlock or crash
    native = _native_or_skip()
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    paths = []
    for i in range(20):
        p = str(tmp_path / f"{i}.bin")
        save_kitti_bin(p, xyz)
        paths.append(p)
    loader = native.ScanLoader(paths, capacity=512, n_workers=4,
                               queue_depth=4)
    next(loader)
    loader.close()


def test_scan_loader_empty_file_and_empty_list(tmp_path, rng):
    native = _native_or_skip()
    # 0-byte scan is a legitimate empty frame, not an error
    empty = str(tmp_path / "empty.bin")
    open(empty, "wb").close()
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    good = str(tmp_path / "good.bin")
    save_kitti_bin(good, xyz)
    with native.ScanLoader([empty, good], capacity=32) as loader:
        pts, mask = next(loader)
        assert mask.sum() == 0
        pts, mask = next(loader)
        assert mask.sum() == 10
    # empty path list: valid exhausted iterator
    assert list(native.ScanLoader([], capacity=32)) == []


def test_scan_loader_destroy_races_blocked_next(tmp_path, rng):
    # close() from another thread while next() blocks must unblock it
    # with StopIteration, not crash (use-after-free regression test)
    import threading
    import time
    native = _native_or_skip()
    fifo = str(tmp_path / "slow.bin")
    os.mkfifo(fifo)  # open() blocks until a writer appears -> worker stalls
    loader = native.ScanLoader([fifo], capacity=32, n_workers=1)
    got = []

    def consume():
        try:
            next(loader)
            got.append("item")
        except (StopIteration, IOError):
            got.append("stopped")

    t = threading.Thread(target=consume)
    t.start()
    time.sleep(0.3)
    # unblock by closing: destroy must wait for the consumer, then free
    closer = threading.Thread(target=loader.close)
    closer.start()
    with open(fifo, "wb") as f:  # release the stalled worker's open()
        f.write(b"")
    t.join(timeout=10)
    closer.join(timeout=10)
    assert not t.is_alive() and not closer.is_alive()
    # Two legal orderings: close() wins the race -> the consumer stops; the
    # fifo release wins -> the worker legitimately delivers the (empty)
    # scan before shutdown. The invariant under test is no crash, no hang,
    # no use-after-free — not which side wins.
    assert got in (["stopped"], ["item"])
