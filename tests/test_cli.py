"""CLI smoke tests: the reference-demo entry point end-to-end
(replaces `roslaunch quatro quatro.launch`, reference README.md:126-132)."""

import json
import os

import numpy as np
import pytest

from quatro_tpu.cli import main


@pytest.mark.slow
def test_cli_register_synthetic_with_dumps(tmp_path, capsys):
    rc = main(["register", "--synthetic", "--seed", "11",
               "--max-raw-points", "131072", "--max-voxels", "8192",
               "--dump-dir", str(tmp_path), "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    # stage table + transform printed (run_global_registration.cpp:168-236)
    assert "# of raw cloud" in out and "estimated transform" in out
    # machine-readable result line
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["valid"] is True
    T = np.asarray(res["transform"])
    assert T.shape == (4, 4)

    # every rviz-equivalent artifact exists and is non-trivial
    for name in ("source.ply", "target.ply", "aligned.ply",
                 "correspondences.ply", "max_clique_source.ply",
                 "max_clique_target.ply", "final_inliers.ply"):
        p = tmp_path / name
        assert p.exists(), name
        assert p.stat().st_size > 100, name
    # Patchwork diagnostics (/ground_seg, /revert_pc, /reject_pc): present,
    # possibly empty clouds (a clean scene reverts/rejects nothing)
    for name in ("ground_source.ply", "revert_pc.ply", "reject_pc.ply"):
        assert (tmp_path / name).exists(), name
    assert (tmp_path / "ground_source.ply").stat().st_size > 100


@pytest.mark.slow
def test_cli_register_kitti_bins(tmp_path, capsys):
    """Feed .bin files through the native loader path."""
    from quatro_tpu.io.synthetic import make_scan_pair

    src_xyz, tgt_xyz, _ = make_scan_pair(
        seed=11, yaw_deg=25.0, translation=(3.0, 1.5, 0.05),
        cache_dir="/root/repo/.scan_cache")
    for name, xyz in (("a.bin", src_xyz), ("b.bin", tgt_xyz)):
        quads = np.zeros((xyz.shape[0], 4), np.float32)
        quads[:, :3] = xyz
        quads.tofile(tmp_path / name)

    rc = main(["register", str(tmp_path / "a.bin"), str(tmp_path / "b.bin"),
               "--max-voxels", "8192", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    assert json.loads(line)["valid"] is True


@pytest.mark.slow
def test_cli_sequence_synthetic(tmp_path, capsys):
    """Trajectory mode end-to-end: synthetic loop, place recognition,
    checkpointing, TUM pose export."""
    poses_out = str(tmp_path / "poses.tum")
    traj_ply = str(tmp_path / "traj.ply")
    rc = main(["sequence", "--synthetic", "6", "--radius", "6",
               "--lidar-type", "VLP-16", "--auto-radii",
               "--max-raw-points", "32768", "--max-voxels", "2048",
               "--checkpoint-dir", str(tmp_path / "ckpt"),
               "--cache-dir", str(tmp_path / "scans"),
               "--poses-out", poses_out, "--trajectory-ply", traj_ply])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["frames"] == 6
    assert res["edges_valid"] >= 5
    assert res["ate_after"] is not None
    rows = [l.split() for l in open(poses_out).read().splitlines()]
    assert len(rows) == 6 and all(len(r) == 8 for r in rows)
    hdr = open(traj_ply, "rb").read(200).decode(errors="ignore")
    assert "element vertex 6" in hdr and "element edge" in hdr
    # resumable: checkpoint artifacts exist
    ck = tmp_path / "ckpt"
    assert (ck / "edges.npz").exists()
    assert any(f.startswith("feat_") for f in os.listdir(ck))
