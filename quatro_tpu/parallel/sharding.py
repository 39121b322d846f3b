"""Sharded batched registration + the multi-chip 'full step'.

Scan-pair data parallelism over a ('pairs',) mesh: each device runs the
whole per-pair pipeline locally (zero communication — the pipeline is
pure and per-pair), then the pose-graph reduction all-reduces its normal
equations with `psum` over the same axis. This is the TPU replacement for
the reference's OpenMP-threads-in-one-process model (SURVEY.md §2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from quatro_tpu.config import SolverConfig
from quatro_tpu.parallel.mesh import PAIRS_AXIS
from quatro_tpu.parallel.posegraph import (PoseGraphEdges,
                                           optimize_pose_graph,
                                           solution_to_edge)
from quatro_tpu.solver.quatro import register_correspondences


def sharded_register_batch(mesh: Mesh, config: SolverConfig = SolverConfig()):
    """Returns a jitted function solving a (B, N, 3) correspondence batch
    sharded over the 'pairs' mesh axis. B must be divisible by mesh size."""

    def local(src, tgt, mask):
        return jax.vmap(lambda s, t, m: register_correspondences(
            s, t, m, config))(src, tgt, mask)

    spec = P(PAIRS_AXIS)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)
    return jax.jit(fn)


def _posegraph_tail(sols, edge_i, edge_j, poses0, num_poses,
                    gn_iters, cg_iters):
    """Pose-graph solve from per-edge registration solutions; the J^T
    reductions psum over the pairs axis (the only cross-chip traffic —
    pose-vector-sized, never cloud-sized)."""
    t_meas, yaw = solution_to_edge(sols.translation, sols.rotation)
    weight = jnp.sum(sols.final_inlier_mask, axis=-1).astype(jnp.float32)
    edges = PoseGraphEdges(
        i=edge_i, j=edge_j,
        t_meas=t_meas, yaw_meas=yaw,
        weight=jnp.maximum(weight, 1.0),
        mask=sols.valid)
    return optimize_pose_graph(poses0, edges, num_poses,
                               gn_iters=gn_iters, cg_iters=cg_iters,
                               psum_axis=PAIRS_AXIS)


def make_loop_closing_step(mesh: Mesh, num_poses: int,
                           config: SolverConfig = SolverConfig(),
                           gn_iters: int = 6, cg_iters: int = 24):
    """The full multi-chip 'step': batched pair registration (sharded over
    'pairs') followed by the pose-graph solve whose J^T reductions psum over
    the same axis (BASELINE.json configs 2 & 5).

    Returned fn signature:
        (src (B,N,3), tgt (B,N,3), mask (B,N), edge_i (B,), edge_j (B,),
         poses0 (M,4)) -> (poses (M,4), solutions)
    with B = edges divisible by mesh size. Edge (i, j) carries the
    registration of scan j (source) onto scan i (target) — the pose-graph
    measurement convention (parallel/posegraph.py, sequence.py):
    t_ij = R(-yaw_i)(t_j - t_i), yaw_ij = yaw_j - yaw_i — so feed
    src = scan_j's correspondences, tgt = scan_i's.
    """

    def local(src, tgt, mask, edge_i, edge_j, poses0):
        sols = jax.vmap(lambda s, t, m: register_correspondences(
            s, t, m, config))(src, tgt, mask)
        poses = _posegraph_tail(sols, edge_i, edge_j, poses0, num_poses,
                                gn_iters, cg_iters)
        return poses, sols

    spec = P(PAIRS_AXIS)
    rep = P()
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, spec, spec, spec, rep),
                   out_specs=(rep, spec), check_vma=False)
    return jax.jit(fn)


def make_full_pipeline_step(mesh: Mesh, num_poses: int, config=None,
                            gn_iters: int = 6, cg_iters: int = 24):
    """Multi-chip step over RAW SCANS: the entire front-end (Patchwork
    ground segmentation + range-image sub-clustering + voxel + FPFH +
    matching) AND the Quatro solve run per-pair inside one shard_map over
    the ('pairs',) axis, feeding the same pose-graph psum tail. This is
    the reference's whole main() (examples/run_global_registration.cpp:
    127-251) as one sharded device program.

    Contract (pinned in tests/test_parallel.py): the per-pair front-end
    introduces ZERO collectives — all cross-chip traffic is the pose
    graph's all-reduces. A preprocessing op that silently acquires a
    replication constraint fails the pinned profile, not production.

    Returned fn signature:
        (src_pts (B,P,3), src_mask (B,P), tgt_pts (B,P,3), tgt_mask (B,P),
         edge_i (B,), edge_j (B,), poses0 (M,4)) -> (poses (M,4), solutions)
    with B divisible by mesh size. Edge convention as make_loop_closing_step.
    """
    from quatro_tpu.config import PipelineConfig
    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch

    config = config or PipelineConfig()

    def local(src_pts, src_mask, tgt_pts, tgt_mask, edge_i, edge_j, poses0):
        def one(sp, sm, tp, tm):
            res = register_scan_pair(PointBatch(sp, sm), PointBatch(tp, tm),
                                     config)
            return res.solution

        sols = jax.vmap(one)(src_pts, src_mask, tgt_pts, tgt_mask)
        poses = _posegraph_tail(sols, edge_i, edge_j, poses0, num_poses,
                                gn_iters, cg_iters)
        return poses, sols

    spec = P(PAIRS_AXIS)
    rep = P()
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, spec, spec, spec, spec, rep),
                   out_specs=(rep, spec), check_vma=False)
    return jax.jit(fn)
