"""End-to-end registration pipeline.

Mirrors the reference application flow (examples/run_global_registration.cpp:
127-251): preprocessing -> voxel -> FPFH -> matching -> Quatro solve, as one
jittable function over fixed-capacity padded clouds.

``register_scan_pair`` is the full path; ``register_features`` is the
front-end-only slice (no ground segmentation / sub-clustering) matching the
reference's observation that preprocessing is a speed/robustness booster,
not a correctness requirement (reference: README.md:102).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from quatro_tpu.config import PipelineConfig
from quatro_tpu.ops.fpfh import compute_fpfh
from quatro_tpu.ops.matching import Correspondences, match_features
from quatro_tpu.ops.neighbors import radius_neighbors
from quatro_tpu.ops.normals import estimate_normals
from quatro_tpu.ops.voxel import voxel_downsample
from quatro_tpu.preprocessing.patchwork import estimate_ground
from quatro_tpu.preprocessing.projection import segment_cloud
from quatro_tpu.solver.icp import IcpResult, refine_icp
from quatro_tpu.solver.quatro import register_correspondences
from quatro_tpu.types import PointBatch, RegistrationSolution


class PipelineResult(NamedTuple):
    solution: RegistrationSolution
    correspondences: Correspondences
    src_voxels: PointBatch
    tgt_voxels: PointBatch
    # Point-to-plane refinement details when config.icp.enabled (None
    # otherwise — config is static, so jit sees a fixed pytree shape).
    icp: Optional["IcpResult"] = None


def extract_features(points: jnp.ndarray, mask: jnp.ndarray,
                     config: PipelineConfig):
    """Voxel downsample -> normals -> FPFH for one cloud.

    Returns (voxel PointBatch, descriptors (V, 33), descriptor mask,
    Normals). Mirrors FPFHManager::setFeaturePair's per-cloud half
    (reference: include/fpfh_manager.hpp:98-129). Normals and FPFH run in
    the dense tiled formulation (ops/dense_features.py) — true radius
    neighborhoods, no gathered neighbor lists (each gathered index costs a
    tile DMA on TPU; the K-capped path spent ~0.4 s/pair in gathers).
    """
    from quatro_tpu.ops.pallas_frontend import use_pallas_frontend_default

    use_pallas = config.fpfh.use_pallas_frontend
    if use_pallas is None:
        use_pallas = use_pallas_frontend_default()
    # active_cap: the segment mask carries 5-11% valid points in the raw
    # capacity (measured round 5) — post-sort ops run on the
    # max_segment_points prefix instead of shuffling capacity-sized
    # sentinel tails (see ops/voxel.py).
    vox_pts, vox_mask = voxel_downsample(points, mask, config.voxel_size,
                                         config.max_voxels,
                                         active_cap=config.max_segment_points)
    if use_pallas and vox_pts.shape[0] % 512 == 0:
        # Fused VMEM-resident kernels: the XLA dense form's (T, V)
        # intermediates cost ~140 GB/pair of HBM traffic (BENCH_r02 cost
        # analysis); the Pallas form touches HBM only for inputs/outputs.
        from quatro_tpu.ops.pallas_frontend import (frontend_fpfh,
                                                    frontend_normals)
        normals = frontend_normals(vox_pts, vox_mask,
                                   config.fpfh.normal_radius)
        desc = frontend_fpfh(vox_pts, normals.normals, normals.valid,
                             vox_mask, config.fpfh.fpfh_radius)
    else:
        from quatro_tpu.ops.dense_features import dense_fpfh, dense_normals
        normals = dense_normals(vox_pts, vox_mask, config.fpfh.normal_radius)
        desc = dense_fpfh(vox_pts, normals.normals, normals.valid, vox_mask,
                          config.fpfh.fpfh_radius)
    desc_mask = vox_mask & normals.valid
    return PointBatch(vox_pts, vox_mask), desc, desc_mask, normals


def _extract_features_pair(src: PointBatch, tgt: PointBatch,
                           config: PipelineConfig):
    """Run extract_features on BOTH clouds as one stacked 2x-batch.

    The two per-cloud chains are data-independent; stacking them halves
    the number of sequential ops in the compiled program (under an outer
    vmap(B) the front-end becomes one B*2 chain instead of two B chains).
    The front-end is latency-bound, not bandwidth-bound (RESULTS.md), so
    op count is the cost that matters. Falls back to sequential calls
    when the clouds have different static capacities.
    """
    if src.points.shape != tgt.points.shape:
        s = extract_features(src.points, src.mask, config)
        t = extract_features(tgt.points, tgt.mask, config)
        return s, t
    pts = jnp.stack([src.points, tgt.points])
    msk = jnp.stack([src.mask, tgt.mask])
    out2 = jax.vmap(lambda p, m: extract_features(p, m, config))(pts, msk)
    pick = lambda i: jax.tree_util.tree_map(lambda x: x[i], out2)
    return pick(0), pick(1)


@partial(jax.jit, static_argnames=("config",))
def register_features(src: PointBatch, tgt: PointBatch,
                      config: PipelineConfig = PipelineConfig()
                      ) -> PipelineResult:
    """Front-end slice: feature extraction + matching + solve on
    already-preprocessed clouds (the minimum end-to-end path). With
    config.icp.enabled, the coarse pose is polished by point-to-plane ICP
    on the voxel clouds (solver/icp.py) without leaving the jit."""
    ((src_vox, src_desc, src_dmask, _),
     (tgt_vox, tgt_desc, tgt_dmask, tgt_normals)) = _extract_features_pair(
        src, tgt, config)

    corr = match_features(
        src_vox.points, tgt_vox.points, src_desc, tgt_desc,
        src_dmask, tgt_dmask,
        capacity=config.fpfh.max_correspondences,
        use_crosscheck=config.fpfh.use_crosscheck,
        crosscheck_min_matches=config.fpfh.crosscheck_min_matches,
        use_tuple_test=config.fpfh.use_tuple_test,
        tuple_scale=config.fpfh.tuple_scale,
        trials_per_corr=config.fpfh.tuple_trials_per_corr,
        tuple_min_keep=config.fpfh.tuple_min_keep,
        seed=config.fpfh.tuple_seed)

    if config.solver.total_hypotheses > 1:
        # Multi-hypothesis: solve the K largest distinct cliques (plus any
        # clique-independent vote hypotheses, solver/vote.py) and keep
        # the one whose pose actually aligns the voxel clouds (planar
        # aliasing can make the wrong clique the largest — see
        # solver/quatro.py::register_hypotheses).
        from quatro_tpu.solver.quatro import register_hypotheses
        from quatro_tpu.solver.verify import arbitrate_hypotheses
        sols = register_hypotheses(corr.src_xyz, corr.tgt_xyz, corr.mask,
                                   config.solver,
                                   k=config.solver.num_hypotheses)
        sol, _ = arbitrate_hypotheses(
            sols, src_vox.points, src_vox.mask, tgt_vox.points,
            tgt_vox.mask, radius=2.0 * config.voxel_size)
    else:
        sol = register_correspondences(corr.src_xyz, corr.tgt_xyz,
                                       corr.mask, config.solver)
    icp_res = None
    if config.icp.enabled:
        sol, icp_res = refine_solution(src.points, src.mask,
                                       tgt.points, tgt.mask, sol, config)
    return PipelineResult(sol, corr, src_vox, tgt_vox, icp_res)


def refine_solution(src_points: jnp.ndarray, src_mask: jnp.ndarray,
                    tgt_points: jnp.ndarray, tgt_mask: jnp.ndarray,
                    sol: RegistrationSolution, config: PipelineConfig):
    """Point-to-plane ICP polish of a coarse solution on the given clouds.

    Voxelizes both clouds and estimates target normals internally (XLA CSEs
    these away when the same clouds already went through the front-end).
    IMPORTANT: pass clouds that still contain the ground — refining on
    ground-removed segments leaves z unconstrained wherever the remaining
    structure is vertical, and the pose drifts vertically.
    """
    vox_s, m_s = voxel_downsample(src_points, src_mask, config.voxel_size,
                                  config.max_voxels)
    vox_t, m_t = voxel_downsample(tgt_points, tgt_mask, config.voxel_size,
                                  config.max_voxels)
    nbrs = radius_neighbors(vox_t, m_t, config.fpfh.normal_radius,
                            config.fpfh.max_neighbors_normal)
    normals = estimate_normals(vox_t, nbrs)
    icp_res = refine_icp(vox_s, m_s, vox_t, m_t,
                         normals.normals, normals.valid,
                         sol.rotation, sol.translation, config.icp,
                         valid=sol.valid)
    sol = sol.replace(rotation=icp_res.rotation,
                      translation=icp_res.translation)
    return sol, icp_res


def preprocess(points: jnp.ndarray, mask: jnp.ndarray,
               config: PipelineConfig):
    """Ground segmentation + sub-cluster rejection for one raw scan.

    Mirrors the reference's STEP 2-3 (examples/run_global_registration.cpp:
    128-162): Patchwork mode removes ground first, then clusters the
    non-ground cloud; LeGO-LOAM mode clusters the raw cloud with its own
    vertical-angle ground test.

    Returns (valid_segment_mask (N,), ground_mask (N,)).
    """
    if config.ground_segmentation_mode == "Patchwork":
        pw = estimate_ground(points, mask, config.patchwork)
        if not config.use_subclustering:
            return pw.nonground, pw.ground
        proj = segment_cloud(points, pw.nonground, config.lidar,
                             config.projection, ground_mode="Patchwork",
                             max_points=config.max_nonground_points)
        return proj.valid_segments, pw.ground
    # LeGO-LOAM mode clusters the RAW cloud — no nonground bound applies.
    proj = segment_cloud(points, mask, config.lidar, config.projection,
                         ground_mode="LeGO-LOAM")
    return proj.valid_segments, proj.ground


@partial(jax.jit, static_argnames=("config",))
def register_scan_pair(src: PointBatch, tgt: PointBatch,
                       config: PipelineConfig = PipelineConfig()
                       ) -> PipelineResult:
    """Full pipeline on raw scans (the reference's main() flow,
    examples/run_global_registration.cpp:127-251):

        Patchwork ground removal -> range-image sub-cluster rejection ->
        [ground-plane leveling] -> voxel -> FPFH -> matching ->
        Quatro solve -> [compose leveling back] -> [ICP polish].

    With config.ground_alignment.enabled, both scans are leveled by their
    fitted ground planes before the yaw-only solve and the result is
    composed back to the raw frames — full 6-DoF from ground segmentation,
    the Quatro++ extension (solver/ground.py). Note the returned
    correspondences / voxel clouds are then in the LEVELED frames; the
    solution is always in the raw frames.
    """
    import dataclasses

    if config.stack_preprocess and src.points.shape == tgt.points.shape:
        # ONE preprocessing chain at 2x batch instead of two sequential
        # chains. Measured a REGRESSION in BOTH round 3 (344 GB/call) and
        # the round-4 re-test (48 vs 70 pairs/s at ~150 GB/call): the
        # 42x-padded (2, N, 3) stack copy swamps the op-count savings.
        # Default stays False (config.py); the branch is kept for A/B.
        pts2 = jnp.stack([src.points, tgt.points])
        msk2 = jnp.stack([src.mask, tgt.mask])
        seg2, ground2 = jax.vmap(lambda p, m: preprocess(p, m, config))(
            pts2, msk2)
        src_seg, src_ground = seg2[0], ground2[0]
        tgt_seg, tgt_ground = seg2[1], ground2[1]
    else:
        src_seg, src_ground = preprocess(src.points, src.mask, config)
        tgt_seg, tgt_ground = preprocess(tgt.points, tgt.mask, config)

    # Coarse solve happens on the (possibly leveled) segmented clouds; the
    # ICP polish, when enabled, runs afterwards on the RAW clouds — the
    # ground plane Patchwork removed is exactly what constrains z in the
    # point-to-plane stage (see refine_solution).
    coarse_cfg = config
    if config.icp.enabled:
        coarse_cfg = dataclasses.replace(
            config, icp=dataclasses.replace(config.icp, enabled=False))

    ga = None
    src_pts, tgt_pts = src.points, tgt.points
    if config.ground_alignment.enabled:
        from quatro_tpu.solver.ground import (align_ground,
                                              compose_leveled_solution)
        ga = align_ground(src.points, src_ground & src.mask,
                          tgt.points, tgt_ground & tgt.mask,
                          config.ground_alignment)
        # HIGHEST: rotating metre-scale clouds through the MXU's default
        # bf16 path injects ~0.1 m of coordinate noise — fatal upstream of
        # voxel/FPFH (caught on the real chip; CPU runs mask it).
        hi = jax.lax.Precision.HIGHEST
        src_pts = jnp.matmul(src.points, ga.src_level.T, precision=hi)
        tgt_pts = jnp.matmul(tgt.points, ga.tgt_level.T, precision=hi)

    res = register_features(PointBatch(src_pts, src_seg),
                            PointBatch(tgt_pts, tgt_seg), coarse_cfg)
    sol = res.solution
    if ga is not None:
        rot, t = compose_leveled_solution(
            sol.rotation, sol.translation, ga,
            use_ground_z=config.ground_alignment.use_ground_z)
        sol = sol.replace(rotation=rot, translation=t)

    icp_res = res.icp
    if config.icp.enabled:
        sol, icp_res = refine_solution(src.points, src.mask,
                                       tgt.points, tgt.mask, sol, config)
    return PipelineResult(sol, res.correspondences,
                          res.src_voxels, res.tgt_voxels, icp_res)
