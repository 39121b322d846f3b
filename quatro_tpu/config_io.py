"""Reference-compatible YAML configuration loading.

The reference loads two YAML files into the ROS parameter server
(reference: launch/quatro.launch:3-4) and reads them with ``nh.param``
(examples/run_global_registration.cpp:37-55, include/patchwork.hpp:51-95).
This module accepts those exact YAML schemas — a user of the reference can
point their existing ``params.yaml`` / ``patchwork_params.yaml`` at this
framework unchanged — and produces the PipelineConfig tree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import yaml

from quatro_tpu.config import LidarConfig, PipelineConfig


def load_params_yaml(params_path: Optional[str] = None,
                     patchwork_path: Optional[str] = None,
                     base: Optional[PipelineConfig] = None) -> PipelineConfig:
    """Build a PipelineConfig from the reference's YAML files.

    Either file may be omitted; missing keys keep the defaults of `base`
    (which mirror the reference's own defaults).
    """
    cfg = base if base is not None else PipelineConfig()
    lidar, fpfh, solver, patchwork = (cfg.lidar, cfg.fpfh, cfg.solver,
                                      cfg.patchwork)
    ground_mode = cfg.ground_segmentation_mode
    neighbor_mode = cfg.projection.neighbor_mode
    voxel_size = cfg.voxel_size

    if params_path:
        with open(params_path) as f:
            p = yaml.safe_load(f) or {}
        if "Lidar_type" in p:
            lidar = LidarConfig.preset(p["Lidar_type"])
        ground_mode = p.get("ground_segmentation_mode", ground_mode)
        neighbor_mode = p.get("neigbor_mode", neighbor_mode)  # sic: reference key
        voxel_size = float(p.get("voxel_size", voxel_size))
        f_yaml = p.get("FPFH", {}) or {}
        fpfh = dataclasses.replace(
            fpfh,
            normal_radius=float(f_yaml.get("normal_radius",
                                           fpfh.normal_radius)),
            fpfh_radius=float(f_yaml.get("fpfh_radius", fpfh.fpfh_radius)))
        q = p.get("Quatro", {}) or {}
        rot = q.get("rotation", {}) or {}
        solver = dataclasses.replace(
            solver,
            estimate_scaling=bool(q.get("estimating_scale",
                                        solver.estimate_scaling)),
            noise_bound=float(q.get("noise_bound", solver.noise_bound)),
            cbar2=float(q.get("noise_bound_coeff", solver.cbar2)),
            rotation_max_iterations=int(rot.get(
                "num_max_iter", solver.rotation_max_iterations)),
            rotation_gnc_factor=float(rot.get("gnc_factor",
                                              solver.rotation_gnc_factor)),
            rotation_cost_threshold=float(rot.get(
                "rot_cost_diff_thr", solver.rotation_cost_threshold)))

    if patchwork_path:
        with open(patchwork_path) as f:
            pw = yaml.safe_load(f) or {}
        flat = pw.get("patchwork", {}) or {}
        czm = flat.get("czm", {}) or {}
        patchwork = dataclasses.replace(
            patchwork,
            sensor_height=float(pw.get("sensor_height",
                                       patchwork.sensor_height)),
            num_iter=int(flat.get("num_iter", patchwork.num_iter)),
            num_lpr=int(flat.get("num_lpr", patchwork.num_lpr)),
            num_min_pts=int(flat.get("num_min_pts", patchwork.num_min_pts)),
            th_seeds=float(flat.get("th_seeds", patchwork.th_seeds)),
            th_dist=float(flat.get("th_dist", patchwork.th_dist)),
            max_r=float(flat.get("max_r", patchwork.max_r)),
            min_r=float(flat.get("min_r", patchwork.min_r)),
            uprightness_thr=float(flat.get("uprightness_thr",
                                           patchwork.uprightness_thr)),
            adaptive_seed_selection_margin=float(flat.get(
                "adaptive_seed_selection_margin",
                patchwork.adaptive_seed_selection_margin)),
            using_global_elevation=bool(flat.get(
                "using_global_elevation", patchwork.using_global_elevation)),
            global_elevation_threshold=float(flat.get(
                "global_elevation_threshold",
                patchwork.global_elevation_threshold)),
            num_zones=int(czm.get("num_zones", patchwork.num_zones)),
            num_sectors_each_zone=tuple(czm.get(
                "num_sectors_each_zone", patchwork.num_sectors_each_zone)),
            num_rings_each_zone=tuple(czm.get(
                "num_rings_each_zone", patchwork.num_rings_each_zone)),
            min_ranges_each_zone=tuple(czm.get(
                "min_ranges_each_zone", patchwork.min_ranges_each_zone)),
            elevation_thresholds=tuple(czm.get(
                "elevation_thresholds", patchwork.elevation_thresholds)),
            flatness_thresholds=tuple(czm.get(
                "flatness_thresholds", patchwork.flatness_thresholds)))
        if "min_r" in flat or "min_ranges_each_zone" in czm:
            # keep the reference invariant min_r == min_ranges[0]
            patchwork = dataclasses.replace(
                patchwork, min_r=patchwork.min_ranges_each_zone[0])

    projection = dataclasses.replace(cfg.projection,
                                     neighbor_mode=neighbor_mode)
    return dataclasses.replace(
        cfg, lidar=lidar, fpfh=fpfh, solver=solver, patchwork=patchwork,
        projection=projection, ground_segmentation_mode=ground_mode,
        voxel_size=voxel_size)
