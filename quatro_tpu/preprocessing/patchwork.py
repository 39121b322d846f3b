"""Patchwork ground segmentation, vectorized over the Concentric Zone Model.

The reference iterates ~500 CZM patches serially, each running seed
extraction + 3 rounds of {3x3-covariance SVD plane fit, distance threshold}
plus an uprightness/elevation/flatness gate cascade
(reference: include/patchwork.hpp:329-476, plane fit :264-279, seeds
:283-318, CZM binning :512-540, gates :394-451).

TPU-native design: one flat (num_patches, C) point table built with two
sorts (global z-sort, then stable patch-id sort — preserving the reference's
z-ordering within each patch), after which every stage is batched over ALL
patches simultaneously: masked means/covariances, the closed-form 3x3
eigensolver from ops.normals, and the gate cascade as pure boolean masking.
No per-patch loop exists; the only sequential axis is the 3 plane-fit
iterations.

Points the reference silently drops (out-of-range radius, patches with too
few points, sub-mirror reflections) are reported in the `dropped` mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from quatro_tpu.config import PatchworkConfig
from quatro_tpu.ops.normals import smallest_eigenvector_3x3


class PatchworkResult(NamedTuple):
    ground: jax.Array      # (N,) bool
    nonground: jax.Array   # (N,) bool
    dropped: jax.Array     # (N,) bool — outside CZM or in a skipped patch
    patch_normal: jax.Array     # (P, 3) fitted plane normals (debug/viz)
    patch_accepted: jax.Array   # (P,) gate decision per patch
    # Diagnostic clouds matching the reference's /revert_pc and /reject_pc
    # rviz topics (include/patchwork.hpp:118-119,410-426,465-475): plane
    # points of near-ring patches whose elevation exceeded the threshold
    # but whose flatness reverted them to ground (reverted), or that failed
    # flatness and were demoted to nonground (rejected).
    reverted: jax.Array    # (N,) bool, subset of `ground`
    rejected: jax.Array    # (N,) bool, subset of `nonground`


def _patch_metadata(cfg: PatchworkConfig):
    """Static per-patch (zone, ring, concentric index, thresholds) tables."""
    zones, rings, conc = [], [], []
    concentric = 0
    for k in range(cfg.num_zones):
        for ring in range(cfg.num_rings_each_zone[k]):
            for _ in range(cfg.num_sectors_each_zone[k]):
                zones.append(k)
                rings.append(ring)
                conc.append(concentric)
            concentric += 1
    zones = np.array(zones)
    rings = np.array(rings)
    conc = np.array(conc)
    # threshold index = ring_idx + 2 * zone_idx (reference quirk,
    # include/patchwork.hpp:407-408), only consulted when concentric < 4.
    tidx = np.clip(rings + 2 * zones, 0, len(cfg.elevation_thresholds) - 1)
    elev_thr = np.asarray(cfg.elevation_thresholds)[tidx]
    flat_thr = np.asarray(cfg.flatness_thresholds)[tidx]
    return zones, rings, conc, elev_thr, flat_thr


def czm_bin(points: jnp.ndarray, mask: jnp.ndarray, cfg: PatchworkConfig):
    """Per-point CZM patch id (reference: include/patchwork.hpp:512-540).

    Returns (patch_id (N,) int32, in_czm (N,) bool). Out-of-range points get
    patch_id = num_patches (a dump slot).
    """
    dtype = points.dtype
    min_ranges = jnp.asarray(cfg.min_ranges_each_zone, dtype)
    nrings = jnp.asarray(cfg.num_rings_each_zone, jnp.int32)
    nsect = jnp.asarray(cfg.num_sectors_each_zone, jnp.int32)
    boundaries = jnp.asarray(cfg.ring_boundaries, dtype)  # (Z+1,)
    ring_sizes = (boundaries[1:] - boundaries[:-1]) / nrings.astype(dtype)
    sector_sizes = 2 * jnp.pi / nsect.astype(dtype)
    offsets = jnp.asarray(
        np.concatenate([[0], np.cumsum(np.multiply(
            cfg.num_rings_each_zone, cfg.num_sectors_each_zone))[:-1]]),
        jnp.int32)

    r = jnp.hypot(points[:, 0], points[:, 1])
    theta = jnp.arctan2(points[:, 1], points[:, 0])
    theta = jnp.where(theta > 0, theta, theta + 2 * jnp.pi)

    in_czm = (r > cfg.min_r) & (r <= cfg.max_r) & mask
    zone = jnp.sum(r[:, None] >= boundaries[None, 1:-1], axis=1)
    zone = zone.astype(jnp.int32)

    ring = jnp.minimum(((r - min_ranges[zone]) / ring_sizes[zone])
                       .astype(jnp.int32), nrings[zone] - 1)
    sector = jnp.minimum((theta / sector_sizes[zone]).astype(jnp.int32),
                         nsect[zone] - 1)
    ring = jnp.clip(ring, 0, None)
    patch = offsets[zone] + ring * nsect[zone] + sector
    num_patches = cfg.num_patches
    return jnp.where(in_czm, patch, num_patches).astype(jnp.int32), in_czm


@partial(jax.jit, static_argnames=("cfg",))
def estimate_ground(points: jnp.ndarray, mask: jnp.ndarray,
                    cfg: PatchworkConfig = PatchworkConfig()
                    ) -> PatchworkResult:
    """Full Patchwork pass (reference: PatchWork::estimate_ground,
    include/patchwork.hpp:329-476)."""
    n = points.shape[0]
    dtype = points.dtype
    p_cnt = cfg.num_patches
    cap = cfg.max_pts_per_patch

    # --- mirror-reflection removal (include/patchwork.hpp:355-365) ----------
    keep = mask & (points[:, 2] >= -1.8 * cfg.sensor_height)

    # --- global z-sort, then stable patch sort -> per-patch z order ---------
    zkey = jnp.where(keep, points[:, 2], jnp.asarray(jnp.inf, dtype))
    zorder = jnp.argsort(zkey)
    pts_z = points[zorder]
    keep_z = keep[zorder]

    patch_id, in_czm = czm_bin(pts_z, keep_z, cfg)
    porder = jnp.argsort(patch_id, stable=True)
    pid_s = patch_id[porder]
    pts_s = pts_z[porder]
    valid_s = in_czm[porder]
    orig_idx = zorder[porder]          # back to input indexing

    counts = jax.ops.segment_sum(valid_s.astype(jnp.int32), pid_s,
                                 num_segments=p_cnt + 1)[:p_cnt]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)[:-1]])
    pos = jnp.arange(n)
    rank = pos - starts[jnp.minimum(pid_s, p_cnt - 1)]

    in_table = valid_s & (rank < cap) & (pid_s < p_cnt)
    flat = jnp.where(in_table, pid_s * cap + rank, p_cnt * cap)
    table_pts = jnp.zeros((p_cnt * cap + 1, 3), dtype).at[flat].set(
        jnp.where(in_table[:, None], pts_s, 0.0))[:-1].reshape(p_cnt, cap, 3)
    table_valid = jnp.zeros((p_cnt * cap + 1,), bool).at[flat].set(
        in_table)[:-1].reshape(p_cnt, cap)

    patch_live = counts > cfg.num_min_pts      # strict >, patchwork.hpp:386

    # --- initial seeds (include/patchwork.hpp:283-318) ----------------------
    zones_np, rings_np, conc_np, elev_np, flat_np = _patch_metadata(cfg)
    zone_of_patch = jnp.asarray(zones_np, jnp.int32)
    z_tab = table_pts[..., 2]
    margin = (cfg.adaptive_seed_selection_margin * cfg.sensor_height
              if cfg.sensor_height != 0.0 else -0.1)
    is_zone0 = (zone_of_patch == 0)[:, None]
    lpr_eligible = table_valid & ~(is_zone0 & (z_tab < margin))
    lpr_rank = jnp.cumsum(lpr_eligible.astype(jnp.int32), axis=1)
    lpr_sel = lpr_eligible & (lpr_rank <= cfg.num_lpr)
    lpr_cnt = jnp.sum(lpr_sel, axis=1)
    lpr_h = jnp.where(lpr_cnt > 0,
                      jnp.sum(jnp.where(lpr_sel, z_tab, 0.0), axis=1)
                      / jnp.maximum(lpr_cnt, 1), 0.0)
    ground_tab = table_valid & (z_tab < (lpr_h + cfg.th_seeds)[:, None])

    # --- iterative plane fit (include/patchwork.hpp:545-586) ----------------
    def fit_plane(member):
        w = member.astype(dtype)[..., None]
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        mean = jnp.sum(table_pts * w, axis=1) / cnt
        centered = (table_pts - mean[:, None, :]) * w
        # HIGHEST: the TPU bf16 matmul default injects ~0.4% relative error
        # into the covariance — spurious lambda_min ~4e-3 of trace, which
        # swamps flatness thresholds of 1e-4 and randomizes the gate.
        cov = jnp.einsum("pki,pkj->pij", centered, centered,
                         precision=jax.lax.Precision.HIGHEST) \
            / cnt[..., None]
        normal, lam_min = smallest_eigenvector_3x3(cov)
        # deterministic sign: n_z >= 0 so "below plane + th_dist" is ground
        normal = jnp.where(normal[:, 2:3] < 0, -normal, normal)
        trace = jnp.trace(cov, axis1=-2, axis2=-1)
        d = -jnp.sum(normal * mean, axis=-1)
        th_dist_d = cfg.th_dist - d
        surface_var = lam_min / jnp.maximum(trace, 1e-30)
        return normal, th_dist_d, mean, surface_var

    normal = th_dist_d = mean = surface_var = None
    for _ in range(cfg.num_iter):
        normal, th_dist_d, mean, surface_var = fit_plane(ground_tab)
        # HIGHEST: raw coordinates reach 80 m; the bf16 default would put
        # ~0.3 m of rounding into a comparison against th_dist = 0.125 m
        # (and diverge from the elementwise per-point classification below).
        proj = jnp.einsum("pkc,pc->pk", table_pts, normal,
                          precision=jax.lax.Precision.HIGHEST)
        ground_tab = table_valid & (proj < th_dist_d[:, None])

    # --- gate cascade (include/patchwork.hpp:394-451) ------------------------
    upright = jnp.abs(normal[:, 2]) >= cfg.uprightness_thr
    elevation = mean[:, 2]
    conc = jnp.asarray(conc_np, jnp.int32)
    elev_thr = jnp.asarray(elev_np, dtype)
    flat_thr = jnp.asarray(flat_np, dtype)

    near = conc < cfg.num_rings_of_interest
    high = elevation > elev_thr
    flat_ok = flat_thr > surface_var
    near_accept = jnp.where(high, flat_ok, True)
    if cfg.using_global_elevation:
        far_accept = ~(elevation > cfg.global_elevation_threshold)
    else:
        far_accept = jnp.ones_like(upright)
    accepted = upright & jnp.where(near, near_accept, far_accept)
    accepted = accepted & patch_live

    # revert/reject bookkeeping (patchwork.hpp:410-426): only near-ring,
    # upright patches that tripped the elevation gate are candidates
    revert_patch = patch_live & upright & near & high & flat_ok
    reject_patch = patch_live & upright & near & high & ~flat_ok

    # --- per-point classification (covers table-overflow points too) --------
    pid_pt = jnp.minimum(pid_s, p_cnt - 1)
    live_pt = valid_s & patch_live[pid_pt] & (pid_s < p_cnt)
    proj_pt = jnp.sum(pts_s * normal[pid_pt], axis=-1)
    is_ground_pt = proj_pt < th_dist_d[pid_pt]
    ground_s = live_pt & accepted[pid_pt] & is_ground_pt
    nonground_s = live_pt & ~ground_s
    reverted_s = live_pt & revert_patch[pid_pt] & is_ground_pt
    rejected_s = live_pt & reject_patch[pid_pt] & is_ground_pt

    ground = jnp.zeros(n, bool).at[orig_idx].set(ground_s)
    nonground = jnp.zeros(n, bool).at[orig_idx].set(nonground_s)
    dropped = mask & ~ground & ~nonground
    reverted = jnp.zeros(n, bool).at[orig_idx].set(reverted_s)
    rejected = jnp.zeros(n, bool).at[orig_idx].set(rejected_s)
    return PatchworkResult(ground, nonground, dropped, normal, accepted,
                           reverted, rejected)
