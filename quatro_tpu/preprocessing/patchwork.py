"""Patchwork ground segmentation, vectorized over the Concentric Zone Model.

The reference iterates ~500 CZM patches serially, each running seed
extraction + 3 rounds of {3x3-covariance SVD plane fit, distance threshold}
plus an uprightness/elevation/flatness gate cascade
(reference: include/patchwork.hpp:329-476, plane fit :264-279, seeds
:283-318, CZM binning :512-540, gates :394-451).

TPU-native design (round 3 v4, movement-minimized): the microbenchmarks in
tools/microbench_ops.py put every N-sized irregular op (sort / scatter /
gather / associative scan) at ~2-3 ms per cloud at batch 64, while cumsum
and one-hot matmuls over the ~600-patch axis are ~10x cheaper — so this
version touches exactly ONE irregular N-op and routes everything else
through the MXU:

  1. one single-operand ``lax.sort`` of the composite
     (patch_id << 21 | quantized_z) key — used ONLY for the seed stage,
     which needs within-patch z-ranks (the ``num_lpr`` lowest points);
     z is decoded from the key (~15 um quantization);
  2. the seed stage needs no scan at all: zone-0 below-margin points
     form a prefix of each run (z rides in the key), so the eligible
     region per patch comes from ``searchsorted`` and the LPR z-sums
     from boundary differences of one two-level cumsum;
  3. everything else runs in INPUT order: a (N, Pـpad) bfloat16 one-hot
     of the patch id feeds MXU matmuls both ways — segment-sums of the
     ten plane-fit moments (one-hot^T @ moments) and per-patch -> per-point
     attribute delivery (one-hot @ table) — no scatter, no gather, no
     forward-fill, and no sort-back (outputs are born in input order);
  4. moments use PATCH-RELATIVE coordinates (offsets from each patch's
     static CZM center, computed elementwise from the patch id) to keep
     the raw-moment covariance numerically centered.

Points the reference silently drops (out-of-range radius, patches with too
few points, sub-mirror reflections) are reported in the `dropped` mask.
Like the reference, ALL patch points participate in the plane fit (no
per-patch capacity); within-patch z ties are broken arbitrarily (the
reference's sort is unstable too).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from quatro_tpu.config import PatchworkConfig
from quatro_tpu.ops.normals import smallest_eigenpair_sym3

_ZBITS = 21


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


def _patch_centers(cfg: PatchworkConfig):
    """Static (P,) xy CZM patch-center tables (numpy)."""
    bounds = list(cfg.ring_boundaries)
    cx, cy = [], []
    for k in range(cfg.num_zones):
        nrings = cfg.num_rings_each_zone[k]
        nsect = cfg.num_sectors_each_zone[k]
        ring_sz = (bounds[k + 1] - bounds[k]) / nrings
        sect_sz = 2 * np.pi / nsect
        for ring in range(nrings):
            r_c = bounds[k] + (ring + 0.5) * ring_sz
            for sector in range(nsect):
                th_c = (sector + 0.5) * sect_sz
                cx.append(r_c * np.cos(th_c))
                cy.append(r_c * np.sin(th_c))
    return np.asarray(cx, np.float32), np.asarray(cy, np.float32)


def _zone_select(zone: jnp.ndarray, table, dtype) -> jnp.ndarray:
    """Per-point zone-table lookup as a branchless where-chain (a gather of
    N indices into even a 4-entry table costs ~1 ms on TPU)."""
    out = jnp.full(zone.shape, table[-1], dtype)
    for k in range(len(table) - 2, -1, -1):
        out = jnp.where(zone == k, jnp.asarray(table[k], dtype), out)
    return out


def czm_bin(points: jnp.ndarray, mask: jnp.ndarray, cfg: PatchworkConfig):
    """Per-point CZM patch id (reference: include/patchwork.hpp:512-540).

    Returns (patch_id (N,) int32, in_czm (N,) bool). Out-of-range points get
    patch_id = num_patches (a dump slot).
    """
    dtype = points.dtype
    nrings_l = list(cfg.num_rings_each_zone)
    nsect_l = list(cfg.num_sectors_each_zone)
    bounds = list(cfg.ring_boundaries)
    ring_sizes_l = [(bounds[k + 1] - bounds[k]) / nrings_l[k]
                    for k in range(cfg.num_zones)]
    sector_sizes_l = [2 * np.pi / s for s in nsect_l]
    offsets_l = [0] + list(np.cumsum(
        np.multiply(nrings_l, nsect_l)))[:-1]

    r = jnp.hypot(points[:, 0], points[:, 1])
    theta = jnp.arctan2(points[:, 1], points[:, 0])
    theta = jnp.where(theta > 0, theta, theta + 2 * jnp.pi)

    in_czm = (r > cfg.min_r) & (r <= cfg.max_r) & mask
    zone = jnp.zeros(r.shape, jnp.int32)
    for b in bounds[1:-1]:
        zone = zone + (r >= b).astype(jnp.int32)

    min_rng = _zone_select(zone, list(cfg.min_ranges_each_zone), dtype)
    ring_sz = _zone_select(zone, ring_sizes_l, dtype)
    sect_sz = _zone_select(zone, sector_sizes_l, dtype)
    nrings = _zone_select(zone, nrings_l, jnp.int32)
    nsect = _zone_select(zone, nsect_l, jnp.int32)
    offs = _zone_select(zone, offsets_l, jnp.int32)

    ring = jnp.minimum(((r - min_rng) / ring_sz).astype(jnp.int32),
                       nrings - 1)
    sector = jnp.minimum((theta / sect_sz).astype(jnp.int32), nsect - 1)
    ring = jnp.clip(ring, 0, None)
    patch = offs + ring * nsect + sector
    num_patches = cfg.num_patches
    return jnp.where(in_czm, patch, num_patches).astype(jnp.int32), in_czm


def _patch_center_of_point(pid: jnp.ndarray, cfg: PatchworkConfig, dtype):
    """Per-point CZM patch-center xy, computed ELEMENTWISE from the patch
    id (zone via offset comparisons, ring/sector via div/mod) — the
    gather-free mirror of the static _patch_centers table."""
    nrings_l = list(cfg.num_rings_each_zone)
    nsect_l = list(cfg.num_sectors_each_zone)
    bounds = list(cfg.ring_boundaries)
    ring_sizes_l = [(bounds[k + 1] - bounds[k]) / nrings_l[k]
                    for k in range(cfg.num_zones)]
    sector_sizes_l = [2 * np.pi / s for s in nsect_l]
    offsets_l = [0] + list(np.cumsum(np.multiply(nrings_l, nsect_l)))[:-1]

    zone = jnp.zeros(pid.shape, jnp.int32)
    for off in offsets_l[1:]:
        zone = zone + (pid >= off).astype(jnp.int32)
    offs = _zone_select(zone, offsets_l, jnp.int32)
    nsect = _zone_select(zone, nsect_l, jnp.int32)
    ring_sz = _zone_select(zone, ring_sizes_l, dtype)
    sect_sz = _zone_select(zone, sector_sizes_l, dtype)
    min_rng = _zone_select(zone, [float(b) for b in bounds[:-1]], dtype)

    local = pid - offs
    ring = local // jnp.maximum(nsect, 1)
    sector = local - ring * nsect
    r_c = min_rng + (ring.astype(dtype) + 0.5) * ring_sz
    th_c = (sector.astype(dtype) + 0.5) * sect_sz
    return r_c * jnp.cos(th_c), r_c * jnp.sin(th_c)


def _blocked_cumsum(v: jnp.ndarray, blk: int = 512) -> jnp.ndarray:
    """Inclusive cumsum via a two-level (within-block + block-prefix)
    decomposition: ~3 short cumsums instead of one long one, and the f32
    error stays ~eps*(blk + n/blk)*|v| instead of growing with the flat
    prefix magnitude."""
    n = v.shape[0]
    if n % blk != 0:
        return jnp.cumsum(v)
    b = v.reshape(-1, blk)
    within = jnp.cumsum(b, axis=1)
    totals = within[:, -1]
    off = jnp.cumsum(totals) - totals          # exclusive block prefix
    return (within + off[:, None]).reshape(-1)


def _forward_fill(has: jnp.ndarray, channels: tuple):
    """Propagate the value at each flagged position to every later position
    (until the next flag) via one associative scan. (Kept for callers
    outside patchwork — estimate_ground itself no longer needs it.)"""
    def op(a, b):
        ah, av = a
        bh, bv = b
        return (ah | bh,
                tuple(jnp.where(bh, bc, ac) for ac, bc in zip(av, bv)))
    _, filled = jax.lax.associative_scan(op, (has, tuple(channels)))
    return filled


def _pad128(k: int) -> int:
    return ((k + 127) // 128) * 128


@partial(jax.jit, static_argnames=("cfg",))
def estimate_ground(points: jnp.ndarray, mask: jnp.ndarray,
                    cfg: PatchworkConfig = PatchworkConfig()
                    ) -> PatchworkResult:
    """Full Patchwork pass (reference: PatchWork::estimate_ground,
    include/patchwork.hpp:329-476)."""
    n = points.shape[0]
    dtype = points.dtype
    p_cnt = cfg.num_patches
    p_pad = _pad128(p_cnt + 1)

    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    # mirror-reflection removal (include/patchwork.hpp:355-365)
    keep = mask & (z >= -1.8 * cfg.sensor_height)

    patch_id, in_czm = czm_bin(points, keep, cfg)
    valid = in_czm                      # pid < p_cnt exactly when in_czm
    pid = jnp.where(valid, patch_id, p_cnt)

    # Fused Pallas kernels (XLA-einsum fallbacks off-TPU): the seed stage
    # is a per-(patch, z-bin) histogram, each plane-fit iteration is ONE
    # kernel (table delivery + membership + moment segment-sums fused so
    # neither the delivered values nor the moment channels touch HBM), and
    # the final classification emits one int32 code per point. Zero
    # N-sized irregular ops remain in this function (round 4; the round-3
    # version still carried one ~2 ms key sort for the seeds).
    from quatro_tpu.ops.segment_matmul import (classify_points,
                                               cross_histogram,
                                               fit_iteration_moments)

    # --- per-point channels (sanitized: a NaN anywhere poisons the MXU
    # contractions through 0 * NaN) ------------------------------------------
    pcx, pcy = _patch_center_of_point(jnp.minimum(pid, p_cnt - 1), cfg,
                                      dtype)
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    ok = valid & finite
    x_c = jnp.where(ok, x, 0.0)
    y_c = jnp.where(ok, y, 0.0)
    z_c = jnp.where(ok, z, 0.0)
    px = jnp.where(ok, x - pcx, 0.0)
    py = jnp.where(ok, y - pcy, 0.0)
    chan = jnp.stack([x_c, y_c, z_c, px, py], axis=0).astype(jnp.float32)
    pid = jnp.where(ok, pid, p_cnt)
    center_x_np, center_y_np = _patch_centers(cfg)
    center_x = jnp.asarray(center_x_np, dtype)
    center_y = jnp.asarray(center_y_np, dtype)

    zones_np, rings_np, conc_np, elev_np, flat_np = _patch_metadata(cfg)

    # --- seed stage: margin-anchored (patch, z-bin) histogram ---------------
    # (reference seeds = mean of the num_lpr lowest eligible z per patch,
    # include/patchwork.hpp:283-318; zone-0 excludes z below the adaptive
    # margin). Bin edges are ANCHORED AT THE MARGIN so zone-0 eligibility
    # is exact at bin granularity; the num_lpr cut inside the boundary bin
    # approximates those points by the bin's own mean z (error <= bin
    # width / num_lpr per seed height; Z=128 bins over the cloud's z-span
    # ~= 8 cm bins on KITTI-scale scans, well under th_seeds=0.5 — the
    # round-3 sort path already quantized z, just finer).
    zbins = 128
    zmin = jnp.min(jnp.where(keep, z, jnp.inf))
    zmax = jnp.max(jnp.where(keep, z, -jnp.inf))
    zspan = jnp.maximum(zmax - zmin, 1e-6)
    binw = zspan / zbins
    margin = (cfg.adaptive_seed_selection_margin * cfg.sensor_height
              if cfg.sensor_height != 0.0 else -0.1)
    zone0_end = int(cfg.num_rings_each_zone[0]
                    * cfg.num_sectors_each_zone[0])
    b0 = jnp.clip(jnp.ceil((jnp.asarray(margin, dtype) - zmin) / binw),
                  0, zbins).astype(jnp.int32)
    zb = jnp.clip((jnp.floor((z_c - margin) / binw)).astype(jnp.int32) + b0,
                  0, zbins - 1)
    okf = ok.astype(jnp.float32)
    hist = cross_histogram(pid, zb,
                           jnp.stack([okf, z_c.astype(jnp.float32) * okf]),
                           p_pad, zbins)
    cnt_h = hist[0, :p_cnt]                       # (P, Z)
    zsum_h = hist[1, :p_cnt]
    counts = jnp.sum(cnt_h, axis=1)
    patch_live = counts > cfg.num_min_pts  # strict >, patchwork.hpp:386

    is_zone0 = jnp.arange(p_cnt) < zone0_end
    elig = ~(is_zone0[:, None] & (jnp.arange(zbins)[None, :] < b0))
    cnt_e = cnt_h * elig
    zsum_e = zsum_h * elig
    cc = jnp.cumsum(cnt_e, axis=1)
    avail = cc[:, -1]
    need = jnp.minimum(avail, float(cfg.num_lpr))
    take = jnp.clip(need[:, None] - (cc - cnt_e), 0.0, cnt_e)
    lpr_sum = jnp.sum(take * zsum_e / jnp.maximum(cnt_e, 1.0), axis=1)
    lpr_h = jnp.where(need > 0, lpr_sum / jnp.maximum(need, 1.0), 0.0)

    def plane_tab(n1, n2, n3, th, flags):
        """(p_pad, 5) f32 delivery table, zero rows beyond p_cnt."""
        t = jnp.stack([n1, n2, n3, th, flags], axis=-1).astype(jnp.float32)
        return jnp.zeros((p_pad, 5), jnp.float32).at[:p_cnt].set(t)

    zeros_p = jnp.zeros((p_cnt,), jnp.float32)
    tab = plane_tab(zeros_p, zeros_p, jnp.ones((p_cnt,), jnp.float32),
                    lpr_h + cfg.th_seeds, zeros_p)   # member: z < seed thr

    # --- iterative plane fit: one fused kernel per iteration ----------------
    # (include/patchwork.hpp:545-586; covariance on patch-relative offsets)
    nrm = th_dist_d = elevation = surface_var = None
    for it in range(cfg.num_iter):
        # intermediate iterations only produce the next membership set —
        # a single-term bf16 moment contraction (~0.4% relative) is
        # plenty; the FINAL fit feeds the covariance gates and runs exact
        S = fit_iteration_moments(pid, chan, tab, p_pad, p_cnt,
                                  exact=(it + 1 == cfg.num_iter))[:p_cnt].T
        cnt = jnp.maximum(S[0], 1.0)
        mx_r, my_r, mz_r = S[1] / cnt, S[2] / cnt, S[3] / cnt
        cxx = S[4] / cnt - mx_r * mx_r
        cxy = S[5] / cnt - mx_r * my_r
        cxz = S[6] / cnt - mx_r * mz_r
        cyy = S[7] / cnt - my_r * my_r
        cyz = S[8] / cnt - my_r * mz_r
        czz = S[9] / cnt - mz_r * mz_r
        (n1, n2, n3), lam_min = smallest_eigenpair_sym3(
            cxx, cxy, cxz, cyy, cyz, czz)
        # Empty/degenerate patches can yield NaN normals; a NaN row in a
        # delivery TABLE poisons the matmul for EVERY point (0 * NaN = NaN
        # inside the contraction), so sanitize before building tables.
        okp = S[0] > 0.5
        n1 = jnp.where(okp & jnp.isfinite(n1), n1, 0.0)
        n2 = jnp.where(okp & jnp.isfinite(n2), n2, 0.0)
        n3 = jnp.where(okp & jnp.isfinite(n3), n3, 1.0)
        lam_min = jnp.where(okp & jnp.isfinite(lam_min), lam_min, 0.0)
        # deterministic sign: n_z >= 0 so "below plane + th_dist" is ground
        flip = n3 < 0
        n1 = jnp.where(flip, -n1, n1)
        n2 = jnp.where(flip, -n2, n2)
        n3 = jnp.where(flip, -n3, n3)
        trace = cxx + cyy + czz
        mx_w = mx_r + center_x                  # world-frame patch mean
        my_w = my_r + center_y
        d = -(n1 * mx_w + n2 * my_w + n3 * mz_r)
        th_dist_d = cfg.th_dist - d
        surface_var = lam_min / jnp.maximum(trace, 1e-30)
        elevation = mz_r
        nrm = (n1, n2, n3)

        if it + 1 < cfg.num_iter:
            tab = plane_tab(n1, n2, n3, th_dist_d, zeros_p)
        else:
            # final iteration: fold the gate flags into the same delivery
            upright = jnp.abs(n3) >= cfg.uprightness_thr
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
            # revert/reject bookkeeping (patchwork.hpp:410-426)
            revert_patch = patch_live & upright & near & high & flat_ok
            reject_patch = patch_live & upright & near & high & ~flat_ok
            flags_p = (accepted.astype(jnp.float32)
                       + 2 * revert_patch.astype(jnp.float32)
                       + 4 * reject_patch.astype(jnp.float32)
                       + 8 * patch_live.astype(jnp.float32))
            tab = plane_tab(n1, n2, n3, th_dist_d, flags_p)

    # --- fused per-point classification (input order; one int32/point) ------
    code = classify_points(pid, chan, tab, p_pad, p_cnt)
    ground = (code & 1) > 0
    nonground = (code & 2) > 0
    reverted = (code & 4) > 0
    rejected = (code & 8) > 0
    dropped = mask & ~ground & ~nonground
    patch_normal = jnp.stack([nrm[0], nrm[1], nrm[2]], axis=-1)
    return PatchworkResult(ground, nonground, dropped, patch_normal,
                           accepted, reverted, rejected)
