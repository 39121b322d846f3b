"""Patchwork ground segmentation, vectorized over the Concentric Zone Model.

The reference iterates ~500 CZM patches serially, each running seed
extraction + 3 rounds of {3x3-covariance SVD plane fit, distance threshold}
plus an uprightness/elevation/flatness gate cascade
(reference: include/patchwork.hpp:329-476, plane fit :264-279, seeds
:283-318, CZM binning :512-540, gates :394-451).

TPU-native design (round 3, movement-minimized, v3 table-free): on TPU each
random-access gather/scatter ELEMENT costs a tile-sized DMA (~8 ns — one
131k scatter is ~1 ms and does not amortize with batch), so v3 eliminates
every N-sized scatter/gather. All data movement is ONE sorting network plus
regular scans:

  1. one ``lax.sort`` on a composite (patch_id << 21 | quantized_z) key
     carries x/y/original-index payloads — grouping points by patch in
     within-patch z order; z itself is reconstructed from the key
     (~15 um quantization, far below sensor noise);
  2. patch boundaries via ``searchsorted`` (P+1 binary searches);
  3. per-patch seed ranks and the ten plane-fit moment sums via SEGMENTED
     associative scans over the patch-sorted arrays (reset at patch
     boundaries, so f32 prefix error never crosses a patch); moments use
     PATCH-RELATIVE coordinates (offsets from each patch's static CZM
     center, computed elementwise from the patch id — no table lookups)
     to keep the covariance numerically centered;
  4. per-point patch attributes (plane normal, threshold, gate flags)
     delivered by a P-sized scatter to run starts + one forward-fill
     associative scan per fit iteration;
  5. results returned to input order by one final sort on the carried
     original index.

Points the reference silently drops (out-of-range radius, patches with too
few points, sub-mirror reflections) are reported in the `dropped` mask.
Like the reference (and unlike round 2), ALL patch points participate in
the plane fit — there is no per-patch capacity anywhere anymore; within-
patch z ties are broken arbitrarily (z is quantized for the composite key;
the reference's sort is unstable too).
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
    """Static (P,) xy CZM patch-center tables (numpy, used both for the
    per-patch mean reconstruction and mirrored elementwise per point)."""
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


def _segmented_sum_scan(is_start: jnp.ndarray, values):
    """Inclusive SEGMENTED sum scan: running sum that resets at positions
    where ``is_start`` is True. values: tuple of (N,) or (k, N) arrays
    (scanned along the last axis). Returns same-structure running sums;
    the value at the last element of each run is the run total."""
    def op(a, b):
        af, av = a
        bf, bv = b
        gate = jnp.where(bf, 0.0, 1.0)   # broadcast over leading channel dim
        return (af | bf, tuple(bc + gate * ac for ac, bc in zip(av, bv)))
    _, sums = jax.lax.associative_scan(op, (is_start, tuple(values)),
                                      axis=-1)
    return sums


def _forward_fill(has: jnp.ndarray, channels: tuple):
    """Propagate the value at each flagged position to every later position
    (until the next flag) via one associative scan — the gather-free way to
    broadcast per-patch attributes to the points of each run."""
    def op(a, b):
        ah, av = a
        bh, bv = b
        return (ah | bh,
                tuple(jnp.where(bh, bc, ac) for ac, bc in zip(av, bv)))
    _, filled = jax.lax.associative_scan(op, (has, tuple(channels)))
    return filled


@partial(jax.jit, static_argnames=("cfg",))
def estimate_ground(points: jnp.ndarray, mask: jnp.ndarray,
                    cfg: PatchworkConfig = PatchworkConfig()
                    ) -> PatchworkResult:
    """Full Patchwork pass (reference: PatchWork::estimate_ground,
    include/patchwork.hpp:329-476)."""
    n = points.shape[0]
    dtype = points.dtype
    p_cnt = cfg.num_patches

    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    # mirror-reflection removal (include/patchwork.hpp:355-365)
    keep = mask & (z >= -1.8 * cfg.sensor_height)

    patch_id, in_czm = czm_bin(points, keep, cfg)

    # --- one composite sort: patch-major, z-minor ---------------------------
    zmin = jnp.min(jnp.where(keep, z, jnp.inf))
    zspan = jnp.maximum(jnp.max(jnp.where(keep, z, -jnp.inf)) - zmin, 1e-6)
    zscale = ((1 << _ZBITS) - 1) / zspan
    zq = jnp.clip((z - zmin) * zscale, 0, (1 << _ZBITS) - 1).astype(jnp.int32)
    zq = jnp.where(jnp.isfinite(z) & keep, zq, 0)
    pid_k = jnp.where(in_czm, patch_id, p_cnt)
    key = (pid_k << _ZBITS) + zq

    iota = jnp.arange(n, dtype=jnp.int32)
    key_s, x_s, y_s, orig_s = jax.lax.sort((key, x, y, iota), num_keys=1)
    pid_s = key_s >> _ZBITS
    valid_s = pid_s < p_cnt
    # z reconstructed from the key: ~zspan/2^21 (~15 um) quantization.
    z_s = zmin + (key_s & ((1 << _ZBITS) - 1)).astype(dtype) / zscale

    pos = jnp.arange(n, dtype=jnp.int32)
    is_new = jnp.concatenate([jnp.ones(1, bool), pid_s[1:] != pid_s[:-1]])

    starts = jnp.searchsorted(pid_s, jnp.arange(p_cnt + 1, dtype=jnp.int32)
                              ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]          # per-patch totals
    nonempty = counts > 0
    ends_i = jnp.clip(starts[1:] - 1, 0, n - 1)   # last element of each run

    def seg_at_ends(running):
        """Per-patch run total from an inclusive segmented running sum."""
        return jnp.where(nonempty, running[..., ends_i], 0.0)

    patch_live = counts > cfg.num_min_pts      # strict >, patchwork.hpp:386

    # --- patch-relative coordinates (elementwise; no table lookups) ---------
    pcx, pcy = _patch_center_of_point(jnp.minimum(pid_s, p_cnt - 1), cfg,
                                      dtype)
    px = jnp.where(valid_s, x_s - pcx, 0.0)
    py = jnp.where(valid_s, y_s - pcy, 0.0)
    pz = jnp.where(valid_s, z_s, 0.0)
    center_x_np, center_y_np = _patch_centers(cfg)
    center_x = jnp.asarray(center_x_np, dtype)
    center_y = jnp.asarray(center_y_np, dtype)

    # --- initial seeds (include/patchwork.hpp:283-318) ----------------------
    zones_np, rings_np, conc_np, elev_np, flat_np = _patch_metadata(cfg)
    margin = (cfg.adaptive_seed_selection_margin * cfg.sensor_height
              if cfg.sensor_height != 0.0 else -0.1)
    zone0_end = int(cfg.num_rings_each_zone[0]
                    * cfg.num_sectors_each_zone[0])
    is_zone0_pt = pid_s < zone0_end
    lpr_eligible = valid_s & ~(is_zone0_pt & (z_s < margin))
    (rank_run,) = _segmented_sum_scan(is_new,
                                      (lpr_eligible.astype(dtype),))
    # exclusive in-patch rank among eligible points (z-ordered)
    lpr_rank = rank_run - lpr_eligible.astype(dtype)
    lpr_sel = lpr_eligible & (lpr_rank < cfg.num_lpr)
    self_f = lpr_sel.astype(dtype)
    sel_run, selz_run = _segmented_sum_scan(is_new,
                                            (self_f, self_f * z_s))
    lpr_cnt = seg_at_ends(sel_run)
    lpr_h = jnp.where(lpr_cnt > 0,
                      seg_at_ends(selz_run) / jnp.maximum(lpr_cnt, 1.0),
                      0.0)

    # deliver per-patch seed threshold to points: P-sized scatter + ffill
    seed_idx = jnp.where(nonempty, starts[:p_cnt], n)
    has = jnp.zeros((n + 1,), bool).at[seed_idx].set(nonempty)[:n]

    def seed_f(v):
        return jnp.zeros((n + 1,), dtype).at[seed_idx].set(v)[:n]

    (thr_pt,) = _forward_fill(has, (seed_f(lpr_h + cfg.th_seeds),))
    member = valid_s & (z_s < thr_pt)

    # --- iterative plane fit via segmented moment scans ---------------------
    # (include/patchwork.hpp:545-586; covariance on PATCH-RELATIVE offsets
    # so the raw-moment form stays numerically centered)
    nrm = th_dist_d = elevation = surface_var = None
    nx_pt = ny_pt = nz_pt = th_pt = None
    for _ in range(cfg.num_iter):
        w = member.astype(dtype)
        mom = (w, w * px, w * py, w * pz,
               w * px * px, w * px * py, w * px * pz,
               w * py * py, w * py * pz, w * pz * pz)
        mom_run = _segmented_sum_scan(is_new, mom)
        S = jnp.stack([seg_at_ends(ch) for ch in mom_run])   # (10, P)
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
        # deterministic sign: n_z >= 0 so "below plane + th_dist" is ground
        flip = n3 < 0
        n1 = jnp.where(flip, -n1, n1)
        n2 = jnp.where(flip, -n2, n2)
        n3 = jnp.where(flip, -n3, n3)
        trace = cxx + cyy + czz
        mx_w = mx_r + center_x                 # world-frame patch mean
        my_w = my_r + center_y
        d = -(n1 * mx_w + n2 * my_w + n3 * mz_r)
        th_dist_d = cfg.th_dist - d
        surface_var = lam_min / jnp.maximum(trace, 1e-30)
        elevation = mz_r
        nrm = (n1, n2, n3)

        nx_pt, ny_pt, nz_pt, th_pt = _forward_fill(
            has, (seed_f(n1), seed_f(n2), seed_f(n3), seed_f(th_dist_d)))
        proj_pt = nx_pt * x_s + ny_pt * y_s + nz_pt * z_s
        member = valid_s & (proj_pt < th_pt)

    # --- gate cascade (include/patchwork.hpp:394-451) ------------------------
    upright = jnp.abs(nrm[2]) >= cfg.uprightness_thr
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

    # --- per-point classification -------------------------------------------
    # The final fit iteration already delivered (n, th) per point; only the
    # per-patch gate flags still need the scatter + forward-fill hop.
    flags_p = (accepted.astype(jnp.int32)
               + 2 * revert_patch.astype(jnp.int32)
               + 4 * reject_patch.astype(jnp.int32)
               + 8 * patch_live.astype(jnp.int32))
    s_fl = jnp.zeros((n + 1,), jnp.int32).at[seed_idx].set(flags_p)[:n]
    (fl_pt,) = _forward_fill(has, (s_fl,))

    live_pt = valid_s & ((fl_pt & 8) > 0)
    proj_pt = nx_pt * x_s + ny_pt * y_s + nz_pt * z_s
    is_ground_pt = proj_pt < th_pt
    ground_s = live_pt & ((fl_pt & 1) > 0) & is_ground_pt
    nonground_s = live_pt & ~ground_s
    reverted_s = live_pt & ((fl_pt & 2) > 0) & is_ground_pt
    rejected_s = live_pt & ((fl_pt & 4) > 0) & is_ground_pt

    # --- back to input order: one sort on the carried original index --------
    packed = (ground_s.astype(jnp.int32)
              + 2 * nonground_s.astype(jnp.int32)
              + 4 * reverted_s.astype(jnp.int32)
              + 8 * rejected_s.astype(jnp.int32))
    _, packed_o = jax.lax.sort((orig_s, packed), num_keys=1)
    ground = (packed_o & 1) > 0
    nonground = (packed_o & 2) > 0
    reverted = (packed_o & 4) > 0
    rejected = (packed_o & 8) > 0
    dropped = mask & ~ground & ~nonground
    patch_normal = jnp.stack([nrm[0], nrm[1], nrm[2]], axis=-1)
    return PatchworkResult(ground, nonground, dropped, patch_normal,
                           accepted, reverted, rejected)
