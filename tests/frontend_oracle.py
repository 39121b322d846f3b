"""Test-only NumPy oracle for the FRONT-END semantics: float64 serial
transliterations of (a) the PCL NormalEstimation + FPFHEstimation pipeline
exactly as the reference invokes it (src/teaser_utils/fpfh.cc:44-75, PCL's
computePairFeatures / computePointSPFHSignature / computeFPFHSignature
conventions) and (b) PatchWork::estimate_ground's per-patch serial loop
(include/patchwork.hpp:283-476). VERDICT round 2, "Next round" item 5:
the internal dense<->K-capped equivalence tests cannot catch a SHARED
misreading of PCL/Patchwork conventions — this oracle is written from the
reference/PCL semantics directly, loops and all, and the differential
tests in test_frontend_oracle.py pin the vectorized implementations to it.

NOT part of the framework; NumPy only, no JAX.
"""

from __future__ import annotations

import numpy as np

NUM_BINS = 11


# --------------------------------------------------------------------------
# PCL normals + FPFH (reference usage: fpfh.cc:44-75 — NormalEstimation
# with radius search, FPFHEstimationOMP with a larger radius)
# --------------------------------------------------------------------------

def radius_neighbors(points: np.ndarray, i: int, radius: float,
                     mask: np.ndarray) -> np.ndarray:
    d2 = np.sum((points - points[i]) ** 2, axis=1)
    return np.where(mask & (d2 <= radius * radius))[0]


def pcl_normals(points: np.ndarray, mask: np.ndarray, radius: float,
                viewpoint=(0.0, 0.0, 0.0)):
    """pcl::NormalEstimation semantics: per-point covariance of the radius
    neighborhood (query included), smallest eigenvector, oriented toward
    the viewpoint. Returns (normals (N, 3), valid (N,))."""
    n = points.shape[0]
    normals = np.zeros((n, 3))
    valid = np.zeros(n, bool)
    vp = np.asarray(viewpoint, float)
    for i in range(n):
        if not mask[i]:
            continue
        nb = radius_neighbors(points, i, radius, mask)
        if nb.size < 3:
            continue
        q = points[nb]
        cov = np.cov(q.T, bias=True)
        w, v = np.linalg.eigh(cov)
        nrm = v[:, 0]
        if nrm @ (vp - points[i]) < 0:
            nrm = -nrm
        normals[i] = nrm
        valid[i] = True
    return normals, valid


def pcl_pair_features(p1, n1, p2, n2):
    """pcl::computePairFeatures (PCL features/pfh.hpp): the Darboux frame
    angles (f1, f2, f3) with the source/target swap rule. Returns
    (f1, f2, f3, ok)."""
    d = p2 - p1
    dist = np.linalg.norm(d)
    if dist == 0.0:
        return 0.0, 0.0, 0.0, False
    du = d / dist
    angle1 = n1 @ du
    angle2 = n2 @ du
    if abs(angle1) < abs(angle2):      # acos(|a1|) > acos(|a2|) -> swap
        n1, n2 = n2, n1
        du = -du
        f3 = -angle2
    else:
        f3 = angle1
    v = np.cross(du, n1)
    vn = np.linalg.norm(v)
    if vn < 1e-10:
        return 0.0, 0.0, 0.0, False
    v = v / vn
    w = np.cross(n1, v)
    f2 = v @ n2
    f1 = np.arctan2(w @ n2, n1 @ n2)
    return f1, f2, f3, True


def _bin(f, lo, hi):
    idx = int(np.floor(NUM_BINS * (f - lo) / (hi - lo)))
    return min(max(idx, 0), NUM_BINS - 1)


def pcl_fpfh(points: np.ndarray, normals: np.ndarray, nvalid: np.ndarray,
             mask: np.ndarray, radius: float) -> np.ndarray:
    """pcl::FPFHEstimation semantics: per-point SPFH (hist_incr =
    100 / n_pairs per 11-bin block), then FPFH(i) = sum_j SPFH(j)/d2(i,j)
    over radius neighbors, each block renormalized to sum 100."""
    n = points.shape[0]
    ok = mask & nvalid
    spfh = np.zeros((n, 3 * NUM_BINS))
    for i in range(n):
        if not ok[i]:
            continue
        nb = [j for j in radius_neighbors(points, i, radius, ok) if j != i]
        feats = []
        for j in nb:
            f1, f2, f3, good = pcl_pair_features(points[i], normals[i],
                                                 points[j], normals[j])
            if good:
                feats.append((f1, f2, f3))
        if not feats:
            continue
        # PCL's hist_incr denominator is the neighbor count (indices minus
        # the query), not the successful-pair count; they differ only for
        # degenerate pairs (computePairFeatures returning false), which the
        # random test clouds do not produce.
        incr = 100.0 / len(nb)
        for f1, f2, f3 in feats:
            spfh[i, _bin(f1, -np.pi, np.pi)] += incr
            spfh[i, NUM_BINS + _bin(f2, -1.0, 1.0)] += incr
            spfh[i, 2 * NUM_BINS + _bin(f3, -1.0, 1.0)] += incr

    fpfh = np.zeros((n, 3 * NUM_BINS))
    for i in range(n):
        if not ok[i]:
            continue
        acc = np.zeros(3 * NUM_BINS)
        for j in radius_neighbors(points, i, radius, ok):
            d2 = np.sum((points[j] - points[i]) ** 2)
            if d2 <= 1e-12:
                continue
            acc += spfh[j] / d2
        for b in range(3):
            blk = acc[b * NUM_BINS:(b + 1) * NUM_BINS]
            s = blk.sum()
            if s > 0:
                fpfh[i, b * NUM_BINS:(b + 1) * NUM_BINS] = blk * (100.0 / s)
    return fpfh


# --------------------------------------------------------------------------
# Patchwork serial oracle (include/patchwork.hpp:283-476)
# --------------------------------------------------------------------------

def _czm_patch_id(pt, cfg):
    """pc2czm binning for one point (include/patchwork.hpp:512-540)."""
    import math
    r = math.hypot(pt[0], pt[1])
    if not (cfg.min_r < r <= cfg.max_r):
        return None
    theta = math.atan2(pt[1], pt[0])
    if theta <= 0:
        theta += 2 * math.pi
    bounds = list(cfg.ring_boundaries)
    zone = sum(r >= b for b in bounds[1:-1])
    nrings = cfg.num_rings_each_zone[zone]
    nsect = cfg.num_sectors_each_zone[zone]
    ring_sz = (bounds[zone + 1] - bounds[zone]) / nrings
    sect_sz = 2 * math.pi / nsect
    ring = min(max(int((r - cfg.min_ranges_each_zone[zone]) / ring_sz), 0),
               nrings - 1)
    sector = min(int(theta / sect_sz), nsect - 1)
    offset = 0
    for k in range(zone):
        offset += cfg.num_rings_each_zone[k] * cfg.num_sectors_each_zone[k]
    return offset + ring * nsect + sector


def patchwork_oracle(points: np.ndarray, mask: np.ndarray, cfg):
    """Serial float64 Patchwork: per-patch z-sorted seeds -> 3-iteration
    plane fit -> gate cascade -> per-point ground test. Returns
    (ground (N,) bool, nonground (N,) bool, accepted (P,) bool)."""
    n = points.shape[0]
    p_cnt = cfg.num_patches
    keep = mask & (points[:, 2] >= -1.8 * cfg.sensor_height)

    members = [[] for _ in range(p_cnt)]
    for i in range(n):
        if not keep[i]:
            continue
        pid = _czm_patch_id(points[i], cfg)
        if pid is not None:
            members[pid].append(i)

    # patch metadata (zone / concentric index / threshold quirk,
    # include/patchwork.hpp:407-408)
    zones, conc_l, elev_t, flat_t = [], [], [], []
    concentric = 0
    for k in range(cfg.num_zones):
        for ring in range(cfg.num_rings_each_zone[k]):
            for _ in range(cfg.num_sectors_each_zone[k]):
                zones.append(k)
                conc_l.append(concentric)
                t = min(ring + 2 * k, len(cfg.elevation_thresholds) - 1)
                elev_t.append(cfg.elevation_thresholds[t])
                flat_t.append(cfg.flatness_thresholds[t])
            concentric += 1

    ground = np.zeros(n, bool)
    nonground = np.zeros(n, bool)
    accepted_p = np.zeros(p_cnt, bool)
    margin = (cfg.adaptive_seed_selection_margin * cfg.sensor_height
              if cfg.sensor_height != 0.0 else -0.1)

    for p in range(p_cnt):
        idx = np.asarray(members[p], int)
        if idx.size <= cfg.num_min_pts:
            continue
        pts = points[idx].astype(float)
        order = np.argsort(pts[:, 2])
        pts = pts[order]
        idx = idx[order]

        # seeds (include/patchwork.hpp:283-318)
        if zones[p] == 0:
            elig = pts[:, 2] >= margin
        else:
            elig = np.ones(len(pts), bool)
        zs = pts[elig][: cfg.num_lpr, 2]
        lpr = zs.mean() if zs.size else 0.0
        member = pts[:, 2] < lpr + cfg.th_seeds

        # 3-iteration plane fit (include/patchwork.hpp:545-586, :264-279)
        normal = np.array([0.0, 0.0, 1.0])
        th_dist_d = 0.0
        mean = np.zeros(3)
        svar = 0.0
        for _ in range(cfg.num_iter):
            q = pts[member]
            if len(q) < 3:
                break
            mean = q.mean(axis=0)
            cov = np.cov(q.T, bias=True)
            w, v = np.linalg.eigh(cov)
            normal = v[:, 0]
            if normal[2] < 0:
                normal = -normal
            d = -(normal @ mean)
            th_dist_d = cfg.th_dist - d
            svar = w[0] / max(w.sum(), 1e-30)
            member = pts @ normal < th_dist_d

        # gates (include/patchwork.hpp:394-451)
        upright = abs(normal[2]) >= cfg.uprightness_thr
        near = conc_l[p] < cfg.num_rings_of_interest
        high = mean[2] > elev_t[p]
        flat_ok = flat_t[p] > svar
        if near:
            acc = (flat_ok if high else True)
        elif cfg.using_global_elevation:
            acc = not (mean[2] > cfg.global_elevation_threshold)
        else:
            acc = True
        acc = acc and upright
        accepted_p[p] = acc

        is_g = (points[idx] @ normal) < th_dist_d
        if acc:
            ground[idx[is_g]] = True
            nonground[idx[~is_g]] = True
        else:
            nonground[idx] = True
    return ground, nonground, accepted_p
