"""The Quatro robust registration back-end, as one jittable function.

Functional re-design of ``Quatro<S,T>::computeTransformation``
(reference: include/quatro.hpp:769-936). The reference is a stateful PCL
``Registration`` subclass mutating ~15 member matrices; here the entire
solve is a pure function

    (src (N,3), tgt (N,3), mask (N,)) x SolverConfig -> RegistrationSolution

so it jits once, ``vmap``s over batches of scan pairs, and shards over a
device mesh untouched. Stage order matches the reference driver exactly:

    consistency graph -> inlier selection (max-clique replacement) ->
    chain TIMs over the clique -> GNC-TLS rotation (yaw or SO(3)) ->
    rotation-inlier chaining -> COTE translation -> compose [R|t].

Noise-bound quirks of the reference are reproduced via explicit config
(SolverConfig.rotation_noise_bound_scale / cote_noise_bound_coeff; see
config.py for the file:line archaeology).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from quatro_tpu.config import SolverConfig
from quatro_tpu.solver import clique as clique_mod
from quatro_tpu.solver import rotation as rot_mod
from quatro_tpu.solver import translation as trans_mod
from quatro_tpu.solver.scale import tim_consistency_graph
from quatro_tpu.utils.se3 import rotate_points
from quatro_tpu.types import RegistrationSolution


def _consistency_inputs(src, tgt, mask, config: SolverConfig):
    """(scale, adjacency) — the solver preamble shared by the single- and
    multi-hypothesis paths so their graph construction cannot drift."""
    if config.estimate_scaling:
        # TLS scale extension (the reference's flag is inert; see
        # solve_scale_tls). The scale-aware consistency adjacency comes
        # straight from the scale solver's inlier test.
        from quatro_tpu.solver.scale import solve_scale_tls
        return solve_scale_tls(src, tgt, mask, config.noise_bound,
                               config.cbar2)
    scale = jnp.asarray(1.0, src.dtype)  # reference: include/quatro.hpp:361
    adj = tim_consistency_graph(src, tgt, mask, config.noise_bound,
                                config.cbar2,
                                use_pallas=config.use_pallas_graph)
    return scale, adj


def _chain_order(inlier_mask: jnp.ndarray):
    """Sorted clique indices + cyclic successor, with static shapes.

    Reproduces the sort + cyclic chain construction of the reference
    (include/quatro.hpp:806,828-843): positions 0..m-1 hold the clique
    indices ascending; leaf(i) = clique[(i+1) % m].
    """
    n = inlier_mask.shape[0]
    iota = jnp.arange(n)
    order = jnp.argsort(jnp.where(inlier_mask, iota, n + iota))
    m = jnp.sum(inlier_mask).astype(jnp.int32)
    nxt = jnp.where(iota + 1 < m, iota + 1, 0)
    leaf = order[nxt]
    chain_mask = iota < m
    return order, leaf, chain_mask, m


@partial(jax.jit, static_argnames=("config",))
def register_correspondences(
        src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
        config: SolverConfig = SolverConfig(),
        prior_ryrx: Optional[jnp.ndarray] = None) -> RegistrationSolution:
    """Solve the robust registration problem on matched correspondences.

    src, tgt: (N, 3) matched keypoints (padded); mask: (N,) validity.
    prior_ryrx: optional IMU-derived roll/pitch rotation; the estimated yaw
    is composed as Rz @ RyRx and COTE sees RyRx @ src
    (reference: include/quatro.hpp:276-279,419-426,892).
    """
    dtype = src.dtype
    has_prior = prior_ryrx is not None
    if prior_ryrx is None:
        prior_ryrx = jnp.eye(3, dtype=dtype)

    scale, adj = _consistency_inputs(src, tgt, mask, config)
    clique_mask, valid = clique_mod.select_inliers(
        adj, mask, mode=config.inlier_selection_mode,
        kcore_threshold=config.kcore_heuristic_threshold,
        num_seeds=config.clique_num_seeds,
        max_size=config.max_clique_size,
        swap_rounds=config.clique_swap_rounds,
        exact_cap=config.exact_clique_cap,
        exact_max_steps=config.exact_clique_max_steps)
    return _solve_from_inliers(src, tgt, clique_mask, valid, scale,
                               config, prior_ryrx, has_prior)


def _solve_from_inliers(src, tgt, clique_mask, valid, scale,
                        config: SolverConfig, prior_ryrx, has_prior):
    """Chain TIMs -> GNC rotation -> COTE translation given a selected
    inlier set (the reference driver after the clique stage,
    include/quatro.hpp:817-936). Pure; vmaps over hypothesis sets."""
    dtype = src.dtype
    n = src.shape[0]

    # --- chain TIMs over the clique (include/quatro.hpp:817-844) ------------
    order, leaf, chain_mask, m = _chain_order(clique_mask)
    chainf = chain_mask.astype(dtype)[:, None]
    pruned_src_tims = (src[leaf] - src[order]) * chainf
    pruned_dst_tims = (tgt[leaf] - tgt[order]) * chainf / scale
    if has_prior:
        # Level the source with the IMU roll/pitch BEFORE the yaw solve, so
        # the 2D GNC sees tgt_tims ~ Rz @ (RyRx @ src_tims). The reference
        # solves yaw on the raw (tilted) TIMs and only composes RyRx
        # afterwards (include/quatro.hpp:828-843,419-426), which degrades
        # the yaw estimate and collapses its rotation-inlier count on
        # genuinely tilted platforms; we level first.
        pruned_src_tims = rotate_points(pruned_src_tims, prior_ryrx)

    # --- GNC-TLS rotation ----------------------------------------------------
    # The reference rescales the rotation noise bound by 2/scale
    # (include/quatro.hpp:846-852); with scale fixed at 1 this is the
    # rotation_noise_bound_scale quirk.
    rot_noise_bound = (config.noise_bound * config.rotation_noise_bound_scale
                       / scale)
    if config.reg_name == "Quatro":
        gnc = rot_mod.gnc_rotation_2d(
            pruned_src_tims[:, :2], pruned_dst_tims[:, :2], chain_mask,
            rot_noise_bound, config.rotation_gnc_factor,
            config.rotation_max_iterations, config.rotation_cost_threshold,
            algorithm=config.rotation_estimation_algorithm)
        rotation = jnp.eye(3, dtype=dtype).at[:2, :2].set(gnc.rotation)
    else:  # full SO(3) (TEASER mode)
        gnc = rot_mod.gnc_rotation_3d(
            pruned_src_tims, pruned_dst_tims, chain_mask,
            rot_noise_bound, config.rotation_gnc_factor,
            config.rotation_max_iterations, config.rotation_cost_threshold,
            algorithm=config.rotation_estimation_algorithm)
        rotation = gnc.rotation
    rotation = jnp.matmul(rotation, prior_ryrx,
                          precision=jax.lax.Precision.HIGHEST)

    # --- rotation-inlier chaining (include/quatro.hpp:860-874) ---------------
    iota = jnp.arange(n)
    prev = jnp.where(iota == 0, jnp.maximum(m - 1, 0), iota - 1)
    rot_inliers = gnc.inlier_mask & gnc.inlier_mask[prev] & chain_mask
    num_rot_inliers = jnp.sum(rot_inliers).astype(jnp.int32)

    # --- COTE translation (include/quatro.hpp:879-911) -----------------------
    if config.using_rot_inliers_when_estimating_cote:
        # Compact rotation-inlier chain positions; fall back to the clique
        # when there are none (reference N_R > 0 check).
        use_rot = num_rot_inliers > 0
        sel_mask = jnp.where(use_rot, rot_inliers, chain_mask)
    else:
        sel_mask = chain_mask
    pos_order = jnp.argsort(jnp.where(sel_mask, iota, n + iota))
    sel_count = jnp.sum(sel_mask).astype(jnp.int32)
    cote_mask = iota < sel_count
    sel_idx = order[pos_order]                 # original correspondence index
    # COTE sees scale * R @ src with R = Rz @ RyRx applied ONCE. (The
    # reference applies RyRx twice when a prior is set — once at
    # include/quatro.hpp:892 and again inside solution_.rotation at :906 —
    # a latent upstream bug that is a no-op for its identity-prior default;
    # we fix it rather than replicate it.)
    cote_src = src[sel_idx]
    cote_dst = tgt[sel_idx]

    cote = trans_mod.solve_translation(
        rotate_points(scale * cote_src, rotation), cote_dst, cote_mask,
        config.noise_bound * config.cote_noise_bound_coeff, config.cbar2,
        use_median=(config.cote_mode == "median"))

    # --- final inliers back in correspondence index space --------------------
    final_mask = jnp.zeros((n,), bool).at[sel_idx].set(
        cote.inlier_mask & cote_mask)

    return RegistrationSolution(
        valid=valid,
        scale=scale,
        rotation=jnp.where(valid, rotation, jnp.eye(3, dtype=dtype)),
        translation=jnp.where(valid, cote.translation,
                              jnp.zeros(3, dtype=dtype)),
        max_clique_mask=clique_mask,
        final_inlier_mask=final_mask & valid,
        num_rotation_inliers=num_rot_inliers,
        gnc_iterations=gnc.iterations,
        gnc_cost=gnc.cost,
    )


@partial(jax.jit, static_argnames=("config", "k"))
def register_hypotheses(
        src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
        config: SolverConfig = SolverConfig(), k: int = 4,
        prior_ryrx: Optional[jnp.ndarray] = None) -> RegistrationSolution:
    """Multi-hypothesis solve: the K largest mutually-DISTINCT cliques of
    the consistency graph, each solved independently (vmap). Returns a
    RegistrationSolution with a leading K axis, largest-clique first.

    Why: repetitive structure (building facades, fences) yields several
    self-consistent cliques, and planar aliasing can make the WRONG one
    the largest — deterministically (measured: a wide-baseline VLP-16
    edge whose best clique gives exact yaw but 3.2 m of translation,
    under every matcher seed). The caller arbitrates hypotheses with
    geometric overlap (solver/verify.py; pipeline/odometry do this when
    SolverConfig.num_hypotheses > 1). Beyond the reference, which always
    takes PMC's single max clique (include/quatro.hpp:791-813).

    Hypothesis 0 is EXACTLY the configured single-solve selection
    (select_inliers with inlier_selection_mode / the k-core shortcut), so
    raising K is a strict superset of the K=1 behavior; hypotheses 1..K-1
    are the next largest greedy cliques distinct from it and each other.

    With config.num_vote_hypotheses > 0, that many ADDITIONAL hypotheses
    come from the clique-independent (yaw, translation) vote generator
    (solver/vote.py) — the recovery path for planar aliasing burying the
    correct consensus set below every top-K clique. The returned leading
    axis is then k + num_vote_hypotheses, clique hypotheses first.
    """
    dtype = src.dtype
    has_prior = prior_ryrx is not None
    if prior_ryrx is None:
        prior_ryrx = jnp.eye(3, dtype=dtype)

    scale, adj = _consistency_inputs(src, tgt, mask, config)
    if config.inlier_selection_mode == "clique":
        # One growth pass serves BOTH hypothesis 0 and the candidate set
        # (the previous two-pass form ran k-core + growth + swaps twice;
        # part of the measured 1.4 ms/pair multi-hypothesis premium).
        sel0, _, grown = clique_mod.select_inliers_with_candidates(
            adj, mask,
            kcore_threshold=config.kcore_heuristic_threshold,
            num_seeds=config.clique_num_seeds,
            max_size=config.max_clique_size,
            swap_rounds=config.clique_swap_rounds,
            top=max(8, k))
    else:
        sel0, _ = clique_mod.select_inliers(
            adj, mask, mode=config.inlier_selection_mode,
            kcore_threshold=config.kcore_heuristic_threshold,
            num_seeds=config.clique_num_seeds,
            max_size=config.max_clique_size,
            swap_rounds=config.clique_swap_rounds,
            exact_cap=config.exact_clique_cap,
            exact_max_steps=config.exact_clique_max_steps)
        grown = clique_mod.grow_greedy_cliques(
            adj, clique_mod.clique_seed_scores(adj, mask), mask,
            num_seeds=config.clique_num_seeds,
            max_size=config.max_clique_size)
        grown = clique_mod.improve_top_cliques(
            adj, grown, mask, top=max(8, k),
            rounds=config.clique_swap_rounds)
    cliques, sizes = clique_mod.top_distinct_cliques(
        jnp.concatenate([sel0[None], grown]), k, force_first=True)
    valid_k = sizes > 1

    if config.num_vote_hypotheses > 0:
        from quatro_tpu.solver import vote as vote_mod
        vmasks, vsizes = vote_mod.vote_hypotheses(
            src, tgt, mask, adj, scale, config.num_vote_hypotheses,
            bin_m=config.vote_trans_bin_scale * abs(config.noise_bound),
            num_anchors=config.vote_yaw_anchors,
            num_bins=config.vote_yaw_bins,
            num_yaw_modes=config.vote_yaw_modes)
        cliques = jnp.concatenate([cliques, vmasks])
        # two supporters suffice: the cyclic chain TIM is estimable from
        # 2 vertices (the reference aborts only at <= 1), and sparse hard
        # pairs carry GT modes of exactly 2-4 votes (measured seed-40
        # failure: the true mode had 2 votes and a min-support of 3
        # silently discarded it)
        valid_k = jnp.concatenate([valid_k, vsizes >= 2])

    return jax.vmap(
        lambda sel, ok: _solve_from_inliers(src, tgt, sel, ok, scale,
                                            config, prior_ryrx, has_prior)
    )(cliques, valid_k)


def register_batch(src: jnp.ndarray, tgt: jnp.ndarray, mask: jnp.ndarray,
                   config: SolverConfig = SolverConfig()) -> RegistrationSolution:
    """vmap of the solver over a leading batch of scan pairs.

    The reference has no batch axis at all (single pair per process); this is
    the TPU throughput path — per-pair failure is masked via solution.valid.
    """
    return jax.vmap(lambda s, t, m: register_correspondences(s, t, m, config)
                    )(src, tgt, mask)
