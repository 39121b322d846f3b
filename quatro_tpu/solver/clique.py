"""Inlier selection on the consistency graph: the max-clique replacement.

The reference delegates to the external PMC library (12 CPU threads,
branch-and-bound + k-core heuristics; reference: src/graph.cc:12-130).
Branch-and-bound is serial-hostile, so the TPU-native design replaces it with
two data-parallel primitives that together match PMC_HEU's behaviour:

1. **k-core extraction** by fixed-point peeling (PMC's own bound + its
   KCORE_HEU mode, src/graph.cc:59-82): repeatedly drop vertices with fewer
   than k surviving neighbours; binary-search the largest non-empty k.
   Each peel step is one (N,N)x(N,) mat-vec on the MXU.

2. **batched greedy clique growth** (the parallel analog of pmc_heu's
   kcore-seeded greedy search): from S seed vertices of maximal core,
   repeatedly add the candidate with the highest degree inside the shrinking
   candidate set. All S seeds grow simultaneously — each growth step is one
   (S,N)x(N,N) matmul — and the largest resulting clique wins.

Downstream GNC is robust to a slightly sub-maximal clique ("accuracy is not
very important because Quatro is extremely robust", reference README.md:100).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _count_mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Counting matmul over 0/1 operands: bf16 inputs (0/1 is EXACT in
    bf16) with f32 accumulation — exact integer counts at half the HBM
    traffic of an f32 matmul. The adjacency re-reads inside the peel /
    growth loops are this solver's dominant memory cost (4 MB x batch per
    matvec in f32)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _peel_to_kcore(adj_f: jnp.ndarray, alive: jnp.ndarray, k) -> jnp.ndarray:
    """Fixed point of 'remove alive vertices with < k alive neighbours'.

    adj_f: (N, N) float adjacency; alive: (N,) float mask; k: scalar.
    Returns the k-core membership as a float mask.
    """

    def cond(state):
        alive, changed = state
        return changed

    def body(state):
        alive, _ = state
        deg = _count_mm(adj_f, alive)
        new_alive = alive * (deg >= k).astype(alive.dtype)
        changed = jnp.any(new_alive != alive)
        return new_alive, changed

    out, _ = jax.lax.while_loop(cond, body, (alive, jnp.asarray(True)))
    return out


def max_kcore(adj: jnp.ndarray, mask: jnp.ndarray):
    """Largest k with a non-empty k-core, plus that core's membership mask.

    Binary search over k in [0, max_degree]; each probe runs peeling to a
    fixed point. Equivalent to PMC's compute_cores()/get_max_core bound
    (src/graph.cc:59-61) without per-vertex serial bucket updates.
    """
    adj_f = adj.astype(jnp.bfloat16)
    alive0 = mask.astype(jnp.float32)
    deg0 = _count_mm(adj_f, alive0)
    hi = jnp.max(jnp.where(mask, deg0, 0.0)).astype(jnp.int32)

    def body(state):
        lo, hi, best_core = state
        mid = (lo + hi + 1) // 2
        # WARM-STARTED probe: every binary-search midpoint satisfies
        # mid > lo, and the k-core is antitone in k, so the mid-core is a
        # subset of the current best (lo-)core — peeling can start from
        # best_core instead of the full vertex set. Fewer peel iterations
        # per probe (round 5: max_kcore was 0.27 ms/pair of the 0.89
        # ms/pair clique-selection stage).
        core = _peel_to_kcore(adj_f, best_core, mid.astype(jnp.float32))
        nonempty = jnp.sum(core) > 0
        lo = jnp.where(nonempty, mid, lo)
        hi = jnp.where(nonempty, hi, mid - 1)
        best_core = jnp.where(nonempty, core, best_core)
        return lo, hi, best_core

    def cond(state):
        lo, hi, _ = state
        return lo < hi

    lo, _, best_core = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), hi, alive0))
    return lo, best_core > 0


@partial(jax.jit, static_argnames=("num_seeds", "max_size", "phase1_rounds",
                                   "survivors"))
def grow_greedy_cliques(adj: jnp.ndarray, seed_scores: jnp.ndarray,
                        mask: jnp.ndarray, num_seeds: int = 16,
                        max_size: int = 512, phase1_rounds: int = 8,
                        survivors: int = 16) -> jnp.ndarray:
    """Grow S greedy cliques in lock-step; return (S, N) clique masks
    (rows past the phase-2 survivor count are frozen at their
    phase-1-final state).

    seed_scores ranks seed attractiveness (core-membership + degree).
    Each growth round adds, per seed, the candidate with maximal degree
    within that seed's candidate set — one (S,N)@(N,N) matmul per round.

    TWO-PHASE schedule (round 4; loop cost is rounds x (S, N) traffic and
    rounds == final clique size, ~40-80 on real consistency graphs): all
    S seeds grow `phase1_rounds` rounds, then only the `survivors` most
    promising (largest candidate set — every alive seed has equal size,
    and a seed inside the true clique keeps the remaining clique in its
    candidate set while noise seeds exhaust within a few rounds) continue
    to completion. Quality is pinned by the regret suite
    (tests/test_clique_exact.py, tools/clique_regret.py).
    """
    n = adj.shape[0]
    num_seeds = min(num_seeds, n)
    adj_f = adj.astype(jnp.bfloat16)
    scores = jnp.where(mask, seed_scores, -jnp.inf)
    _, seeds = jax.lax.top_k(scores, num_seeds)  # (S,)

    clique = jax.nn.one_hot(seeds, n, dtype=jnp.float32)      # (S, N)
    cand = (adj_f[seeds] * mask.astype(jnp.bfloat16)
            ).astype(jnp.float32)                             # (S, N)

    def cond(limit):
        def f(state):
            clique, cand, rounds = state
            return jnp.logical_and(jnp.any(jnp.sum(cand, axis=1) > 0),
                                   rounds < limit)
        return f

    def body(state):
        clique, cand, rounds = state
        # degree of each candidate within its candidate set
        deg = _count_mm(cand, adj_f) * cand                    # (S, N)
        # EARLY COMPLETION: when a seed's candidate set is itself a clique
        # (within-cand edge count == c*(c-1)), greedy would add every
        # member one round at a time — absorb it wholesale instead. On
        # planted-clique-like consistency graphs this collapses the ~40-80
        # round tail to a few rounds (identical final cliques; the loop
        # cost is rounds x traffic).
        csz = jnp.sum(cand, axis=1)                            # (S,)
        esum = jnp.sum(deg, axis=1)                            # 2x edges
        # ... but never past the max_size hard cap (greedy adds exactly
        # one vertex per round, so the cap check is per absorption only)
        room = jnp.sum(clique, axis=1) + csz <= float(max_size)
        whole = ((esum == csz * (csz - 1.0)) & (csz > 0) & room
                 ).astype(jnp.float32)[:, None]
        clique = clique + cand * whole
        cand = cand * (1.0 - whole)
        # prefer higher degree; break ties by lower index for determinism
        tiebreak = -jnp.arange(n, dtype=jnp.float32) * 1e-6
        score = jnp.where(cand > 0, deg + tiebreak, -jnp.inf)
        pick = jnp.argmax(score, axis=1)                       # (S,)
        pick_oh = jax.nn.one_hot(pick, n, dtype=jnp.float32)
        has_cand = ((jnp.sum(cand, axis=1) > 0)
                    & (jnp.sum(clique, axis=1) < float(max_size))
                    )[:, None].astype(jnp.float32)
        clique = clique + pick_oh * has_cand
        # candidates must neighbour every clique member -> intersect
        pick_rows = _count_mm(pick_oh, adj_f)                  # (S, N)
        cand = cand * pick_rows * has_cand
        cand = cand * (1.0 - clique)
        return clique, cand, rounds + 1

    if num_seeds <= survivors or phase1_rounds >= max_size:
        clique, _, _ = jax.lax.while_loop(
            cond(max_size - 1), body,
            (clique, cand, jnp.asarray(0, jnp.int32)))
        return clique > 0

    # phase 1: everyone, a few rounds
    clique, cand, r1 = jax.lax.while_loop(
        cond(phase1_rounds), body, (clique, cand,
                                    jnp.asarray(0, jnp.int32)))
    # phase 2: the most promising survivors to completion (the round
    # counter carries over so max_size stays a hard cap on total growth)
    promise = jnp.sum(cand, axis=1)
    _, keep = jax.lax.top_k(promise, survivors)
    c2, d2, _ = jax.lax.while_loop(
        cond(max_size - 1), body, (clique[keep], cand[keep], r1))
    clique = clique.at[keep].set(c2)
    return clique > 0


@partial(jax.jit, static_argnames=("rounds",))
def improve_cliques_1swap(adj: jnp.ndarray, cliques: jnp.ndarray,
                          mask: jnp.ndarray, rounds: int = 4) -> jnp.ndarray:
    """(1,2)-swap local improvement of (K, N) clique masks, vmapped.

    Each round either (a) ADDS an outside vertex adjacent to every member
    (possible only after a swap reopened candidates — greedy growth
    terminates maximal), or (b) performs a (1,2)-SWAP: find v1, v2 outside
    the clique, adjacent to each other, each adjacent to all members except
    the SAME member u; dropping u and adding both grows the clique by one.
    Every step is O(N^2) elementwise/matvec work — no branch-and-bound.
    This narrows the residual gap to PMC_EXACT (reference:
    src/graph.cc:106-127): measured on 900 random graphs at N=64 with 16
    seeds, greedy-only finds the exact maximum on 96.2% (mean regret
    0.039); +2 swap rounds lifts that to 97.2% (mean regret 0.029), and
    with the production seed count (128 >= N) both are exact on all 1350
    graphs measured at N=32 (tools/clique_regret.py).
    """
    if rounds <= 0:
        return cliques
    n = adj.shape[0]
    adj_b = adj.astype(bool)
    adj_f = adj_b.astype(jnp.float32)
    # The swap search runs on a COMPACTED candidate set: only vertices
    # missing exactly one member can participate, and on real consistency
    # graphs there are few of them. The K lowest-index miss1 vertices
    # preserve the original first-pair determinism exactly whenever
    # |miss1| <= K (the (N, N) non-neighbour/pair tables this replaces
    # were ~3x the stage's traffic, measured round 5: 0.42 ms/pair).
    k_cand = min(128, n)

    def one(x0):
        def cond(state):
            _, it, moved = state
            return moved & (it < rounds)

        def body(state):
            x, it, _ = state
            xf = x.astype(jnp.float32)
            s = jnp.sum(xf)
            cnt = adj_f @ xf                       # neighbours inside clique
            outside = ~x & mask
            addable = (cnt == s) & outside
            can_add = jnp.any(addable)
            add_idx = jnp.argmax(addable)          # first addable (determ.)

            miss1 = (cnt == s - 1.0) & outside     # miss exactly one member
            iota = jnp.arange(n, dtype=jnp.int32)
            sel_key = jnp.where(miss1, iota, n)
            _, idx = jax.lax.top_k(-sel_key, k_cand)  # lowest-index miss1
            vsel = jnp.take(sel_key, idx) < n
            rows_b = adj_b[idx]                    # (K, N) row gathers
            asub = jnp.take(rows_b, idx, axis=1)   # (K, K)
            # the one member each selected vertex is NOT adjacent to
            non_nbr = (1.0 - rows_b.astype(jnp.float32)) * xf[None, :]
            uidx = jnp.argmax(non_nbr, axis=1)     # (K,)
            pairs = (asub & vsel[:, None] & vsel[None, :]
                     & (uidx[:, None] == uidx[None, :]))
            flat = pairs.reshape(-1)
            pidx = jnp.argmax(flat)                # first True (determ.)
            can_swap = flat[pidx]
            v1 = idx[pidx // k_cand]
            v2 = idx[pidx % k_cand]
            u = uidx[pidx // k_cand]

            x_add = x.at[add_idx].set(True)
            x_swap = x.at[u].set(False).at[v1].set(True).at[v2].set(True)
            x_new = jnp.where(can_add, x_add, jnp.where(can_swap, x_swap, x))
            return x_new, it + 1, can_add | can_swap

        out, _, _ = jax.lax.while_loop(
            cond, body, (x0, jnp.asarray(0, jnp.int32), jnp.asarray(True)))
        return out

    return jax.vmap(one)(cliques)


def improve_top_cliques(adj: jnp.ndarray, cliques: jnp.ndarray,
                        mask: jnp.ndarray, top: int = 8,
                        rounds: int = 4) -> jnp.ndarray:
    """Apply the 1-swap improvement to the `top` largest of (S, N) cliques
    (improving all S seeds would cost S (N,N) buffers; the winner after
    improvement is overwhelmingly among the pre-improvement top few)."""
    if rounds <= 0:
        return cliques
    top = min(top, cliques.shape[0])
    sizes = jnp.sum(cliques.astype(jnp.int32), axis=1)
    _, idx = jax.lax.top_k(sizes, top)
    improved = improve_cliques_1swap(adj, cliques[idx], mask, rounds=rounds)
    return cliques.at[idx].set(improved)


def greedy_cliques(adj: jnp.ndarray, seed_scores: jnp.ndarray,
                   mask: jnp.ndarray, num_seeds: int = 16,
                   max_size: int = 512, swap_rounds: int = 0) -> jnp.ndarray:
    """Best single clique mask from the lock-step greedy growth (+ optional
    1-swap local improvement of the top candidates)."""
    cliques = grow_greedy_cliques(adj, seed_scores, mask,
                                  num_seeds=num_seeds, max_size=max_size)
    cliques = improve_top_cliques(adj, cliques, mask, rounds=swap_rounds)
    sizes = jnp.sum(cliques, axis=1)
    return cliques[jnp.argmax(sizes)]


@partial(jax.jit, static_argnames=("cap", "max_steps"))
def exact_max_clique_bb(adj: jnp.ndarray, mask: jnp.ndarray,
                        incumbent: jnp.ndarray | None = None,
                        cap: int = 64, max_steps: int = 20000):
    """Exact branch-and-bound max clique (PMC_EXACT production parity).

    The reference exposes exact search via pmc's branch-and-bound
    (reference: src/graph.cc:106-127, modes PMC_EXACT/search_dense). This
    is its TPU-resident equivalent for small-N/offline runs: an iterative
    Carraghan-Pardalos DFS in one ``lax.while_loop`` — an explicit frame
    stack of (candidate-set, clique-set) boolean vectors, the |C|+|P|
    bound for pruning, and an optional warm-start incumbent (the greedy
    clique) that prunes most of the tree immediately.

    The search runs on the `cap` highest-scored vertices of the max
    k-core (score = core membership then degree, the same ordering the
    greedy search seeds from): any clique is contained in the k-core of
    its own size, so for the ~95%-outlier consistency graphs this solver
    targets, the true max clique survives the restriction whenever the
    max core is <= cap — `restricted` reports when that does NOT hold.

    Returns (clique mask (N,) bool, completed () bool, restricted ()
    bool). ``completed`` is False when max_steps was exhausted (the
    incumbent so far is still returned — the analog of pmc's
    max_clique_time_limit wall-clock cap, include/quatro.hpp:246).
    """
    n = adj.shape[0]
    cap = min(cap, n)
    adj_b = adj & mask[:, None] & mask[None, :]
    adj_b = adj_b & ~jnp.eye(n, dtype=bool)

    scores = clique_seed_scores(adj, mask)
    scores = jnp.where(mask, scores, -jnp.inf)
    _, vsel = jax.lax.top_k(scores, cap)                   # (cap,) indices
    vvalid = mask[vsel] & (scores[vsel] > -jnp.inf)
    sub = adj_b[vsel][:, vsel] & vvalid[:, None] & vvalid[None, :]

    # restriction check: did the cap cut into the max k-core?
    _, core_mask = max_kcore(adj_b, mask)
    core_in = core_mask & mask
    restricted = jnp.sum(core_in) > jnp.sum(core_in[vsel] & vvalid)

    if incumbent is not None:
        inc_sub = incumbent[vsel] & vvalid
        # usable only if the whole incumbent lives inside the restriction
        inc_ok = jnp.sum(inc_sub) == jnp.sum(incumbent & mask)
        best_set0 = jnp.where(inc_ok, inc_sub, jnp.zeros((cap,), bool))
    else:
        best_set0 = jnp.zeros((cap,), bool)
    best_size0 = jnp.sum(best_set0).astype(jnp.int32)

    depth = cap + 2
    p_stk = jnp.zeros((depth, cap), bool).at[0].set(vvalid)
    c_stk = jnp.zeros((depth, cap), bool)

    def cond(st):
        _, _, sp, _, _, steps = st
        return (sp > 0) & (steps < max_steps)

    def body(st):
        p_stk, c_stk, sp, best_size, best_set, steps = st
        sp1 = sp - 1
        p = p_stk[sp1]
        c = c_stk[sp1]
        csz = jnp.sum(c).astype(jnp.int32)
        psz = jnp.sum(p).astype(jnp.int32)
        improved = csz > best_size
        best_size = jnp.where(improved, csz, best_size)
        best_set = jnp.where(improved, c, best_set)
        promising = (csz + psz > best_size) & (psz > 0)
        v = jnp.argmax(p)                       # first candidate in order
        vm = jnp.zeros((cap,), bool).at[v].set(True)
        p_ex = p & ~vm
        p_in = p & jnp.take(sub, v, axis=0)
        c_in = c | vm
        # exclude-branch frame replaces the popped slot; include on top
        p_stk = p_stk.at[sp1].set(jnp.where(promising, p_ex, p))
        p_stk = p_stk.at[sp1 + 1].set(p_in)
        c_stk = c_stk.at[sp1 + 1].set(c_in)
        sp = jnp.where(promising, sp1 + 2, sp1)
        return p_stk, c_stk, sp, best_size, best_set, steps + 1

    _, _, sp, best_size, best_set, steps = jax.lax.while_loop(
        cond, body,
        (p_stk, c_stk, jnp.asarray(1, jnp.int32), best_size0, best_set0,
         jnp.asarray(0, jnp.int32)))
    completed = sp == 0
    out = jnp.zeros((n,), bool).at[vsel].set(best_set & vvalid)
    return out, completed, restricted


def clique_seed_scores(adj: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Seed attractiveness for greedy growth: max-core membership
    dominates, degree breaks ties (shared by select_inliers and
    register_hypotheses so the two paths cannot drift)."""
    _, kcore_mask = max_kcore(adj, mask)
    deg = _count_mm(adj, mask)
    return kcore_mask.astype(jnp.float32) * 1e6 + deg


@partial(jax.jit, static_argnames=("k", "min_distinct_frac", "force_first"))
def top_distinct_cliques(cliques: jnp.ndarray, k: int,
                         min_distinct_frac: float = 0.5,
                         force_first: bool = False):
    """Select the K largest pairwise-DISTINCT cliques from (S, N) masks.

    Multi-hypothesis support: repetitive scenes (building facades, fences)
    produce several mutually-inconsistent self-consistent cliques, and the
    LARGEST is not always the correct one — planar aliasing can make the
    wrong structure win the consensus deterministically. Downstream, each
    hypothesis is solved and arbitrated by geometric overlap verification
    (solver/verify.py), which the aliased pose fails.

    Two cliques are 'the same hypothesis' when their intersection covers
    >= min_distinct_frac of the smaller one. With force_first, row 0 of
    `cliques` is always the first selection regardless of size (used to
    pin hypothesis 0 to the configured single-solve selection). Returns
    ((K, N) bool masks, (K,) sizes); unfilled slots repeat the best
    clique with size 0. k is clamped to the number of rows.
    """
    s, n = cliques.shape
    k = min(k, s)
    cf = cliques.astype(jnp.float32)
    sizes = jnp.sum(cf, axis=1)
    sort_key = sizes
    if force_first:
        sort_key = sizes + jnp.zeros_like(sizes).at[0].set(1e9)
    order = jnp.argsort(-sort_key)
    cf = cf[order]
    sizes = sizes[order]
    inter = _count_mm(cf, cf.T)                          # (S, S)
    min_sz = jnp.minimum(sizes[:, None], sizes[None, :])

    def body(i, state):
        taken, count = state
        conflict = taken & (inter[i] >= min_distinct_frac
                            * jnp.maximum(min_sz[i], 1.0))
        # singletons (isolated seeds) carry no hypothesis — the reference
        # aborts on cliques <= 1 (include/quatro.hpp:809-813)
        ok = (count < k) & ~jnp.any(conflict) & (sizes[i] > 1)
        return taken.at[i].set(ok), count + ok.astype(jnp.int32)

    taken, _ = jax.lax.fori_loop(
        0, s, body, (jnp.zeros((s,), bool), jnp.asarray(0, jnp.int32)))

    iota = jnp.arange(s)
    pick_order = jnp.argsort(jnp.where(taken, iota, s + iota))[:k]
    picked = cf[pick_order] > 0                          # (K, N)
    picked_sizes = jnp.where(jnp.arange(k) < jnp.sum(taken),
                             sizes[pick_order], 0.0)
    return picked, picked_sizes


def select_inliers_with_candidates(adj: jnp.ndarray, mask: jnp.ndarray,
                                   kcore_threshold: float = 0.5,
                                   num_seeds: int = 16, max_size: int = 512,
                                   swap_rounds: int = 0, top: int = 8):
    """select_inliers(mode="clique") AND the improved grown-candidate set,
    computing the k-core, seed scores, growth, and swap improvement ONCE.

    register_hypotheses previously ran the whole growth pipeline twice —
    once inside select_inliers for hypothesis 0 and once for the
    candidate cliques (measured round 5 as part of a 1.4 ms/pair
    multi-hypothesis premium). Selection semantics are identical to
    select_inliers for top == 8 (its improve_top_cliques default); with
    top > 8 more candidates receive swap improvement, which can only
    grow the selected clique.

    Returns (sel (N,), valid (), grown (S, N) improved candidates).
    """
    max_core, kcore_mask = max_kcore(adj, mask)
    scores = kcore_mask.astype(jnp.float32) * 1e6 + _count_mm(adj, mask)
    grown = grow_greedy_cliques(adj, scores, mask, num_seeds=num_seeds,
                                max_size=max_size)
    grown = improve_top_cliques(adj, grown, mask, top=top,
                                rounds=swap_rounds)
    clique_sel = grown[jnp.argmax(jnp.sum(grown, axis=1))] & mask
    kcore_sel = kcore_mask & mask & (max_core >= 1)
    n_valid = jnp.sum(mask).astype(jnp.float32)
    use_kcore = jnp.logical_and(
        max_core >= 1,
        max_core.astype(jnp.float32) >= kcore_threshold * n_valid)
    sel = jnp.where(use_kcore, kcore_sel, clique_sel)
    return sel, jnp.sum(sel) > 1, grown


def select_inliers(adj: jnp.ndarray, mask: jnp.ndarray, mode: str = "clique",
                   kcore_threshold: float = 0.5, num_seeds: int = 16,
                   max_size: int = 512, swap_rounds: int = 0,
                   exact_cap: int = 64, exact_max_steps: int = 20000):
    """Dispatch over the inlier-selection modes of Quatro::Params
    (include/quatro.hpp:184-189,248): clique (PMC analog), kcore
    (KCORE_HEU analog), exact (PMC_EXACT analog — branch-and-bound over
    the k-core restriction, greedy incumbent as warm start), none.

    Returns (inlier_mask (N,) bool, valid () bool). valid is False when the
    selected set has <= 1 vertex (reference aborts there,
    include/quatro.hpp:809-813).
    """
    if mode == "none":
        sel = mask
    elif mode == "exact":
        greedy = greedy_cliques(adj, clique_seed_scores(adj, mask), mask,
                                num_seeds=num_seeds, max_size=max_size,
                                swap_rounds=swap_rounds) & mask
        bb, _, _ = exact_max_clique_bb(adj, mask, incumbent=greedy,
                                       cap=exact_cap,
                                       max_steps=exact_max_steps)
        # BB is seeded with the greedy incumbent so it can only match or
        # beat it — but keep the max as a guard for the truncated case.
        sel = jnp.where(jnp.sum(bb) >= jnp.sum(greedy), bb, greedy)
    else:
        max_core, kcore_mask = max_kcore(adj, mask)
        # An edgeless graph's largest non-empty core is the 0-core = every
        # vertex — but zero edges means NO mutually consistent pair exists,
        # so the k-core answer must be empty, not everything (otherwise a
        # garbage solve sails through as valid=True where the reference
        # aborts, include/quatro.hpp:809-813).
        kcore_sel = kcore_mask & mask & (max_core >= 1)
        if mode == "kcore":
            # reference: src/graph.cc:67-82 — keep vertices of max core.
            sel = kcore_sel
        else:
            clique_sel = greedy_cliques(adj, clique_seed_scores(adj, mask),
                                        mask, num_seeds=num_seeds,
                                        max_size=max_size,
                                        swap_rounds=swap_rounds) & mask
            # k-core shortcut (reference: src/graph.cc:70-82): when the max
            # core NUMBER reaches kcore_threshold * |V|, the core is already
            # a near-clique — use it directly and skip the clique result.
            # threshold=1 -> always clique, 0 -> always k-core, as the
            # reference documents (include/quatro.hpp:249-259).
            n_valid = jnp.sum(mask).astype(jnp.float32)
            use_kcore = jnp.logical_and(
                max_core >= 1,
                max_core.astype(jnp.float32) >= kcore_threshold * n_valid)
            sel = jnp.where(use_kcore, kcore_sel, clique_sel)
    valid = jnp.sum(sel) > 1
    return sel, valid
