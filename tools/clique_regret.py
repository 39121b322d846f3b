"""Greedy-clique regret vs exact max clique (VERDICT round-1 item 3).

Measures the quality of the TPU-native max-clique replacement
(solver/clique.py: k-core peeling + lock-step greedy growth) against an
exact Bron-Kerbosch solver on small random graphs where exactness is
cheap. The reference delegates to PMC (reference: src/graph.cc:12-130)
whose PMC_EXACT mode is branch-and-bound; this tool quantifies how much
clique size the data-parallel replacement gives up ("regret").

Graph families:
  er        - Erdos-Renyi G(n, p) across densities
  planted   - planted k-clique + ER(p) noise (registration-shaped: the
              inliers of a consistent pose form a clique; outlier TIM
              pairs are sparse random edges, cf. quatro.hpp:784-789)

Usage: python tools/clique_regret.py [--graphs 1000] [--n 32] [--seeds 128]
Prints a regret table (share exact / regret-1 / worse, mean regret).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def exact_max_clique(adj_bool: np.ndarray) -> int:
    """Exact maximum-clique size via bitmask Bron-Kerbosch with pivoting.

    adj_bool: (n, n) symmetric bool, no self loops. Exponential worst
    case but instant for n <= ~64 on the sparse consistency graphs here.
    """
    n = adj_bool.shape[0]
    nbr = [0] * n
    for i in range(n):
        row = 0
        for j in range(n):
            if adj_bool[i, j] and i != j:
                row |= 1 << j
        nbr[i] = row
    best = 0

    def bk(r_count: int, p: int, x: int):
        nonlocal best
        if p == 0 and x == 0:
            best = max(best, r_count)
            return
        if r_count + bin(p).count("1") <= best:
            return  # bound: even taking all of P cannot beat best
        # pivot: vertex in P|X with most neighbours in P
        px = p | x
        pivot, pivot_deg = -1, -1
        m = px
        while m:
            v = (m & -m).bit_length() - 1
            m &= m - 1
            d = bin(p & nbr[v]).count("1")
            if d > pivot_deg:
                pivot, pivot_deg = v, d
        cand = p & ~nbr[pivot]
        while cand:
            v = (cand & -cand).bit_length() - 1
            cand &= cand - 1
            vb = 1 << v
            bk(r_count + 1, p & nbr[v], x & nbr[v])
            p &= ~vb
            x |= vb
    bk(0, (1 << n) - 1, 0)
    return best


def make_er(rng, n, p):
    a = rng.random((n, n)) < p
    a = np.triu(a, 1)
    return a | a.T


def make_planted(rng, n, k, p):
    a = make_er(rng, n, p)
    idx = rng.choice(n, size=k, replace=False)
    a[np.ix_(idx, idx)] = True
    np.fill_diagonal(a, False)
    return a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=1000,
                    help="graphs per (family, density) cell")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=128,
                    help="greedy seed count (SolverConfig.clique_num_seeds)")
    ap.add_argument("--swap-rounds", type=int, default=0,
                    help="(1,2)-swap local-improvement rounds "
                         "(SolverConfig.clique_swap_rounds)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from quatro_tpu.solver.clique import (clique_seed_scores,
                                          greedy_cliques)

    n = args.n
    rng = np.random.default_rng(0)
    mask = jnp.ones((n,), bool)

    @jax.jit
    def greedy_best_size(adj):
        scores = clique_seed_scores(adj, mask)
        best = greedy_cliques(adj, scores, mask,
                              num_seeds=min(args.seeds, n),
                              swap_rounds=args.swap_rounds)
        return jnp.sum(best.astype(jnp.int32))

    cells = []
    for p in (0.05, 0.1, 0.2, 0.4, 0.6):
        cells.append((f"er p={p}", [make_er(rng, n, p)
                                    for _ in range(args.graphs)]))
    for k, p in ((4, 0.05), (5, 0.1), (6, 0.2), (8, 0.4)):
        cells.append((f"planted k={k} p={p}",
                      [make_planted(rng, n, k, p)
                       for _ in range(args.graphs)]))

    print(f"{'family':<22s} {'exact':>6s} {'reg=1':>6s} {'reg>=2':>6s} "
          f"{'mean':>7s} {'max':>4s}")
    total = Counter()
    for name, graphs in cells:
        regrets = []
        for a in graphs:
            g = int(greedy_best_size(jnp.asarray(a)))
            e = exact_max_clique(a)
            regrets.append(e - g)
        r = np.array(regrets)
        total.update(Counter(regrets))
        print(f"{name:<22s} {np.mean(r == 0):6.3f} {np.mean(r == 1):6.3f} "
              f"{np.mean(r >= 2):6.3f} {np.mean(r):7.4f} {r.max():4d}")
    ngraphs = sum(total.values())
    exact_share = total[0] / ngraphs
    print(f"\nTOTAL {ngraphs} graphs: exact {exact_share:.4f}, "
          f"mean regret {sum(k * v for k, v in total.items()) / ngraphs:.4f}")


if __name__ == "__main__":
    main()
