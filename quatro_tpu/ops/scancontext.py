"""Place recognition: Scan Context descriptors, TPU-native.

The reference repo registers one hand-picked pair and has no loop
DETECTION at all; its trajectory-scale sibling (Quatro++, IJRR'24) pairs
the registration with a place-recognition front end. This module provides
that front end so `sequence.run_sequence` can find loop-closure
candidates from the scans alone (no ground-truth poses, no ROS):

- descriptor: the Scan Context polar max-height image (Kim & Kim, IROS'18
  — public method) — a (rings, sectors) grid over (range, azimuth), each
  cell the max point height; computed with one segment_max scatter;
- yaw invariance: similarity maximized over all sector-wise circular
  shifts of the query. All S shifts evaluate as ONE batched einsum on the
  MXU (column-cosine mean), not a loop;
- retrieval: a rotation-invariant ring key (per-ring occupancy) prunes
  the database by L1 distance, then the full shifted-cosine score ranks
  survivors. Both stages are dense matmul/top_k work — no trees.

Calibration (ray-cast urban scenes, VLP-16, 120 sectors): revisiting the
same spot at any heading scores <= ~0.13 (worst-case half-sector
misalignment), 1-2.5 m displaced revisits 0.30-0.45, different places
0.70+. The default acceptance threshold (0.5) is deliberately loose:
a false candidate costs one registration that the alignment-overlap gate
then rejects, while a missed candidate loses a loop forever.

Shapes are static; everything jits and vmaps.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_rings", "n_sectors"))
def scan_context(points: jnp.ndarray, mask: jnp.ndarray,
                 n_rings: int = 20, n_sectors: int = 120,
                 max_range: float = 80.0,
                 min_height: float = -2.0) -> jnp.ndarray:
    """(n_rings, n_sectors) max-height polar descriptor of one scan.

    Heights are sensor-relative, offset so empty cells (no points) sit at
    0 and occupied cells are positive — matching the original's use of 0
    as the 'no return' value.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = jnp.sqrt(x * x + y * y)
    ring = jnp.clip((r / max_range * n_rings).astype(jnp.int32),
                    0, n_rings - 1)
    sector = jnp.clip(((jnp.arctan2(y, x) + jnp.pi) / (2 * jnp.pi)
                       * n_sectors).astype(jnp.int32), 0, n_sectors - 1)
    cell = ring * n_sectors + sector
    valid = mask & (r <= max_range)
    # dump slot for invalid points; segment_max with -inf init
    cell = jnp.where(valid, cell, n_rings * n_sectors)
    h = jnp.where(valid, z - min_height, -jnp.inf)
    img = jax.ops.segment_max(h, cell,
                              num_segments=n_rings * n_sectors + 1,
                              indices_are_sorted=False)
    img = jnp.maximum(img[:-1], 0.0)  # empty cells -> 0
    return img.reshape(n_rings, n_sectors)


def ring_key(desc: jnp.ndarray) -> jnp.ndarray:
    """(n_rings,) rotation-invariant occupancy ratio per ring."""
    return jnp.mean((desc > 0).astype(desc.dtype), axis=-1)


@jax.jit
def sc_distance(query: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """Yaw-invariant Scan Context distance in [0, 1] (0 = same place).

    The original's column-wise cosine distance, minimized over all sector
    shifts of the query: all shifts at once via one einsum over a rolled
    stack (S x the work, MXU-friendly; S=120 is tiny).
    """
    s = query.shape[-1]
    shifts = jnp.stack([jnp.roll(query, k, axis=-1) for k in range(s)])
    num = jnp.einsum("krs,rs->ks", shifts, cand,
                     precision=jax.lax.Precision.HIGHEST)
    qn = jnp.linalg.norm(shifts, axis=-2)            # (S, s)
    cn = jnp.linalg.norm(cand, axis=-2)              # (s,)
    denom = jnp.maximum(qn * cn[None, :], 1e-9)
    # columns where either side is empty carry no evidence
    on = (qn > 0) & (cn > 0)[None, :]
    cos = jnp.where(on, num / denom, 0.0)
    n_on = jnp.maximum(jnp.sum(on, axis=-1), 1)
    sim = jnp.sum(cos, axis=-1) / n_on               # (S,)
    return 1.0 - jnp.max(sim)


@partial(jax.jit, static_argnames=("ring_prune",))
def _best_earlier_match(descs, keys, j, pool, ring_prune: int):
    """(best index, best distance) among frames < pool for query frame j.
    Fixed shapes for every j: the candidate pool is masked, not sliced, so
    ONE compiled program serves the whole sequence (remote compiles cost
    minutes per distinct shape — see CLAUDE.md)."""
    m = keys.shape[0]
    in_pool = jnp.arange(m) < pool
    kd = jnp.where(in_pool,
                   jnp.sum(jnp.abs(keys - keys[j]), axis=-1), jnp.inf)
    _, idx = jax.lax.top_k(-kd, ring_prune)
    dists = jax.vmap(lambda i: sc_distance(descs[j], descs[i]))(idx)
    dists = jnp.where(in_pool[idx], dists, jnp.inf)
    best = jnp.argmin(dists)
    return idx[best], dists[best]


def detect_loop_candidates(descs: jnp.ndarray, min_gap: int = 3,
                           max_distance: float = 0.5,
                           ring_prune: int = 10) -> List[Tuple[int, int]]:
    """Loop-closure candidate pairs (i, j), i < j with j - i > min_gap
    (matching run_sequence's gt-proximity oracle), from (M, R, S)
    descriptors: for each frame j, prune earlier frames by ring-key L1
    distance to `ring_prune` survivors, score those with the full
    shifted-cosine distance, and keep the best if it clears
    `max_distance`. Host-side loop over frames (M is small); the per-frame
    math is one fixed-shape jitted program."""
    descs = jnp.asarray(descs)
    m = descs.shape[0]
    keys = jax.vmap(ring_key)(descs)                 # (M, R)
    prune = min(ring_prune, max(m - min_gap - 1, 1))
    out: List[Tuple[int, int]] = []
    for j in range(min_gap + 1, m):
        i, d = _best_earlier_match(descs, keys, j, j - min_gap, prune)
        if float(d) <= max_distance:
            out.append((int(i), j))
    return out
