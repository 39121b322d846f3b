"""Component-wise translation estimation (COTE).

The reference runs, per axis, a serial sweep over 2N sorted interval
endpoints with six running accumulators, then picks the minimum-cost
consensus center (reference: include/quatro.hpp:618-747; driver
include/quatro.hpp:585-615).

TPU-native design: the sweep IS a prefix sum. Sort the 2N endpoint events
once, take cumulative sums of the six epsilon-weighted series, evaluate the
cost at every center simultaneously, and argmin. The "median" mode (Quatro's
contribution over TEASER++, include/quatro.hpp:714-730) gathers the last
n_card event sources below the best center — reproduced exactly, including
its use of raw event order — with one fixed-size gather + sort.

All three axes solve at once via vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CoteResult(NamedTuple):
    translation: jax.Array    # (3,)
    inlier_mask: jax.Array    # (N,) inlier on ALL axes (quatro.hpp:606-614)


def _estimate_axis(x: jnp.ndarray, ranges: jnp.ndarray, mask: jnp.ndarray,
                   use_median: bool, uniform_range: bool = False):
    """Truncated-LS consensus estimate for one axis.

    Port of Quatro::estimate (include/quatro.hpp:618-747) with static
    shapes: masked correspondences contribute zero-weight events sorted to
    the end.  x: (N,) values; ranges: (N,) per-point noise bounds alpha.

    uniform_range=True (the pipeline's case — the driver always passes
    ranges = beta everywhere, mirroring the reference's constant
    noise-bound alphas, include/quatro.hpp:600-604): with a constant
    alpha the six running series collapse — dot_w = card / beta^2,
    dot_xw = sum_x / beta^2 (so x_hat = sum_x / card) and range_rem =
    beta * (M - card) — leaving THREE cumsums; and the sort carries its
    payloads directly (one multi-operand lax.sort) instead of argsort +
    five gathers. Measured round 5: COTE standalone 0.54 ms/pair was
    second only to clique selection in the solver.
    """
    dtype = x.dtype
    n = x.shape[0]
    maskf = mask.astype(dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    # 2N events: interval entries (+1) at x-a, exits (-1) at x+a.
    values = jnp.concatenate([x - ranges, x + ranges])
    eps = jnp.concatenate([maskf, -maskf])                 # 0 for masked
    src_idx = jnp.concatenate([jnp.arange(n), jnp.arange(n)])
    values = jnp.where(eps != 0, values, big)              # masked sort last

    if uniform_range:
        beta = jnp.max(jnp.where(mask, ranges, 0.0))
        x2 = jnp.concatenate([x, x])
        if use_median:
            values, eps_s, x_se, idx_s = jax.lax.sort(
                (values, eps, x2, src_idx), num_keys=1)
        else:
            values, eps_s, x_se = jax.lax.sort((values, eps, x2),
                                               num_keys=1)
            idx_s = None
        x_s = x_se * jnp.abs(eps_s)
        cs3 = jnp.cumsum(jnp.stack([eps_s, eps_s * x_s,
                                    eps_s * x_s * x_s]), axis=-1)
        card, sum_x, sum_x2 = cs3[0], cs3[1], cs3[2]
        total = jnp.sum(maskf)
        inv_b2 = 1.0 / jnp.maximum(beta * beta, 1e-30)
        dot_w = card * inv_b2
        dot_xw = sum_x * inv_b2
        range_rem = beta * (total - card)
    else:
        order = jnp.argsort(values)
        eps_s = eps[order]
        idx_s = src_idx[order]
        x_s = x[idx_s] * jnp.abs(eps_s)
        rng_s = ranges[idx_s] * jnp.abs(eps_s)
        weights = jnp.where(mask,
                            1.0 / jnp.maximum(ranges * ranges, 1e-30), 0.0)
        w_s = weights[idx_s]

        card = jnp.cumsum(eps_s)                           # consensus size
        dot_w = jnp.cumsum(eps_s * w_s)
        dot_xw = jnp.cumsum(eps_s * w_s * x_s)
        sum_x = jnp.cumsum(eps_s * x_s)
        sum_x2 = jnp.cumsum(eps_s * x_s * x_s)
        # `ranges_inverse_sum` (sic) starts at sum(ranges) and decreases
        # by eps*range per event (truncated-loss bookkeeping,
        # quatro.hpp:652,696).
        range_total = jnp.sum(jnp.where(mask, ranges, 0.0))
        range_rem = range_total - jnp.cumsum(eps_s * rng_s)

    x_hat = dot_xw / jnp.where(dot_w == 0, 1.0, dot_w)
    cost = card * x_hat * x_hat + sum_x2 - 2.0 * sum_x * x_hat + range_rem
    valid_center = (card > 0.5) & (eps_s != 0)
    cost = jnp.where(valid_center, cost, big)
    min_idx = jnp.argmin(cost)
    estimate = x_hat[min_idx]

    if use_median:
        # Reference median mode (quatro.hpp:714-730): gather X of the last
        # n_card events at/below min_idx (raw event order, signs ignored),
        # sort ascending, average elements [n/2-1] and [n/2]. NB: the
        # reference applies this even-parity formula for ODD n_card too
        # (quatro.hpp:727-729 has no parity branch), skewing odd-cardinality
        # "medians" toward the lower middle element — reproduced here
        # deliberately for numerical parity with upstream.
        n_card = card[min_idx].astype(jnp.int32)
        j = jnp.arange(n)
        pos = jnp.clip(min_idx - j, 0, 2 * n - 1)
        valid_j = (j < n_card) & (min_idx - j >= 0)
        cand = jnp.where(valid_j, x[idx_s[pos]], big)
        cand = jnp.sort(cand)
        lo = jnp.clip(n_card // 2 - 1, 0, n - 1)
        hi = jnp.clip(n_card // 2, 0, n - 1)
        median = 0.5 * (cand[lo] + cand[hi])
        median = jnp.where(n_card == 1, cand[0], median)
        estimate = jnp.where(n_card > 0, median, estimate)

    inliers = (jnp.abs(x - estimate) <= ranges) & mask
    return estimate, inliers


def solve_translation(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray,
                      noise_bound: float, cbar2: float = 1.0,
                      use_median: bool = True) -> CoteResult:
    """COTE over all three axes (reference: include/quatro.hpp:585-615).

    src here is already scale * R @ src (the driver premultiplies,
    include/quatro.hpp:905-911); raw per-axis values are dst - src.
    """
    dtype = src.dtype
    beta = jnp.asarray(noise_bound, dtype) * jnp.sqrt(jnp.asarray(cbar2, dtype))
    raw = (dst - src).T                           # (3, N)
    ranges = jnp.full_like(raw, beta)

    est, inl = jax.vmap(
        lambda xr, rr, m: _estimate_axis(xr, rr, m, use_median,
                                         uniform_range=True),
        in_axes=(0, 0, None))(raw, ranges, mask)
    return CoteResult(est, jnp.all(inl, axis=0) & mask)
