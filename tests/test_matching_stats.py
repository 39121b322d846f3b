"""Quantify the shift-structured tuple test vs the reference's i.i.d.
sampling (VERDICT r2 weak #6).

The reference draws ncorr*100 i.i.d. random index triples
(src/teaser_utils/feature_matcher.cc:187-247, srand(time(NULL))); the
TPU redesign tests triples (i, i+s1, i+s2) for 100 host-drawn shift pairs
— the same 3*trials expected participations per candidate, but triples
share (s1, s2) across i (mutually correlated). This test measures the
inlier-recall and outlier-leak deltas between the two samplers on random
synthetic match sets at equal trial counts and pins them to stay small.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quatro_tpu.ops.matching import tuple_test_keep


import pytest as _pytest


@_pytest.fixture()
def rng():
    # LOCAL fixed seed: the session-scoped conftest rng advances
    # across tests, so using it makes results depend on suite
    # composition; these differential tests must be standalone-
    # deterministic.
    return np.random.default_rng(779)


pytestmark = pytest.mark.slow


def _match_set(rng, n=256, inlier_rate=0.3, noise=0.02):
    """Random correspondence set: inliers follow one rigid yaw+t transform,
    outliers map to unrelated points."""
    src = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    yaw = rng.uniform(-np.pi, np.pi)
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = rng.uniform(-5, 5, 3).astype(np.float32)
    tgt = src @ rot.T + t + rng.normal(0, noise, (n, 3)).astype(np.float32)
    inlier = rng.uniform(size=n) < inlier_rate
    tgt[~inlier] = rng.uniform(-30, 30, ((~inlier).sum(), 3))
    return src, tgt, inlier


def _iid_tuple_test(src, tgt, trials_per_corr, tuple_scale, rng):
    """Faithful NumPy i.i.d. oracle of feature_matcher.cc:187-247."""
    n = src.shape[0]
    keep = np.zeros(n, bool)
    idx = rng.integers(0, n, size=(n * trials_per_corr, 3))
    good = (idx[:, 0] != idx[:, 1]) & (idx[:, 1] != idx[:, 2]) \
        & (idx[:, 0] != idx[:, 2])
    idx = idx[good]
    p = src[idx]                       # (T, 3, 3)
    q = tgt[idx]
    li = np.linalg.norm(p - np.roll(p, -1, axis=1), axis=2)  # (T, 3)
    lj = np.linalg.norm(q - np.roll(q, -1, axis=1), axis=2)
    ok = np.all((li * tuple_scale < lj) & (lj < li / tuple_scale), axis=1)
    keep[idx[ok].ravel()] = True
    return keep


def test_shift_structured_vs_iid_statistics(rng):
    trials, scale = 100, 0.95
    rec_d, leak_d = [], []
    for k in range(20):
        src, tgt, inlier = _match_set(rng, inlier_rate=0.2 + 0.02 * k)
        n = src.shape[0]
        cs = tuple(jnp.asarray(src[:, c]) for c in range(3))
        ct = tuple(jnp.asarray(tgt[:, c]) for c in range(3))
        keep_s = np.asarray(tuple_test_keep(
            cs, ct, jnp.ones(n, bool), jnp.asarray(n, jnp.int32),
            tuple_scale=scale, trials_per_corr=trials, seed=k))
        keep_i = _iid_tuple_test(src, tgt, trials, scale,
                                 np.random.default_rng(1000 + k))
        rec_s = keep_s[inlier].mean()
        rec_i = keep_i[inlier].mean()
        leak_s = keep_s[~inlier].mean()
        leak_i = keep_i[~inlier].mean()
        rec_d.append(rec_s - rec_i)
        leak_d.append(leak_s - leak_i)
    rec_d, leak_d = np.asarray(rec_d), np.asarray(leak_d)
    # measured bound (documented in docs/architecture.md): the samplers
    # agree on inlier recall to a few percent and on outlier leak closely
    assert abs(rec_d.mean()) < 0.05, f"recall delta {rec_d.mean():.3f}"
    assert np.abs(rec_d).max() < 0.15, f"worst recall delta {rec_d}"
    assert abs(leak_d.mean()) < 0.05, f"leak delta {leak_d.mean():.3f}"
