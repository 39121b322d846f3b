"""Microbenchmark of the TPU primitive ops the preprocessing pipeline is
built from, at production shapes and batch sizes.

Timing methodology is bench.py's (the only one that survives the axon
tunnel, where block_until_ready is NOT a reliable sync): every timed call
perturbs its own input by exactly 0.0 through an ``isnan`` predicate on
the carry (so XLA cannot fold the dependence and calls serialize on
device), the checksum is an order-DEPENDENT weighted sum (a plain sum of
a sorted payload is permutation-invariant and could legalize dead-code
elimination of the sort itself), and the clock closes on a host fetch of
the final carry.

Usage: python tools/microbench_ops.py [--batch 64] [--n 131072]
Each line: {"op": ..., "batch": B, "ms_per_call": t, "ms_per_item": t/B}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--p", type=int, default=581)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=8,
                    help="chained calls per timing")
    ap.add_argument("--inner", type=int, default=4,
                    help="op repetitions inside one jitted call (amortizes "
                    "per-dispatch overhead)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated op-name filter")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B, N, P, CAP = args.batch, args.n, args.p, args.cap
    rng = np.random.default_rng(0)
    key = np.sort(rng.integers(0, P, (B, N)).astype(np.int32), axis=1)
    vals = rng.standard_normal((B, N)).astype(np.float32)
    v2 = rng.standard_normal((B, N)).astype(np.float32)
    v3 = rng.standard_normal((B, N)).astype(np.float32)
    iota = np.broadcast_to(np.arange(N, dtype=np.int32), (B, N)).copy()
    slot = np.minimum(key.astype(np.int64) * CAP
                      + rng.integers(0, CAP, (B, N)), P * CAP).astype(np.int32)
    ptab = rng.standard_normal((B, P)).astype(np.float32)
    pidx = rng.integers(0, N, (B, P)).astype(np.int32)
    has = (rng.random((B, N)) < 0.005)
    # order-dependent checksum weights (cheap, fixed)
    wN = ((np.arange(N) % 97) / 97.0).astype(np.float32)

    d = jax.devices()[0]
    put = lambda x: jax.device_put(x, d)
    key_d, vals_d, v2_d, v3_d, iota_d = map(put, (key, vals, v2, v3, iota))
    slot_d, ptab_d, pidx_d, has_d = map(put, (slot, ptab, pidx, has))
    wN_d = put(wN)

    def chk_of(out):
        """Order-dependent scalar checksum of an output (any shape whose
        last axis we weight)."""
        w = wN_d[: out.shape[-1]]
        return jnp.sum(out.astype(jnp.float32) * w) * 1e-9

    def bench(name, fn, *xs):
        if args.only and name not in args.only.split(","):
            return

        def body(carry, *inp):
            c = carry
            for _ in range(args.inner):
                # perturb by exactly 0.0 through an unfoldable predicate
                eps = jnp.where(jnp.isnan(c), 1.0, 0.0)
                out = fn(eps, *inp)
                c = c + chk_of(out)
            return c

        f = jax.jit(body)
        c0 = jnp.zeros((), jnp.float32)
        w = f(c0, *xs)
        float(np.asarray(w))  # compile + warm, host-fetch sync
        t0 = time.perf_counter()
        c = c0
        for _ in range(args.reps):
            c = f(c, *xs)
        float(np.asarray(c))  # clock closes on host fetch
        dt = (time.perf_counter() - t0) / (args.reps * args.inner)
        print(json.dumps({"op": name, "batch": B,
                          "ms_per_call": round(dt * 1e3, 3),
                          "ms_per_item": round(dt * 1e3 / B, 4)}),
              flush=True)

    def vsort(*ops):
        return jax.vmap(lambda *b: jax.lax.sort(b, num_keys=1))(*ops)

    bench("sort_k2", lambda e, k, v: vsort(
        k + e.astype(jnp.int32), v)[1], key_d, vals_d)
    bench("sort_k3", lambda e, k, v, w: vsort(
        k + e.astype(jnp.int32), v, w)[1], key_d, vals_d, v2_d)
    bench("sort_k5", lambda e, k, v, w, u, i: vsort(
        k + e.astype(jnp.int32), v, w, u, i)[1],
        key_d, vals_d, v2_d, v3_d, iota_d)
    bench("scatter_set_N_to_table", lambda e, s, v: jnp.zeros(
        (B, P * CAP + 1), jnp.float32)
        .at[jnp.arange(B)[:, None], s].set(v + e)[:, :N], slot_d, vals_d)
    bench("scatter_set_P_to_N", lambda e, pi, pv: jnp.zeros(
        (B, N + 1), jnp.float32)
        .at[jnp.arange(B)[:, None], pi].set(pv + e)[:, :N], pidx_d, ptab_d)
    bench("cumsum_N", lambda e, v: jnp.cumsum(v + e, axis=1), vals_d)
    bench("cummax_N", lambda e, v: jax.lax.cummax(v + e, axis=1), vals_d)

    def ffill(e, h, a, b2, b3):
        def op(l, r):
            lh, lv = l
            rh, rv = r
            return (lh | rh, tuple(jnp.where(rh, rc, lc)
                                   for lc, rc in zip(lv, rv)))
        _, out = jax.lax.associative_scan(
            op, (h, (a + e, b2, b3, a * 2, b2 * 2)), axis=1)
        return out[0]
    bench("forward_fill_5ch", ffill, has_d, vals_d, v2_d, v3_d)

    def segscan10(e, h, a):
        def op(l, r):
            lh, lv = l
            rh, rv = r
            gate = jnp.where(rh, 0.0, 1.0)
            return (lh | rh, tuple(rc + gate * lc for lc, rc in zip(lv, rv)))
        chans = tuple(a * (0.1 * k) + e for k in range(10))
        _, out = jax.lax.associative_scan(op, (h, chans), axis=1)
        return out[0]
    bench("segsum_scan_10ch", segscan10, has_d, vals_d)

    bench("searchsorted_P", lambda e, k: jax.vmap(
        lambda kk: jnp.searchsorted(kk, jnp.arange(P + 1, dtype=jnp.int32)))(
        k + e.astype(jnp.int32)).astype(jnp.float32), key_d)
    bench("top_k_8192", lambda e, v: jax.lax.top_k(v + e, 8192)[0], vals_d)
    bench("gather_N_from_P", lambda e, k, t: jnp.take_along_axis(
        t + e, jnp.clip(k, 0, P - 1), axis=1), key_d, ptab_d)

    def onehot_lookup(e, k, t):
        oh = jax.nn.one_hot(jnp.clip(k, 0, P - 1), P, dtype=jnp.bfloat16)
        return jnp.einsum("bnp,bp->bn", oh, (t + e).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    bench("onehot_matmul_N_from_P", onehot_lookup, key_d, ptab_d)

    def scatter_min_img(e, fl, v):
        return jnp.full((B, 115200 + 1), 1e30, jnp.float32).at[
            jnp.arange(B)[:, None], jnp.clip(fl, 0, 115200)].min(
            v + e)[:, :N]
    bench("scatter_min_N_to_img", scatter_min_img, slot_d, vals_d)

    print(json.dumps({"device": str(jax.devices()[0]),
                      "inner": args.inner, "reps": args.reps}),
          file=sys.stderr)


if __name__ == "__main__":
    main()
