"""Benchmark: full-pipeline registration throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >100 registrations/s/chip (BASELINE.md build targets);
the reference C++ pipeline runs ~5 pairs/s on 4 CPU threads (~0.2 s
front-end per pair, reference README.md:104).

The headline is the batched serving pattern: jit(vmap(pipeline)) over B=64
scan pairs per device call — it amortizes per-op dispatch overheads on the
many small stages (the MXU stages are already batched). Pass ``--streaming``
to also measure async single-pair dispatch (the latency pattern); it is off
by default because each extra jitted program costs ~10 min of remote axon
compile that the persistent compile cache cannot skip (compilation happens
on the tunnel's far side), and the batched number is strictly the faster
of the two.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.time()


def _median_throughput(fn, args, n_per_call, n_calls, trials, get_out):
    best = []
    outs = []
    for _ in range(trials):
        outs = []
        t0 = time.time()
        for a in args[:n_calls]:
            outs.append(fn(*a))
        import jax
        jax.block_until_ready([get_out(o) for o in outs])
        best.append(n_per_call * n_calls / (time.time() - t0))
    return float(np.median(best)), outs


def main():
    import jax
    import jax.numpy as jnp
    try:  # persistent compile cache (helps CPU/local backends; the axon
        # remote compile recompiles server-side regardless — see docstring)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from quatro_tpu.config import FPFHConfig, PipelineConfig
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch

    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    streaming = "--streaming" in sys.argv
    n_pairs = int(argv[0]) if argv else 8
    # B=64 is the measured HBM ceiling after two memory fixes in
    # ops/matching.py: the NN search is row-blocked (the dense (V, V)
    # distance matrix was 256 MB live per pair) and the tuple test
    # evaluates its 205k random triples in lax.map blocks (the gathered
    # (T, 3, 3) coordinates hit the TPU's minor-dim-3 -> 128-lane padding
    # and alone reached 10-20 GB under a vmap batch). Measured medians:
    # B=16 210k, B=32 256-269k, B=64 617k pairs/s; B=128 fails to compile
    # (HBM).
    batch = 64
    config = PipelineConfig(
        max_raw_points=131072, max_voxels=8192,
        fpfh=FPFHConfig(max_correspondences=1024))

    _log(f"device: {jax.devices()[0]}")
    pairs = []
    for s in range(n_pairs):
        a, b, _ = make_scan_pair(seed=s, yaw_deg=10.0 + 7 * s,
                                 translation=(2.0 + 0.3 * s, 1.0 - 0.2 * s,
                                              0.05),
                                 cache_dir="/root/repo/.scan_cache")
        pairs.append((PointBatch.from_numpy(a, 131072),
                      PointBatch.from_numpy(b, 131072)))
    _log(f"{n_pairs} distinct scan pairs ready (~106k pts/scan)")

    # Batched: stack B pairs (cycling the distinct scans) into one
    # vmapped device call; rotate between offset batches so no two
    # consecutive dispatches see identical inputs.
    def make_batch(off):
        s, t = jax.tree.map(
            lambda *l: jnp.stack(l),
            *[pairs[(i + off) % n_pairs] for i in range(batch)])
        return s, t
    batches = [make_batch(off) for off in range(4)]

    # Return ONLY the pose-sized outputs: keeping the full PipelineResult
    # (correspondence + voxel buffers, ~30 MB/call at B=64) alive across
    # the timed trials made the final device->host fetch stall for 10+
    # minutes on the axon relay. Compute is identical; outputs are small.
    def _step(s, t):
        res = register_scan_pair(s, t, config)
        return (res.solution.valid, res.solution.rotation,
                res.solution.translation)

    bfn = jax.jit(jax.vmap(_step))
    _log("compiling batched vmap64 pipeline (remote compile; ~10 min cold)")
    bout = bfn(*batches[0])
    jax.block_until_ready(bout[1])
    _log("batched pipeline compiled + warm")

    # The steady-state dispatch loop finishes in milliseconds, so a single
    # trial is at the mercy of host/tunnel jitter — run several trials and
    # report the median. Two measured axon-relay hazards to avoid:
    # (1) flooding the dispatch queue (256+ in flight) degrades ~1000x;
    # (2) ANY device->host fetch (np.asarray) mid-stream permanently drops
    #     subsequent async dispatch to ~2.6 pairs/s — so all result fetching
    #     happens ONCE, after the last timed trial.
    batched_pps, bouts = _median_throughput(
        bfn, [batches[i % 4] for i in range(16)], batch, 16, 5,
        lambda o: o[1])
    _log(f"batched: {batched_pps:.0f} pairs/s")

    stream_pps = None
    if streaming:
        fn = jax.jit(lambda s, t: register_scan_pair(s, t, config))
        _log("compiling single-pair pipeline (second remote compile)")
        out = fn(*pairs[0])
        jax.block_until_ready(out.solution.rotation)
        stream_pps, _ = _median_throughput(
            fn, pairs * 8, 1, n_pairs * 8, 5,
            lambda o: o.solution.rotation)
        _log(f"streaming: {stream_pps:.0f} pairs/s")

    # The first device->host fetch after a heavy dispatch burst can stall
    # for many minutes on the axon relay (measured; independent of output
    # size). The throughput number is already on the host — time-box the
    # validity fetch and report without it rather than hanging the bench.
    import threading
    fetched = {}

    def _fetch_valid():
        fetched["n"] = int(np.asarray(bouts[-1][0]).sum())

    th = threading.Thread(target=_fetch_valid, daemon=True)
    th.start()
    th.join(timeout=90)
    if "n" in fetched:
        valid_str = f"{fetched['n']}/{batch}"
    else:
        valid_str = "fetch stalled (axon relay); correctness covered by tests"
        _log("valid-count fetch stalled >90s; reporting without it")
    pairs_per_s = max(batched_pps, stream_pps or 0.0)

    detail = {
        "batched_vmap_pairs_per_s": round(batched_pps, 2),
        "distinct_pairs": n_pairs,
        "valid_pairs": valid_str,
        "raw_points_per_scan": 106000,
        "device": str(jax.devices()[0]),
    }
    if stream_pps is not None:
        detail["streaming_single_pair_per_s"] = round(stream_pps, 2)

    print(json.dumps({
        "metric": "full_pipeline_registrations_per_sec_per_chip",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / 100.0, 3),
        "detail": detail,
    }), flush=True)
    if "n" not in fetched:
        # a stalled in-flight fetch also wedges interpreter teardown —
        # the JSON is out, leave hard.
        import os
        os._exit(0)


if __name__ == "__main__":
    main()
