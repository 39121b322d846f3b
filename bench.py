"""Benchmark: full-pipeline registration throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: >100 registrations/s/chip (BASELINE.md build targets);
the reference C++ pipeline runs ~5 pairs/s on 4 CPU threads (~0.2 s
front-end per pair, reference README.md:104).

Measurement-integrity design (this file is the round's official perf
artifact, so the number must be self-verifying):

1. **Dependency-chained dispatches.** Every timed call folds a scalar
   carry derived from the PREVIOUS call's outputs (valid count + pose
   checksum) into its own input, so the device cannot overlap or drop
   calls and no host-side sync primitive is trusted.
2. **In-band correctness + timing gate.** The timed region ends with a
   device-to-host fetch of the final carry — a value data-dependent on
   every pose produced in the run. Timing cannot close before all work
   drains, and the fetched carry reports the valid-pair count for the
   exact program that was timed (always present in the JSON).
3. **Roofline sanity bound.** XLA's compiled cost analysis gives bytes
   accessed + FLOPs per call; the reported pairs/s must respect the
   HBM-bandwidth bound (v5e ~0.82 TB/s) or the bench refuses to report
   it and headlines the bound instead ("roofline_violated": true).

The headline is the batched serving pattern: jit(vmap(pipeline)) over
B pairs per device call. ``--streaming`` also measures chained
single-pair dispatch (the latency pattern); it is off by default
because each extra jitted program costs ~10 min of remote axon compile.
"""

import argparse
import json
import sys
import time

import numpy as np

_T0 = time.time()

# TPU v5 lite HBM bandwidth (~819 GB/s). Used only as an upper-bound
# sanity check on the reported throughput, never to compute it.
HBM_BYTES_PER_S = 8.19e11
# Peak MXU throughput, bf16 ~394 TFLOP/s / f32 ~197 on v5e-class chips;
# use the f32 figure since the pipeline pins HIGHEST on pose math.
PEAK_FLOPS = 1.97e14


def _log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _cost_analysis(compiled):
    """(bytes_accessed, flops) per call from XLA's compiled cost model,
    or (None, None) when the backend doesn't expose them."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed", 0.0)) or None, \
            float(ca.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001 — remote backends vary
        _log(f"cost_analysis unavailable: {e}")
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_pairs", nargs="?", type=int, default=8,
                    help="distinct synthetic scan pairs to cycle through")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--calls", type=int, default=32,
                    help="max chained device calls per timed trial "
                         "(auto-shrunk to fit --budget-s)")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--budget-s", type=float, default=600.0,
                    help="wall-clock budget for the TIMED section; calls "
                         "per trial adapt to the measured warmup call time "
                         "so the JSON always lands before a driver timeout")
    ap.add_argument("--points", type=int, default=131072,
                    help="raw point capacity per scan")
    ap.add_argument("--streaming", action="store_true",
                    help="also measure chained single-pair dispatch "
                         "(second remote compile, ~10 min)")
    ap.add_argument("--stack", action="store_true",
                    help="A/B: enable the stacked 2x-batch preprocessing "
                         "(measured SLOWER, 48 vs 70 pairs/s round 4 — "
                         "off by default so the official bench measures "
                         "the production PipelineConfig)")
    ap.add_argument("--hypotheses", type=int, default=4,
                    help="SolverConfig.num_hypotheses: clique-ranked "
                         "hypotheses. The DEFAULT is the round-5 shipping "
                         "config (h4 + 2 vote hypotheses) — the exact "
                         "configuration the n>=300 accuracy artifact "
                         "scores (EVAL_r05.json), per VERDICT r4 item 1: "
                         "the official bench must measure the production "
                         "config. --hypotheses 1 --votes 0 measures the "
                         "fast single-hypothesis path (~86 pairs/s r5).")
    ap.add_argument("--votes", type=int, default=2,
                    help="SolverConfig.num_vote_hypotheses: extra "
                         "clique-independent (yaw, translation)-vote "
                         "hypotheses (solver/vote.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:  # persistent compile cache (helps CPU/local backends; the axon
        # remote compile recompiles server-side regardless)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from quatro_tpu.config import FPFHConfig, PipelineConfig, SolverConfig
    from quatro_tpu.io.synthetic import make_scan_pair
    from quatro_tpu.pipeline import register_scan_pair
    from quatro_tpu.types import PointBatch

    batch = args.batch
    config = PipelineConfig(
        max_raw_points=args.points, max_voxels=8192,
        fpfh=FPFHConfig(max_correspondences=1024),
        solver=SolverConfig(num_hypotheses=args.hypotheses,
                            num_vote_hypotheses=args.votes),
        stack_preprocess=args.stack)

    _log(f"device: {jax.devices()[0]}")
    pairs = []
    for s in range(args.n_pairs):
        a, b, _ = make_scan_pair(seed=s, yaw_deg=10.0 + 7 * s,
                                 translation=(2.0 + 0.3 * s, 1.0 - 0.2 * s,
                                              0.05),
                                 cache_dir="/root/repo/.scan_cache")
        pairs.append((PointBatch.from_numpy(a, args.points),
                      PointBatch.from_numpy(b, args.points)))
    n_real = int(np.asarray(pairs[0][0].mask).sum())
    _log(f"{args.n_pairs} distinct scan pairs ready (~{n_real} pts/scan)")

    def make_batch(off):
        return jax.tree.map(
            lambda *l: jnp.stack(l),
            *[pairs[(i + off) % args.n_pairs] for i in range(batch)])
    batches = [make_batch(off) for off in range(4)]

    def _one(s, t):
        res = register_scan_pair(s, t, config)
        return (res.solution.valid, res.solution.rotation,
                res.solution.translation)

    def _chained(step_b):
        """Wrap a batched step so the carry (valid count, pose checksum)
        both accumulates over calls and perturbs the next call's input —
        by exactly 0.0, but through a predicate XLA cannot fold — forcing
        device-side serialization of the whole timed chain."""
        def fn(src, tgt, carry):
            count, chk = carry
            eps = jnp.where(jnp.isnan(chk), 1.0, 0.0).astype(
                src.points.dtype)
            src = PointBatch(src.points + eps, src.mask)
            valid, rot, tr = step_b(src, tgt)
            new_count = count + jnp.sum(valid.astype(jnp.float32))
            new_chk = chk + jnp.sum(rot) + jnp.sum(tr)
            return (new_count, new_chk)
        return fn

    bfn = jax.jit(_chained(jax.vmap(_one)))
    carry0 = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))

    _log(f"compiling batched vmap{batch} pipeline "
         "(remote compile; ~10 min cold)")
    compiled = bfn.lower(*batches[0], carry0).compile()
    bytes_per_call, flops_per_call = _cost_analysis(compiled)
    if bytes_per_call:
        _log(f"cost analysis: {bytes_per_call / 1e9:.2f} GB accessed, "
             f"{(flops_per_call or 0) / 1e12:.2f} TFLOP per call")
    tw0 = time.time()
    warm = compiled(*batches[0], carry0)
    warm_count = float(np.asarray(warm[0]))
    warm_chk = float(np.asarray(warm[1]))
    t_call = time.time() - tw0
    _log(f"batched pipeline compiled + warm; warmup valid "
         f"{warm_count:.0f}/{batch}, checksum {warm_chk:.4f}, "
         f"{t_call:.2f}s/call")
    # Timeout-proofing (VERDICT r2 weak #3): size calls/trials so the timed
    # section fits --budget-s even if the pipeline were 10x slower than the
    # warmup suggests, and print the headline JSON after EVERY completed
    # trial (each line is complete and honest; later lines refine medians).
    per_trial_budget = args.budget_s / max(args.trials, 1)
    calls = max(1, min(args.calls, int(per_trial_budget / max(t_call, 1e-6))))
    if calls < args.calls:
        _log(f"budget {args.budget_s:.0f}s: shrinking calls/trial "
             f"{args.calls} -> {calls}")

    def timed_chain(fn, arg_list, carry_init, n_per_call):
        """One timed trial: dispatch the dependency chain, close timing
        on the host fetch of the final carry. Returns
        (pairs_per_s, valid_total, checksum, elapsed_s)."""
        carry = carry_init
        t0 = time.time()
        for a in arg_list:
            carry = fn(*a, carry)
        count = float(np.asarray(carry[0]))     # gates the clock
        chk = float(np.asarray(carry[1]))
        dt = time.time() - t0
        return n_per_call * len(arg_list) / dt, count, chk, dt

    # --- roofline sanity bound (fixed per compiled program) ---------------
    roofline = {}
    bound = None
    if bytes_per_call:
        bound = batch / (bytes_per_call / HBM_BYTES_PER_S)
        roofline["hbm_bound_pairs_per_s"] = round(bound, 1)
        roofline["bytes_accessed_per_call"] = bytes_per_call
    if flops_per_call:
        roofline["mxu_bound_pairs_per_s"] = round(
            batch / (flops_per_call / PEAK_FLOPS), 1)
        roofline["flops_per_call"] = flops_per_call
    # Conservative floor on traffic: the inputs alone, read once per call.
    input_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                      for x in jax.tree.leaves(batches[0]))
    input_bound = batch / (input_bytes / HBM_BYTES_PER_S)
    roofline["input_bytes_per_call"] = int(input_bytes)
    roofline["input_readonce_bound_pairs_per_s"] = round(input_bound, 1)
    hard_bound = min(b for b in (bound, input_bound) if b is not None)

    def emit(trials, valid_total, final, extra=None):
        batched_pps = float(np.median(trials))
        violated = batched_pps > 1.1 * hard_bound
        if violated:
            _log(f"ROOFLINE VIOLATION: measured {batched_pps:,.0f} pairs/s "
                 f"exceeds the HBM bound {hard_bound:,.0f} — reporting the "
                 "bound; the measurement cannot be trusted")
        reported = min(batched_pps, hard_bound) if violated else batched_pps
        detail = {
            "batched_vmap_pairs_per_s": round(batched_pps, 2),
            "batch": batch,
            "num_hypotheses": args.hypotheses,
            "num_vote_hypotheses": args.votes,
            "chained_calls_per_trial": calls,
            "trials_pairs_per_s": [round(t, 2) for t in trials],
            "trials_complete": f"{len(trials)}/{args.trials}",
            "valid_pairs": f"{valid_total:.0f}/{batch * calls}",
            "warmup_valid": f"{warm_count:.0f}/{batch}",
            "distinct_pairs": args.n_pairs,
            "raw_points_per_scan": n_real,
            "timing": "dependency-chained dispatches; clock closes on host "
                      "fetch of a carry data-dependent on every call",
            "roofline": roofline,
            "roofline_violated": bool(violated),
            "device": str(jax.devices()[0]),
        }
        if extra:
            detail.update(extra)
        print(json.dumps({
            "metric": "full_pipeline_registrations_per_sec_per_chip",
            "value": round(reported, 2),
            "unit": "pairs/s",
            "vs_baseline": round(reported / 100.0, 3),
            "detail": detail,
        }), flush=True)
        return reported

    arg_list = [batches[i % 4] for i in range(calls)]
    trials = []
    valid_total = None
    t_timed0 = time.time()
    for k in range(args.trials):
        pps, count, chk, dt = timed_chain(compiled, arg_list, carry0, batch)
        trials.append(pps)
        valid_total = count
        _log(f"trial {k}: {pps:,.0f} pairs/s over {dt * 1e3:.1f} ms, "
             f"valid {count:.0f}/{batch * calls}, chk {chk:.4f}")
        last = (k == args.trials - 1
                or time.time() - t_timed0 > args.budget_s)
        emit(trials, valid_total, final=last)
        if last:
            break

    stream_pps = None
    stream_valid = None
    if args.streaming:
        # Single-pair chained program: the same vmapped step at B=1.
        sfn = jax.jit(_chained(jax.vmap(_one)))
        ones = [jax.tree.map(lambda x: x[:1], b) for b in batches]
        _log("compiling single-pair pipeline (second remote compile)")
        sfn(*ones[0], carry0)[0].block_until_ready()
        s_args = [ones[i % 4] for i in range(args.calls * 4)]
        st = [timed_chain(sfn, s_args, carry0, 1) for _ in range(args.trials)]
        stream_pps = float(np.median([t[0] for t in st]))
        stream_valid = st[-1][1]
        _log(f"streaming: {stream_pps:,.0f} pairs/s, "
             f"valid {stream_valid:.0f}/{len(s_args)}")
        emit(trials, valid_total, final=True, extra={
            "streaming_single_pair_per_s": round(stream_pps, 2),
            "streaming_valid": f"{stream_valid:.0f}/{len(s_args)}",
        })


if __name__ == "__main__":
    main()
