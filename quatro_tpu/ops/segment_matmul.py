"""Segment-sum and table-lookup over a small group axis as Pallas kernels.

The round-3 patchwork redesign routes per-patch segment sums and
per-patch -> per-point attribute delivery through one-hot matmuls over the
~600-patch axis (measured ~5x cheaper than scatters / forward-fill scans,
tools/microbench_ops.py). A MATERIALIZED one-hot is (N, P_pad) bfloat16 =
168 MB per 131k-point cloud — x64 batch x2 clouds = ~21 GB of HBM, which
cannot exist. These kernels generate each one-hot TILE inside VMEM from an
iota comparison, so HBM sees only the ids, the value channels, and the
outputs.

LAYOUT RULE (the first version OOM'd the compiler at batch 64 purely on
tile padding): every N-sized operand keeps N in the LANE (minor) dimension
— ids are (1, N), value channels are (K, N), the VMEM one-hot tile is
(P_pad, T). A (N, 1) ids column pads 128x in HBM (8.6 GB at production
batch); (1, N) pads only 8x in sublanes.

  segment_sums(ids, vals):  out[p, k] = sum_{i: ids[i]==p} vals[k, i]
      == one_hot.T-contraction on the MXU (grid over N-tiles, accumulated)
  table_lookup(ids, tab):   out[k, i] = tab[ids[i], k]
      (zeros for out-of-range ids)

Both are jit/vmap-compatible (pallas_call adds a batch grid axis under
vmap). The XLA fallback (materialized one-hot einsum) is used off-TPU;
numerics are identical up to f32 matmul accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 8192          # N-tile length (f32 one-hot tile is P_pad x T = 21 MB
                   # VMEM; chained-carry microbenches showed per-grid-step
                   # overhead, not MXU/HBM, dominates these kernels — bigger
                   # tiles halve the step count)
# The new fused kernels keep ~35 MB of one-hot tiles + intermediates live
# at T=4096 — over the DEFAULT 16 MB scoped-VMEM budget but well inside the
# chip's 128 MB VMEM, so they pass an explicit vmem_limit_bytes instead of
# shrinking tiles (T=1024 tiles 4x'd the grid-step overhead and REGRESSED
# patchwork 2.8 -> 3.7 ms/cloud, measured).
_TH = _T           # cross_histogram tile (measured 35.3 MB at T=4096)
_TF = _T           # fused fit/classify tile (measured 34.3 MB at T=4096)
_BIG_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _oh_tile(ids_ref, p_pad, dtype=jnp.float32):
    """(P, T) one-hot tile from a (1, T) ids block, built in VMEM."""
    return (ids_ref[:] == jax.lax.broadcasted_iota(
        jnp.int32, (p_pad, 1), 0)).astype(dtype)


def _split_dot_oh_vals(oh16, vals, dims, terms=3):
    """f32-accurate one-hot contraction in THREE bf16 MXU passes.

    A 0/1 one-hot is EXACT in bf16, so with vals split into three bf16
    terms (hi + mid + lo reconstructs ~26 bits >= f32's 24), the products
    are exact and the f32-accumulated sum equals the f32 dot up to
    accumulation rounding — the same error class as Precision.HIGHEST,
    which runs SIX bf16 passes because it must split BOTH operands
    (measured 0.73 ms/item for the (P, T)x(K, T) segment contraction;
    three passes halve that). A 2-term split was tried first: it only
    reconstructs ~17 bits (7e-6 relative, measured).
    """
    out = None
    rem = vals
    for _ in range(terms):
        part = rem.astype(jnp.bfloat16)
        rem = rem - part.astype(jnp.float32)
        d = jax.lax.dot_general(oh16, part, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def _limits_enabled() -> bool:
    """Active-tile skipping for these kernels is OFF by default.

    Round-5 incident: with the limits on, the kernels were individually
    correct on-chip at B=64 (validated vs NumPy oracles) AND the full
    preprocessing stage composed fine at B=64 — but composing
    preprocessing WITH the feature-extraction stage crashed the TPU
    worker reproducibly ("kernel fault"), and the same program ran with
    the limits disabled. This is the round-4 Mosaic hazard class
    (conditional work on revisited/pipelined blocks misbehaving only at
    specific compositions/batch sizes, see the bidirectional-NN revert),
    where failure can also degrade to SILENT corruption — so the safe
    default is off. QUATRO_KERNEL_LIMITS=1 re-enables for A/B on future
    toolchains; the NN-kernel row/column limits (ops/pallas_frontend.py)
    are unaffected — they are proven in full-pipeline composition.
    """
    import os
    return os.environ.get("QUATRO_KERNEL_LIMITS", "0") == "1"


def _tile_limit(in_range: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(1, 1) int32 count of leading tiles containing ANY in-range id.

    Trailing tiles past the last in-range id hold only dropped ids, so
    skipping their MXU passes is exact for any mask pattern — and these
    kernels are MXU-pass-bound, not memory-bound (docstring above), so
    compute skipping is the whole win. Callers with valid-prefix inputs
    (PointBatch packs valid points first) skip ~20% of tiles at KITTI
    occupancy and ~85% on sparse sensors (VLP-16 in a 131k capacity).
    """
    n = in_range.shape[0]
    if not _limits_enabled():
        return jnp.full((1, 1), (n + tile - 1) // tile, jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    last = jnp.max(jnp.where(in_range, iota + 1, 0))
    return ((last + tile - 1) // tile).astype(jnp.int32)[None, None]


_LIM_SPEC = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


def _seg_kernel(p_pad: int, lim, ids, vals, out):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    @pl.when(i < lim[0, 0])
    def _():
        oh = _oh_tile(ids, p_pad, jnp.bfloat16)   # (P, T)
        # (P, T) x (K, T) contracting T -> (P, K), split-bf16 (see helper)
        out[:] = out[:] + _split_dot_oh_vals(
            oh, vals[:], (((1,), (1,)), ((), ())))


def _lookup_dot(oh16, tab):
    """(P, K) table x (P, T) bf16 one-hot -> (K, T), split-bf16 (the
    one-hot is exact in bf16; the table rides as hi + lo — see
    _split_dot_oh_vals for the accuracy argument)."""
    dims = (((0,), (0,)), ((), ()))
    out = None
    rem = tab
    for _ in range(3):
        part = rem.astype(jnp.bfloat16)
        rem = rem - part.astype(jnp.float32)
        d = jax.lax.dot_general(part, oh16, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def _lookup_kernel(p_pad: int, ids, tab, out):
    oh = _oh_tile(ids, p_pad, jnp.bfloat16)       # (P, T)
    out[:] = _lookup_dot(oh, tab[:])


@functools.partial(jax.jit, static_argnames=("p_pad", "interpret"))
def segment_sums(ids: jnp.ndarray, vals: jnp.ndarray, p_pad: int,
                 interpret: bool = False) -> jnp.ndarray:
    """out[p, k] = sum over i with ids[i] == p of vals[k, i].

    ids: (N,) int32 in [0, p_pad) (out-of-range ids are dropped);
    vals: (K, N) f32, K-major. Returns (p_pad, K) f32. N % 8192 (= _T) == 0
    on the TPU path (the pipeline's capacities are powers of two >= 8192;
    other sizes take the materialized-one-hot fallback, warned on TPU).
    """
    k, n = vals.shape
    if not (jax.default_backend() == "tpu" or interpret) or n % _T != 0:
        if jax.default_backend() == "tpu" and n % _T != 0:
            # The materialized one-hot is (N, p_pad) bf16 — the exact HBM
            # blowup the kernel exists to avoid (~168 MB per 131k cloud).
            import warnings
            warnings.warn(
                f"segment_sums: N={n} is not a multiple of {_T}; taking the"
                " materialized one-hot fallback ON TPU at production scale",
                stacklevel=2)
        oh = (ids[:, None] == jnp.arange(p_pad)[None, :]
              ).astype(jnp.bfloat16)
        return jnp.einsum("np,kn->pk", oh, vals,
                          precision=jax.lax.Precision.HIGHEST)
    grid = (n // _T,)
    return pl.pallas_call(
        functools.partial(_seg_kernel, p_pad),
        grid=grid,
        in_specs=[_LIM_SPEC,
                  pl.BlockSpec((1, _T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, _T), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((p_pad, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, k), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_tile_limit((ids >= 0) & (ids < p_pad), _T), ids[None, :], vals)


def _hist_kernel(a_pad: int, b_pad: int, lim, ids_a, ids_b, w, out):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    @pl.when(i < lim[0, 0])
    def _():
        oh_a = _oh_tile(ids_a, a_pad)             # (A, T)
        oh_b = _oh_tile(ids_b, b_pad)             # (B, T)
        k = w.shape[0]
        for kk in range(k):
            # (A, T) x (B, T) contracting T -> (A, B), weighted by channel
            # kk. DEFAULT precision on purpose: the one-hot side is exact
            # in bf16 and the weight channel tolerates bf16 (counts stay
            # exact; a weighted channel sees ~0.4% relative error — the
            # Patchwork seed consumer's budget is centimetres). HIGHEST
            # (6-pass) measured ~1.4 ms/item at Z=128 — 6x the kernel's
            # own roofline.
            out[kk] = out[kk] + jax.lax.dot_general(
                oh_a, oh_b * w[kk:kk + 1],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("a_pad", "b_pad", "interpret"))
def cross_histogram(ids_a: jnp.ndarray, ids_b: jnp.ndarray,
                    weights: jnp.ndarray, a_pad: int, b_pad: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Weighted 2-D histogram: out[k, a, b] = sum over i with ids_a[i]==a
    and ids_b[i]==b of weights[k, i].

    The TPU kernel builds BOTH one-hots per tile in VMEM and contracts on
    the MXU — this is what replaces the Patchwork seed-stage N-sort: the
    per-(patch, z-bin) count/z-sum histogram costs one pass over N instead
    of a ~2 ms key sort (tools/microbench_ops.py). ids outside [0, a_pad)
    or [0, b_pad) are dropped. weights must be NaN-free (a NaN anywhere
    poisons the whole output through the contraction).
    """
    k, n = weights.shape
    if not (jax.default_backend() == "tpu" or interpret) or n % _TH != 0:
        oh_a = (ids_a[:, None] == jnp.arange(a_pad)[None, :]
                ).astype(jnp.float32)
        oh_b = (ids_b[:, None] == jnp.arange(b_pad)[None, :]
                ).astype(jnp.float32)
        return jnp.einsum("na,kn,nb->kab", oh_a, weights, oh_b,
                          precision=jax.lax.Precision.HIGHEST)
    grid = (n // _TH,)
    return pl.pallas_call(
        functools.partial(_hist_kernel, a_pad, b_pad),
        grid=grid,
        in_specs=[_LIM_SPEC,
                  pl.BlockSpec((1, _TH), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _TH), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, _TH), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, a_pad, b_pad), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, a_pad, b_pad), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_tile_limit((ids_a >= 0) & (ids_a < a_pad)
                  & (ids_b >= 0) & (ids_b < b_pad), _TH),
      ids_a[None, :], ids_b[None, :], weights)


def _moment_rows(chan):
    """(10, T) Patchwork plane-fit moment channels from (5, T) [x, y, z,
    px, py] (pz = z; patch-relative x/y, see preprocessing/patchwork.py)."""
    px, py, pz = chan[3:4], chan[4:5], chan[2:3]
    one = jnp.ones_like(px)
    return jnp.concatenate([one, px, py, pz,
                            px * px, px * py, px * pz,
                            py * py, py * pz, pz * pz], axis=0)


def _lookup_member(ids, chan, tab, p_cnt, oh16):
    """Shared math of the fused Patchwork kernels: deliver the per-patch
    plane table to points ((p_pad, 5) tab x (p_pad, T) bf16 one-hot,
    split-bf16) and evaluate membership. Returns (proj, th, flags_f,
    member), (1, T)."""
    vals = _lookup_dot(oh16, tab)
    proj = (vals[0:1] * chan[0:1] + vals[1:2] * chan[1:2]
            + vals[2:3] * chan[2:3])
    member = (ids < p_cnt) & (proj < vals[3:4])
    return proj, vals[3:4], vals[4:5], member


def _fit_kernel(p_pad: int, p_cnt: int, terms: int, lim, ids, chan, tab,
                out):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    @pl.when(i < lim[0, 0])
    def _():
        oh = _oh_tile(ids, p_pad, jnp.bfloat16)   # (P, T)
        _, _, _, member = _lookup_member(ids[:], chan[:], tab[:], p_cnt,
                                         oh)
        mom = _moment_rows(chan[:]) * member.astype(jnp.float32)  # (10, T)
        out[:] = out[:] + _split_dot_oh_vals(
            oh, mom, (((1,), (1,)), ((), ())), terms=terms)


@functools.partial(jax.jit, static_argnames=("p_pad", "p_cnt", "exact",
                                              "interpret"))
def fit_iteration_moments(ids: jnp.ndarray, chan: jnp.ndarray,
                          tab: jnp.ndarray, p_pad: int, p_cnt: int,
                          exact: bool = True,
                          interpret: bool = False) -> jnp.ndarray:
    """One fused Patchwork plane-fit iteration: deliver the per-patch
    plane table [n1, n2, n3, th, _] to points, evaluate membership
    (proj = n.p < th, ids < p_cnt), and segment-sum the 10 weighted moment
    channels — all inside one kernel, so neither the (5, N) delivered
    values nor the (10, N) moment channels ever exist in HBM.

    ids: (N,) int32; chan: (5, N) f32 [x, y, z, px, py] (NaN-free);
    tab: (p_pad, 5) f32 with zero rows beyond p_cnt. Returns (p_pad, 10).

    exact=False runs the moment contraction with a single bf16 term
    (~0.4% relative moment error) — used for the INTERMEDIATE Patchwork
    plane-fit iterations, whose only output is the next membership set;
    the final iteration (whose covariance feeds the uprightness/flatness
    gates, where bf16 noise would swamp small variances) must stay exact.
    """
    _, n = chan.shape
    if not (jax.default_backend() == "tpu" or interpret) or n % _TF != 0:
        vals = table_lookup(ids, tab)              # (5, N)
        proj = vals[0] * chan[0] + vals[1] * chan[1] + vals[2] * chan[2]
        member = (ids < p_cnt) & (proj < vals[3])
        mom = _moment_rows(chan) * member[None, :].astype(jnp.float32)
        if not exact:   # mirror the kernel's single-term bf16 rounding
            mom = mom.astype(jnp.bfloat16).astype(jnp.float32)
        return segment_sums(ids, mom, p_pad)
    grid = (n // _TF,)
    return pl.pallas_call(
        functools.partial(_fit_kernel, p_pad, p_cnt, 3 if exact else 1),
        grid=grid,
        in_specs=[_LIM_SPEC,
                  pl.BlockSpec((1, _TF), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((5, _TF), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((p_pad, 5), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((p_pad, 10), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, 10), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_tile_limit((ids >= 0) & (ids < p_cnt), _TF), ids[None, :], chan,
      tab)


def _code_from(ids_row, proj, th, flags_f, p_cnt):
    fl = (flags_f + 0.5).astype(jnp.int32)
    valid = ids_row < p_cnt
    live = valid & ((fl & 8) > 0)
    isg = proj < th
    g = live & ((fl & 1) > 0) & isg
    ng = live & ~g
    rev = live & ((fl & 2) > 0) & isg
    rej = live & ((fl & 4) > 0) & isg
    return (g.astype(jnp.int32) + 2 * ng.astype(jnp.int32)
            + 4 * rev.astype(jnp.int32) + 8 * rej.astype(jnp.int32))


def _classify_kernel(p_pad: int, p_cnt: int, lim, ids, chan, tab, out):
    i = pl.program_id(0)
    # unconditional zero + conditional overwrite: tiles past the last
    # valid id carry only dropped points, whose code is 0
    out[:] = jnp.zeros_like(out)

    @pl.when(i < lim[0, 0])
    def _():
        oh = _oh_tile(ids, p_pad, jnp.bfloat16)
        proj, th, flags_f, _ = _lookup_member(ids[:], chan[:], tab[:],
                                              p_cnt, oh)
        out[:] = _code_from(ids[:], proj, th, flags_f, p_cnt)


@functools.partial(jax.jit, static_argnames=("p_pad", "p_cnt", "interpret"))
def classify_points(ids: jnp.ndarray, chan: jnp.ndarray, tab: jnp.ndarray,
                    p_pad: int, p_cnt: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused final Patchwork classification: deliver [n1, n2, n3, th,
    flags] and emit one int32 code per point (bit0 ground, bit1 nonground,
    bit2 reverted, bit3 rejected — 0 for dropped/invalid). Replaces the
    final (5, N) delivery + host-side flag unpack with a (N,) int32 output.
    """
    _, n = chan.shape
    if not (jax.default_backend() == "tpu" or interpret) or n % _TF != 0:
        vals = table_lookup(ids, tab)
        proj = vals[0] * chan[0] + vals[1] * chan[1] + vals[2] * chan[2]
        return _code_from(ids, proj, vals[3], vals[4], p_cnt)
    grid = (n // _TF,)
    out = pl.pallas_call(
        functools.partial(_classify_kernel, p_pad, p_cnt),
        grid=grid,
        in_specs=[_LIM_SPEC,
                  pl.BlockSpec((1, _TF), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((5, _TF), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((p_pad, 5), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _TF), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_tile_limit((ids >= 0) & (ids < p_cnt), _TF), ids[None, :], chan,
      tab)
    return out[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def table_lookup(ids: jnp.ndarray, tab: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """out[k, i] = tab[ids[i], k] (zeros for out-of-range ids).

    ids: (N,) int32; tab: (p_pad, K) f32. Returns (K, N) f32, K-major.
    """
    n = ids.shape[0]
    p_pad, k = tab.shape
    if not (jax.default_backend() == "tpu" or interpret) or n % _T != 0:
        oh = (ids[:, None] == jnp.arange(p_pad)[None, :]
              ).astype(jnp.bfloat16)
        return jnp.einsum("np,pk->kn", oh, tab,
                          precision=jax.lax.Precision.HIGHEST)
    grid = (n // _T,)
    return pl.pallas_call(
        functools.partial(_lookup_kernel, p_pad),
        grid=grid,
        in_specs=[pl.BlockSpec((1, _T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((p_pad, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, _T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(ids[None, :], tab)


def _imglookup_kernel(rows: int, cols: int, t: int, lim, ids, img, out):
    i = pl.program_id(0)
    out[:] = jnp.zeros_like(out)

    @pl.when(i < lim[0, 0])
    def _():
        _imglookup_body(rows, cols, t, ids, img, out)


def _imglookup_body(rows: int, cols: int, t: int, ids, img, out):
    # per-point image read v[i] = img[ids[i] // cols, ids[i] % cols] as two
    # one-hot contractions: M = ohr^T @ img gives each point its ROW of the
    # image; the col one-hot then selects elementwise (no MXU gather).
    r = ids[:] // cols                                  # (1, T)
    c = ids[:] - r * cols
    ohr = (r == jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0)).astype(jnp.bfloat16)  # (R, T)
    # split-exact contraction (img carries >bf16-mantissa int words)
    m = None
    rem = img[:]
    for _ in range(3):
        part = rem.astype(jnp.bfloat16)
        rem = rem - part.astype(jnp.float32)
        d = jax.lax.dot_general(ohr, part,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = d if m is None else m + d                   # (T, C)
    ohc = (c.reshape(t, 1) == jax.lax.broadcasted_iota(
        jnp.int32, (1, cols), 1)).astype(jnp.float32)   # (T, C)
    out[:] = jnp.sum(m * ohc, axis=1)[None, :]


@functools.partial(jax.jit, static_argnames=("rows", "cols", "interpret"))
def image_lookup(flat_ids: jnp.ndarray, img: jnp.ndarray, rows: int,
                 cols: int, interpret: bool = False) -> jnp.ndarray:
    """out[i] = img[flat_ids[i]] for an (rows*cols,) f32 image table.

    The factored one-hot replacement for an N-sized `jnp.take` from an
    image-sized table (measured ~1.4 ms/cloud at N=131k, npix=115200 —
    the single most expensive op left in the projection stage): one
    (rows, T) row-one-hot contraction hands every point its image row,
    and a (T, cols) col-one-hot selects within it on the VPU. Values are
    reconstructed split-exact, so integer words up to 2^24 survive.
    Ids outside [0, rows*cols) read as 0 (their one-hots miss every row),
    and tiles past the LAST in-range id are skipped wholesale (zero
    output) — callers with valid-prefix layouts pay only for real points.
    """
    n = flat_ids.shape[0]
    t = 1024
    if not (jax.default_backend() == "tpu" or interpret) or n % t != 0:
        flat_c = jnp.clip(flat_ids, 0, rows * cols - 1)
        in_r = (flat_ids >= 0) & (flat_ids < rows * cols)
        return jnp.where(in_r, jnp.take(img.reshape(-1), flat_c), 0.0)
    grid = (n // t,)
    out = pl.pallas_call(
        functools.partial(_imglookup_kernel, rows, cols, t),
        grid=grid,
        in_specs=[_LIM_SPEC,
                  pl.BlockSpec((1, t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        compiler_params=_BIG_VMEM,
        interpret=interpret,
    )(_tile_limit((flat_ids >= 0) & (flat_ids < rows * cols), t),
      flat_ids[None, :], img.reshape(rows, cols).astype(jnp.float32))
    return out[0]
