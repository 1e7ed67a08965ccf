"""Fully-fused multi-cluster Mosaic kernel: raw codes in, ALL m cluster
activity bitmaps out.

The split cluster pass (ops/scan_cluster._cluster_record_bitmaps) is
dominated by the m-profile XLA lookup and the per-cluster delta/cumsum
tails, whose genome-length intermediates churn HBM (r3 profile: 177 ms per
33.5M-window span at m=6 vs ~30 ms for the single-profile fused kernel).
This kernel keeps the whole pass on-core, per grid step (ROWS tiles):

  1. rolling K-code build from int8 codes (as scan_fused);
  2. ONE shared compare stream per depth serving every windowsize group's
     pair deltas (1 compare + G+1 adds per depth - scan_pallas
     _codes_pair_multi_kernel's trick) plus the leaving accumulator;
  3. g_c = S_c[K] for ALL m profiles via a lane-chunked one-hot MXU matmul
     against the row-stacked pre-transposed table T2[(c, u), h] =
     S_c[half*h + u]: one (m*half, half) @ (half, C) dot per lane chunk
     per sublane row, then a log2(half)-round bit-halving select per
     cluster face (f32 exact: every product is 0/1 * S, one nonzero term
     per sum - ops.scan.profile_lookup's argument);
  4. per-cluster exact scaled lower-bound deltas, in-lane cumsum
     (log-shift rolls) and cross-row/-step absolute base chaining with an
     SMEM carry PER CLUSTER;
  5. per-cluster threshold + validity mask (per-cluster window counts -
     windowsizes differ) + per-block any() bitmaps.

Bound values are BIT-IDENTICAL to scan.scan_window_lower_bounds per
cluster, so the bitmaps equal the split cluster pass's exactly
(tests/test_cluster_fused.py; ablated on the real v5e).

Used by ClusterScanEngine on TPU when every cluster shares one bound depth
(mixed clamped depths fall back to the split pass).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_fused import ROWS, _masked_shift_cumsum, _sublane_inclusive_cumsum

#: lane-chunk width of the in-kernel multi-table lookup (bounds the
#: (m*half, CHUNK) f32 sel temp to ~3 MB at m=6, half=64)
CHUNK = 2048


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _mxu_multi_lookup(t2_ref, kcodes, half: int, m: int, lookup_dtype: str = "f32", chunk: int = CHUNK):
    """g[c][r, i] = S_c[kcodes[r, i]] for all m profiles.

    t2_ref: row-stacked pre-transposed tables - (m*half, half) f32;
    (2*m*half, half) bf16 holding the 8-bit hi/lo limbs of every table
    (``lookup_dtype="bf16"``: bf16 runs the MXU at 4x the f32 rate on v5e;
    limbs < 256 are bf16-exact, 0/1 one-hots are exact, and the MXU
    accumulates in f32, so 256*hi + lo reconstructs S exactly); or
    (ceil(m/2)*half, half) f32 with PAIRS of profiles packed into one
    table entry 256*S_2c + S_2c+1 (``lookup_dtype="f32pack"``: halves the
    dot's M dimension - and its FLOPs).  Packed values are 16-bit ints:
    exact iff the Mosaic f32 dot's decomposition keeps >= 16 table
    mantissa bits against the exactly-representable 0/1 one-hot (a 24-bit
    4096-field packing was measured WRONG on v5e, so the margin is real;
    Mosaic rejects explicit precision=HIGH, leaving the default).  The
    engine enables this variant only after the profile ablation's
    bitmap-equality check passes on the target chip.  Requires
    max(S_c) < 256, checked by the engine.  Returns m int32 arrays shaped
    like ``kcodes``.
    """
    rows, lk = kcodes.shape
    hi = kcodes // half
    lo = kcodes % half
    t2 = t2_ref[:, :]
    oh_dtype = jnp.bfloat16 if lookup_dtype == "bf16" else jnp.float32
    out_rows = [[] for _ in range(m)]
    n_chunks = -(-lk // chunk)
    for rr in range(rows):
        for ch in range(n_chunks):
            s = ch * chunk
            e = min(lk, s + chunk)
            hic = hi[rr : rr + 1, s:e]
            loc = lo[rr : rr + 1, s:e]
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (half, e - s), 0) == hic
            ).astype(oh_dtype)
            sel_all = jax.lax.dot_general(
                t2, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # f32 (m*half | 2*m*half | ceil(m/2)*half, C)
            if lookup_dtype == "f32pack":
                for c2 in range(-(-m // 2)):
                    sel = sel_all[c2 * half : (c2 + 1) * half, :]
                    h = half // 2
                    while h >= 1:
                        take_hi = (loc & h) != 0
                        sel = jnp.where(take_hi, sel[h : 2 * h, :], sel[:h, :])
                        h //= 2
                    packed = sel.astype(jnp.int32)
                    out_rows[2 * c2].append(packed // 256)
                    if 2 * c2 + 1 < m:
                        out_rows[2 * c2 + 1].append(packed % 256)
                continue
            for c in range(m):
                sel = sel_all[c * half : (c + 1) * half, :]
                if lookup_dtype == "bf16":
                    sel = 256.0 * sel + sel_all[(m + c) * half : (m + c + 1) * half, :]
                h = half // 2
                while h >= 1:
                    take_hi = (loc & h) != 0
                    sel = jnp.where(take_hi, sel[h : 2 * h, :], sel[:h, :])
                    h //= 2
                out_rows[c].append(sel.astype(jnp.int32))
    n_per_row = n_chunks
    return [
        jnp.concatenate(
            [
                jnp.concatenate(chunks[rr * n_per_row : (rr + 1) * n_per_row], axis=1)
                for rr in range(rows)
            ],
            axis=0,
        )
        for chunks in out_rows
    ]


def _build_t2(s_stack, lookup_dtype: str, m: int, half: int):
    """Row-stacked pre-transposed lookup tables for every variant (shared
    by the record kernel and the round-trip certificate)."""
    t2f = jnp.transpose(
        s_stack.reshape(m, half, half).astype(jnp.float32), (0, 2, 1)
    ).reshape(m * half, half)
    if lookup_dtype == "bf16":
        return jnp.concatenate(
            [jnp.floor(t2f / 256.0), jnp.mod(t2f, 256.0)]
        ).astype(jnp.bfloat16)
    if lookup_dtype == "f32pack":
        stacked = t2f.reshape(m, half, half)
        if m % 2:
            stacked = jnp.concatenate(
                [stacked, jnp.zeros((1, half, half), jnp.float32)]
            )
        return (256.0 * stacked[0::2] + stacked[1::2]).reshape(-1, half)
    return t2f


@partial(jax.jit, static_argnames=("m", "nbins", "lookup_dtype", "chunk", "interpret"))
def pack_lookup_roundtrip(s_stack, *, m, nbins, lookup_dtype, chunk=CHUNK, interpret=None):
    """g_c[v] for EVERY code v through the actual in-kernel lookup path.

    The exactness certificate for decomposition-dependent variants
    (f32pack): comparing all m*4^k looked-up entries against the integer
    tables proves per-entry exactness on THIS chip's MXU - a far stronger
    certificate than block-granular bitmap equality on one record (which a
    wrong-but-never-bit-flipping first record could pass).  Returns
    int32[m * ROWS, nbins // ROWS] with g_c[ROWS*r + i... ] laid out so
    row block c holds cluster c's lookups of codes r * (nbins/ROWS) + i.
    """
    if interpret is None:
        interpret = _interpret_default()
    half = 1 << (int(nbins).bit_length() // 2)
    lanes = nbins // ROWS
    t2 = _build_t2(s_stack, lookup_dtype, m, half)

    def kernel(t2_ref, out_ref):
        codes = (
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, lanes), 0) * lanes
            + jax.lax.broadcasted_iota(jnp.int32, (ROWS, lanes), 1)
        )
        g = _mxu_multi_lookup(t2_ref, codes, half, m, lookup_dtype, chunk)
        for c in range(m):
            out_ref[c * ROWS : (c + 1) * ROWS, :] = g[c]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m * ROWS, lanes), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t2)


def _fused_cluster_kernel(
    main_ref, halo_ref, t2_ref, meta_ref, bitmap_ref, carry_ref,
    *, k: int, specs: tuple, t: int, depth: int, block: int, half: int,
    lookup_dtype: str = "f32", chunk: int = CHUNK,
):
    """One grid step: ROWS consecutive tiles of t transitions, all clusters.

    specs: static tuple of (w_c, r_c) per cluster (w_c = ws_c - k + 1).
    meta_ref (SMEM): [nw_0..nw_{m-1}, thr_0..thr_{m-1}, l0_0..l0_{m-1}].
    bitmap_ref: (ROWS, m * (t // block)) int32; cluster c's blocks at
    columns [c * t//block, (c+1) * t//block).
    carry_ref (SMEM): int32[m] running absolute L per cluster.
    """
    m = len(specs)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for c in range(m):
            carry_ref[c] = meta_ref[2 * m + c]

    codes = jnp.concatenate(
        [main_ref[:, :].astype(jnp.int32), halo_ref[:, :].astype(jnp.int32)], axis=1
    )
    lc = codes.shape[1]
    lk = lc - k + 1  # K lanes; needs lk >= t + max(w)
    kcodes = codes[:, :lk] << (2 * (k - 1))
    for j in range(1, k):
        kcodes = kcodes + (codes[:, j : j + lk] << (2 * (k - 1 - j)))

    # --- shared pair stream per depth, ONE width-independent entering
    # accumulator (the roll split-kernel's trick, r4): a_acc[w][j] =
    # A[j + w - amin] with A[x] = sum_d eq_d[amin + x - d], so every
    # windowsize group is a STATIC SLICE of one accumulator instead of its
    # own per-depth add - (G-1) fewer t-wide adds per depth, bit-exact
    # (pure reassociation of integer adds) ---
    ws_groups = sorted({w for w, _r in specs})
    amin, amax = ws_groups[0], ws_groups[-1]
    awidth = t + (amax - amin)
    a_stream = jnp.zeros((ROWS, awidth), dtype=jnp.int32)
    b_acc = jnp.zeros((ROWS, t), dtype=jnp.int32)
    for d in range(1, depth + 1):
        eq = (kcodes[:, : lk - d] == kcodes[:, d:lk]).astype(jnp.int32)
        b_acc = b_acc + eq[:, :t]
        a_stream = a_stream + eq[:, amin - d : amin - d + awidth]
    a_acc = {w: a_stream[:, w - amin : w - amin + t] for w in ws_groups}

    # --- all m profile projections in one chunked MXU pass ---
    g_all = _mxu_multi_lookup(t2_ref, kcodes, half, m, lookup_dtype, chunk)

    # --- per-cluster delta, cumsum, carry chain, bitmap ---
    # (NOTE r4: precomputing the cumsum lane masks once for all clusters
    # was measured SLOWER on v5e - 112 vs 99 ms per 64 Mbp - Mosaic already
    # CSEs the iota+compare and the 13 live (ROWS, t) masks only added
    # register/VMEM pressure; keep the per-cluster recompute)
    tb = t // block
    pos = (
        (step * ROWS) * t
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, t), 0) * t
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, t), 1)
    )
    for c, (w, r) in enumerate(specs):
        g = g_all[c]
        ab = a_acc[w] - b_acc
        delta = jnp.int32(2 * r * r) * ab + jnp.int32(2 * r) * (
            g[:, :t] - g[:, w : w + t]
        )
        csum = _masked_shift_cumsum(delta, t)
        row_tot = csum[:, t - 1 : t]
        inc = _sublane_inclusive_cumsum(row_tot)
        excl = inc - row_tot

        base = carry_ref[c]
        l_first = base + excl
        l_rest = l_first + csum
        thr = meta_ref[m + c]
        below_first = (l_first < thr).astype(jnp.int32)
        below_rest = (l_rest < thr).astype(jnp.int32)
        below = jnp.concatenate([below_first, below_rest[:, : t - 1]], axis=1)

        below = jnp.where(pos < meta_ref[c], below, 0)
        bitmap_ref[:, c * tb : (c + 1) * tb] = below.reshape(ROWS, tb, block).max(axis=2)
        carry_ref[c] = base + inc[ROWS - 1, 0]


@partial(jax.jit, static_argnames=("k", "specs", "depth", "t", "block", "n_tiles", "interpret", "lookup_dtype", "chunk"))
def fused_cluster_record_bitmaps(
    codes_dev: jnp.ndarray,
    s_stack: jnp.ndarray,
    meta: jnp.ndarray,
    *,
    k: int,
    specs: tuple,
    depth: int,
    t: int = 8192,
    block: int = 512,
    n_tiles: int,
    interpret: bool | None = None,
    lookup_dtype: str = "f32",
    chunk: int = CHUNK,
):
    """Whole-record fused multi-cluster bitmap pass.

    codes_dev: int8[>= n_tiles*t + t + hw] unpacked record codes.
    s_stack: int32[m, 4^k] summed profiles.  meta: int32[3m] =
    [nw_c..., thr_c..., l0_c...].  specs: static ((w_c, r_c), ...).
    Returns int32[n_tiles, m * (t // block)].
    """
    if interpret is None:
        interpret = _interpret_default()
    m, nbins = s_stack.shape
    half = 1 << (nbins.bit_length() // 2)
    assert half * half == nbins, "multi lookup needs a square-decomposable table"
    max_w = max(w for w, _r in specs)
    hw = -(-(max_w + 1) // 128) * 128 + 128
    main = codes_dev[: n_tiles * t].reshape(n_tiles, t)
    halo = jax.vmap(
        lambda i: jax.lax.dynamic_slice(codes_dev, ((i + 1) * t,), (hw,))
    )(jnp.arange(n_tiles))
    # T2[(c, u), h] = S_c[half*h + u]: row-stack of pre-transposed tables
    t2 = _build_t2(s_stack, lookup_dtype, m, half)
    grid = (n_tiles // ROWS,)
    return pl.pallas_call(
        partial(
            _fused_cluster_kernel,
            k=k, specs=specs, t=t, depth=depth, block=block, half=half,
            lookup_dtype=lookup_dtype, chunk=chunk,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, m * (t // block)), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t2.shape[0], half), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, m * (t // block)), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SMEM((len(specs),), jnp.int32)],
        interpret=interpret,
    )(main, halo, t2, meta)
