"""Fully-fused Mosaic scan kernel: raw 2-bit codes in, activity bitmap out.

The split pipeline (ops/scan.py bitmap pass) spends more time in XLA glue
than in the pair kernel itself - measured on v5e per 33.5M-window span:
rolling K-code build 25.1 ms (six unaligned genome-length lane rotations),
profile lookup +9.1 ms, delta+cumsum +9 ms, versus 31.9 ms for the pair
kernel.  This kernel fuses the ENTIRE lower-bound bitmap pass after the H2D
unpack; per grid step (ROWS tiles, everything VMEM-resident):

  1. rolling K-code build from int8 codes (static unaligned VMEM slices -
     free compared to the HBM-churning XLA formulation),
  2. depth-d pair-count loop with a SHARED compare stream per depth:
     eq_d[i] = (K[i] == K[i+d]) serves both the entering term (shifted by
     w-d) and the leaving term - 1 compare + 2 adds per depth instead of
     the split kernel's 2 compares + 2 adds,
  3. g = S[K] via a chunked in-kernel gather (4^k/128 masked 128-lane
     take_along_axis gathers against the VMEM-resident profile),
  4. exact scaled lower-bound delta assembly (2r^2*ab + 2r*(g_l - g_r)),
  5. in-lane cumulative sum (log-shift rolls) + cross-row/-step absolute
     base chaining (sequential grid, SMEM carry),
  6. threshold + validity mask + per-block any() bitmap.

Only the bitmap (1 bit per ``block`` windows) leaves the core.  The bound
values are BIT-IDENTICAL to ops.scan.scan_window_lower_bounds (pure integer
arithmetic, same order), so the bitmap equals the split pass's exactly -
asserted in tests/test_fused.py and verified bit-identical on a real v5e
over a 64 Mbp genome.

Lookup variants (r3 sweep on v5e, 64 Mbp):

  * ``mxu`` (PRODUCTION DEFAULT): in-kernel one-hot MXU lookup - 44-63 ms
    vs the split pass's 78-93 ms at depth 8-16, bitmaps bit-identical.
    Mosaic compiles it only for depth <= 16 (deeper bound loops push the
    scoped-VMEM/live-range budget past what the kernel fits in).
  * ``gather``: the wide take_along_axis formulation stopped compiling on
    the current v5e toolchain ("Not implemented: Multiple source vregs
    along gather dimension" - tpu.dynamic_gather accepts ONE 128-lane
    source vreg); kept for interpret-mode reference only.

The engine enables this kernel by default on TPU (KMERGMA_FUSED=0 opts
back into the split pass); everything stays on-core - no genome-sized
K-code/lookup/delta intermediates ever touch HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # tiles per grid step = sublane count for int32


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _masked_shift_cumsum(x, axis_len, masks=None):
    """Inclusive cumsum along lanes via log-shift rolls (no cumsum primitive
    in Mosaic).  jnp.roll wraps, so wrapped-in lanes are masked to zero.
    ``masks`` may pass the per-shift lane masks precomputed once (the
    multi-cluster kernel runs m cumsums per step; sharing the masks saves
    m-1 iota+compare rounds per shift)."""
    if masks is None:
        masks = _cumsum_masks(x.shape, axis_len)
    sh = 1
    i = 0
    while sh < axis_len:
        rolled = jnp.roll(x, sh, axis=1)
        x = x + jnp.where(masks[i], rolled, 0)
        sh <<= 1
        i += 1
    return x


def _cumsum_masks(shape, axis_len):
    """The lane masks used by _masked_shift_cumsum, precomputable."""
    masks = []
    sh = 1
    while sh < axis_len:
        masks.append(jax.lax.broadcasted_iota(jnp.int32, shape, 1) >= sh)
        sh <<= 1
    return masks


def _sublane_inclusive_cumsum(x):
    """Inclusive cumsum over the (tiny) sublane axis of an (ROWS, 1) array."""
    out = x
    sh = 1
    while sh < ROWS:
        rolled = jnp.roll(out, sh, axis=0)
        mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) >= sh
        out = out + jnp.where(mask, rolled, 0)
        sh <<= 1
    return out


def _chunked_table_gather(tab_ref, idx):
    """g = S[idx] for an (ROWS, n) int32 index array against a shared
    (ROWS, 4^k) table.

    Mosaic lowers take_along_axis only when the index array has the SAME
    shape as the source, so the table is lane-TILED up to the index width
    and gathered in ONE op per call: every index < 4^k addresses the first
    copy.  (The alternative - 128-lane index slices x 4^k/128 table chunks
    of narrow gathers - is ~2000 small ops per grid step and runs
    latency-bound at ~60 ms/span.)  ``n`` must be a multiple of 4^k... or
    the table is tiled ceil(n/4^k) times and sliced."""
    nbins = tab_ref.shape[1]
    n = idx.shape[1]
    reps = -(-n // nbins)
    wide = jnp.concatenate([tab_ref[:, :]] * reps, axis=1) if reps > 1 else tab_ref[:, :]
    if wide.shape[1] > n:  # indices padded up to the tiled-table width
        idx = jnp.concatenate(
            [idx, jnp.zeros((idx.shape[0], wide.shape[1] - n), idx.dtype)], axis=1
        )
    return jnp.take_along_axis(wide, idx, axis=1)[:, :n]


def _mxu_table_lookup(tabt_ref, kcodes, half: int, limbs: bool = False):
    """g = S[kcodes] via an in-kernel one-hot MXU matmul (the VERDICT r2
    next-#3 experiment): per sublane row, a (half, lk) one-hot of the high
    digit hits the MXU against the PRE-TRANSPOSED (half, half) table -
    result[u, i] = S[half*hi[i] + u] - then a log2(half)-round bit-halving
    select on the low digit extracts the wanted entry without any gather.

    EXACTNESS: the v5e Mosaic f32 dot keeps only ~8 table mantissa bits
    against the (exactly representable) 0/1 one-hot - a 16-bit packed table
    was measured WRONG on chip (r4) - so the direct f32 table is exact only
    for 0 <= S < 256.  For larger profiles ``limbs=True`` splits the table
    into two 8-bit bf16 limbs (each exact) stacked as (2*half, half) and
    recombines 256*hi + lo after the dot - exact for S < 2^16, which the
    int32 headroom guard already enforces.
    """
    rows, lk = kcodes.shape
    hi = kcodes // half
    lo = kcodes % half
    tabt = tabt_ref[:, :]
    out = []
    for rr in range(rows):
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (half, lk), 0) == hi[rr : rr + 1, :]
        ).astype(jnp.bfloat16 if limbs else jnp.float32)
        sel_all = jax.lax.dot_general(
            tabt, oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (half | 2*half, lk): sel[u, i] = S[half*hi[i] + u] (or its limbs)
        if limbs:
            sel = 256.0 * sel_all[:half, :] + sel_all[half:, :]
        else:
            sel = sel_all
        lob = lo[rr : rr + 1, :]
        h = half // 2
        while h >= 1:
            take_hi = (lob & h) != 0
            sel = jnp.where(take_hi, sel[h : 2 * h, :], sel[:h, :])
            h //= 2
        out.append(sel.astype(jnp.int32))
    return jnp.concatenate(out, axis=0)


def _fused_kernel(
    main_ref, halo_ref, tab_ref, meta_ref, bitmap_ref, carry_ref,
    *, k: int, w: int, t: int, r: int, depth: int, block: int, lookup: str = "mxu",
):
    """One grid step: ROWS consecutive tiles of t transitions each.

    main_ref: (ROWS, t) int8 codes (tile row i covers transitions
      [base + i*t, base + i*t + t); a FREE reshape of the flat record).
    halo_ref: (ROWS, hw) int8 codes following each row (hw >= w + k - 1).
    tab_ref: (ROWS, 4^k) int32 summed profile S, row-replicated.
    meta_ref (SMEM): [thr_int, l0, nw] - threshold, the record's
      first-window scaled lower bound, and the window count.
    bitmap_ref: (ROWS, t // block) int32 output (0/1 activity).
    carry_ref (SMEM): running absolute L at the first window of the step.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0] = meta_ref[1]

    codes = jnp.concatenate(
        [main_ref[:, :].astype(jnp.int32), halo_ref[:, :].astype(jnp.int32)], axis=1
    )

    # --- 1. rolling K codes, VMEM-resident (K[i] of k-mer at lane i) ---
    # K is needed for lanes [0, t + w); the length is rounded up to a lane
    # multiple so the gather below can slice clean 128-lane chunks.
    lk = t + -(-(w + 1) // 128) * 128
    kcodes = codes[:, :lk] << (2 * (k - 1))
    for j in range(1, k):
        kcodes = kcodes + (codes[:, j : j + lk] << (2 * (k - 1 - j)))

    # --- 2. depth-d net pair counts with one shared compare per depth ---
    #   ab[p] = sum_d eq(K[p+w-d], K[p+w]) - eq(K[p+d], K[p])
    #         = sum_d eq_d[p+w-d] - eq_d[p],   eq_d[i] = eq(K[i], K[i+d])
    ab = jnp.zeros((ROWS, t), dtype=jnp.int32)
    for d in range(1, depth + 1):
        eq = (kcodes[:, : lk - d] == kcodes[:, d:lk]).astype(jnp.int32)
        ab = ab + (eq[:, w - d : w - d + t] - eq[:, :t])

    # --- 3. profile projections g = S[K] over all lanes, then slice ---
    if lookup == "mxu":
        # tab_ref is the PRE-TRANSPOSED (half, half) f32 table here
        g = _mxu_table_lookup(tab_ref, kcodes, tab_ref.shape[1])
    elif lookup == "mxu_limbs":
        # (2*half, half) bf16 limb table (exact for S < 2^16)
        g = _mxu_table_lookup(tab_ref, kcodes, tab_ref.shape[1], limbs=True)
    else:
        g = _chunked_table_gather(tab_ref, kcodes)
    gl = g[:, :t]
    gr = g[:, w : w + t]

    # --- 4. exact scaled lower-bound delta (scan.scan_window_lower_bounds) ---
    delta = jnp.int32(2 * r * r) * ab + jnp.int32(2 * r) * (gl - gr)

    # --- 5. absolute bounds: in-lane cumsum + row/step base chaining ---
    csum = _masked_shift_cumsum(delta, t)  # csum[:, j] = sum deltas 0..j in row
    row_tot = csum[:, t - 1 : t]  # (ROWS, 1)
    inc = _sublane_inclusive_cumsum(row_tot)
    excl = inc - row_tot  # exclusive prefix of row totals

    base = carry_ref[0]
    l_first = base + excl  # L of window j=0 of each row, (ROWS, 1)
    l_rest = l_first + csum  # L of windows 1..t (shifted by one)
    thr = meta_ref[0]
    below_first = (l_first < thr).astype(jnp.int32)
    below_rest = (l_rest < thr).astype(jnp.int32)
    # window j in [0, t): below[j] = below_first if j==0 else below_rest[j-1]
    below = jnp.concatenate([below_first, below_rest[:, : t - 1]], axis=1)

    # --- 6. validity mask + per-block any() ---
    pos = (
        (step * ROWS) * t
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, t), 0) * t
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, t), 1)
    )
    below = jnp.where(pos < meta_ref[2], below, 0)

    bitmap_ref[:, :] = below.reshape(ROWS, t // block, block).max(axis=2)
    carry_ref[0] = base + inc[ROWS - 1, 0]


@partial(jax.jit, static_argnames=("k", "ws", "r", "depth", "t", "block", "n_tiles", "interpret", "lookup"))
def fused_record_bitmaps(
    codes_dev: jnp.ndarray,
    s_profile: jnp.ndarray,
    meta: jnp.ndarray,
    *,
    k: int,
    ws: int,
    r: int,
    depth: int,
    t: int = 8192,
    block: int = 512,
    n_tiles: int,
    interpret: bool | None = None,
    lookup: str = "mxu",
):
    """Whole-record fused bitmap pass.

    codes_dev: int8[>= n_tiles*t + t + hw] unpacked record codes (padded).
    s_profile: int32[4^k] summed profile.
    meta: int32[3] = [thr_int, l0, nw] (l0 = the record's first-window
      scaled lower bound at this depth, scan._lower_bound_base).
    Returns int32[n_tiles, t // block] activity bitmap (window granularity
    identical to ops.scan._scan_record_bitmaps's ``block``).
    """
    if interpret is None:
        interpret = _interpret_default()
    w = ws - k + 1
    # codes halo: enough lanes for the (lane-rounded) K range plus k-1
    hw = -(-(w + 1) // 128) * 128 + 128
    main = codes_dev[: n_tiles * t].reshape(n_tiles, t)
    halo = jax.vmap(
        lambda i: jax.lax.dynamic_slice(codes_dev, ((i + 1) * t,), (hw,))
    )(jnp.arange(n_tiles))
    if lookup in ("mxu", "mxu_limbs"):
        # pre-transposed (half, half) f32 table: tabt[u, h] = S[half*h + u];
        # limb variant stacks the two 8-bit bf16 limbs as (2*half, half)
        nbins = s_profile.shape[0]
        half = 1 << (nbins.bit_length() // 2)
        assert half * half == nbins, "mxu lookup needs a square-decomposable table"
        tf = s_profile.reshape(half, half).astype(jnp.float32).T
        if lookup == "mxu_limbs":
            table = jnp.concatenate([jnp.floor(tf / 256.0), jnp.mod(tf, 256.0)]).astype(
                jnp.bfloat16
            )
        else:
            table = tf
        tab_spec = pl.BlockSpec(table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    else:
        table = jnp.broadcast_to(s_profile, (ROWS, s_profile.shape[0]))
        tab_spec = pl.BlockSpec((ROWS, s_profile.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM)
    grid = (n_tiles // ROWS,)
    return pl.pallas_call(
        partial(_fused_kernel, k=k, w=w, t=t, r=r, depth=depth, block=block, lookup=lookup),
        out_shape=jax.ShapeDtypeStruct((n_tiles, t // block), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            tab_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, t // block), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(main, halo, table, meta)
