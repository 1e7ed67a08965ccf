"""Fully-fused Mosaic scan kernel: K codes in, activity bitmap out.

The XLA glue around the match-count kernel (gather of S[K], overlapped tile
arrangement, cumulative sum, thresholding, bitmap reduction) costs several
times the kernel itself on TPU and minutes of remote compile; this kernel
fuses the whole per-span pipeline after the (cheap, fused-by-XLA) rolling
K-code computation:

  per grid step (ROWS tiles, VMEM-resident):
    1. depth-W match-count loop (incremental +-1 cyclic rolls),
    2. g = S[K] via a chunked in-kernel gather (32 masked 128-lane
       take_along_axis gathers - Mosaic supports only narrow 2D gathers),
    3. exact scaled delta assembly,
    4. in-lane cumulative sum (log-shift rolls) + cross-row/step absolute
       base chaining (sequential grid, SMEM carry),
    5. threshold + per-block any() bitmap.

Outputs ONLY the bitmap (1 bit per `block` windows leaves the chip) plus the
per-step base carry for validation.  Bit-identical to
ops.scan.scan_window_distances thresholding by construction (tested in
interpret mode and against the XLA path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import rolling_kmer_codes_jnp

ROWS = 8


def _lane_cumsum(x):
    """Inclusive cumsum along lanes via log-shift rolls (no cumsum primitive
    in Mosaic)."""
    n = x.shape[1]
    sh = 1
    while sh < n:
        rolled = pltpu.roll(x, sh, 1)
        mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) >= sh
        x = x + jnp.where(mask, rolled, 0)
        sh <<= 1
    return x


def _chunked_table_gather(tab_ref, idx):
    """g = S[idx] for a (ROWS, n) int32 index array against a shared
    (ROWS, 4^k) table: 4^k/128 masked narrow gathers."""
    nbins = tab_ref.shape[1]
    acc = jnp.zeros_like(idx)
    for c in range(nbins // 128):
        sub = tab_ref[:, c * 128 : (c + 1) * 128]
        local = jnp.clip(idx - c * 128, 0, 127)
        got = jnp.take_along_axis(sub, local, axis=1)
        acc = acc + jnp.where((idx >= c * 128) & (idx < (c + 1) * 128), got, 0)
    return acc


def _fused_kernel(k_ref, tab_ref, meta_ref, bitmap_ref, carry_ref, *, w: int, t: int, r: int, block: int):
    """One grid step: ROWS consecutive tiles of t transitions each.

    k_ref: (ROWS, t + w) int32 k-mer codes (tile i covers transitions
      [base + i*t, base + i*t + t)).
    tab_ref: (ROWS, 4^k) int32 summed profile S, replicated per row.
    meta_ref (SMEM): [thr_int, d0] - threshold and the record's first-window
      scaled distance.
    bitmap_ref: (ROWS, t // block) int32 output (0/1 activity).
    carry_ref (SMEM): running absolute D at the start of the step's first tile.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0] = meta_ref[1]

    k_all = k_ref[:, :]
    kl = k_all[:, :t]
    kr = k_all[:, w : w + t]

    # --- depth-W match counts (see scan_pallas._match_counts_kernel) ---
    ka0 = jnp.roll(k_all, -(w - 1), axis=1)
    zero = jnp.zeros((ROWS, t), dtype=jnp.int32)

    def body(d, carry):
        a, b, ka, kb = carry
        a = a + (ka[:, :t] == kr).astype(jnp.int32)
        b = b + (kb[:, :t] == kl).astype(jnp.int32)
        return a, b, jnp.roll(ka, 1, axis=1), jnp.roll(kb, -1, axis=1)

    a, b, _, _ = jax.lax.fori_loop(1, w + 1, body, (zero, zero, ka0, k_all))

    # --- delta assembly (exact scaled integers) ---
    gl = _chunked_table_gather(tab_ref, kl)
    gr = _chunked_table_gather(tab_ref, kr)
    r2 = jnp.int32(2 * r * r)
    delta = r2 * (kl != kr).astype(jnp.int32) + r2 * (a - b) + (2 * r) * (gl - gr)

    # --- absolute distances: in-lane cumsum + row/step base chaining ---
    csum = _lane_cumsum(delta)  # csum[:, j] = sum of deltas 0..j within row
    row_tot = csum[:, t - 1 : t]  # (ROWS, 1)
    # exclusive cumsum across the ROWS rows (tiny log-shift over sublanes)
    excl = jnp.zeros_like(row_tot)
    sh = 1
    while sh < ROWS:
        rolled = pltpu.roll(row_tot if sh == 1 else roll_src, sh, 0)  # noqa: F821
        mask = jax.lax.broadcasted_iota(jnp.int32, row_tot.shape, 0) >= sh
        if sh == 1:
            excl = jnp.where(mask, rolled, 0)
            roll_src = row_tot + 0  # running inclusive-shifted accumulator
        sh <<= 1
    # NOTE: simple O(ROWS) construction instead (ROWS == 8 is tiny):
    inc = _sublane_inclusive_cumsum(row_tot)
    excl = inc - row_tot  # exclusive prefix of row totals

    base = carry_ref[0]
    # D of window (tile_row, j): base + excl[row] + (csum[j-1]); window j=0
    # of each row has D = base + excl[row]; windows j>=1 add csum[:, j-1].
    d_first = base + excl  # (ROWS, 1)
    d_rest = d_first + csum  # D of windows 1..t (shifted by one)
    thr = meta_ref[0]
    below_first = (d_first < thr).astype(jnp.int32)  # window 0 per row
    below_rest = (d_rest < thr).astype(jnp.int32)  # windows 1..t per row
    # window j in [0, t): below[j] = below_first if j==0 else below_rest[j-1]
    below = jnp.concatenate([below_first, below_rest[:, : t - 1]], axis=1)

    bitmap_ref[:, :] = below.reshape(ROWS, t // block, block).max(axis=2)
    carry_ref[0] = base + inc[ROWS - 1, 0]


def _sublane_inclusive_cumsum(x):
    """Inclusive cumsum over the (tiny) sublane axis of an (ROWS, 1) array."""
    out = x
    sh = 1
    while sh < ROWS:
        rolled = pltpu.roll(out, sh, 0)
        mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) >= sh
        out = out + jnp.where(mask, rolled, 0)
        sh <<= 1
    return out


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("k", "ws", "r", "t", "block", "interpret"))
def fused_scan_bitmap(
    kcodes_tiles: jnp.ndarray,
    s_table: jnp.ndarray,
    meta: jnp.ndarray,
    k: int,
    ws: int,
    r: int,
    t: int = 2048,
    block: int = 512,
    interpret: bool | None = None,
):
    """Run the fused kernel over pre-arranged K-code tiles.

    kcodes_tiles: (n_tiles, t + w) int32 (n_tiles multiple of ROWS).
    s_table: (ROWS, 4^k) int32 profile, row-replicated.
    meta: (2,) int32 [thr_int, d0].
    Returns (n_tiles, t // block) int32 bitmap.
    """
    if interpret is None:
        interpret = _interpret_default()
    w = ws - k + 1
    n_tiles = kcodes_tiles.shape[0]
    grid = (n_tiles // ROWS,)
    return pl.pallas_call(
        partial(_fused_kernel, w=w, t=t, r=r, block=block),
        out_shape=jax.ShapeDtypeStruct((n_tiles, t // block), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, t + w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, s_table.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, t // block), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(kcodes_tiles, s_table, meta)
