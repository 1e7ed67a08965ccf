"""Pallas TPU kernel for the scan's hot loop.

The XLA formulation (ops/scan.py) re-reads the K array from HBM on every
iteration of the depth loop.  This kernel keeps each tile of k-mer codes
resident in VMEM and runs the whole depth-W match-count accumulation

    AB[p] = c_p[entering] - c_p[leaving]
          = sum_d eq(K[p+W-d], K[p+W]) - sum_d eq(K[p+d], K[p])

on-chip: HBM traffic drops to one read of K and one write of AB per
position, and the VPU's (8, 128) lanes are fully used by processing 8
independent tiles per grid step (one per sublane row).  The depth loop is
unrolled with static lane slices - pure vector compare+add, no gathers, no
scatters, no MXU.

The kernel computes the de-sequentialised window-count terms of the
reference's rolling update (ref /root/reference/src/GenomeMiner.jl:69-77);
everything around it (K/g precompute, delta assembly, per-tile init
distances, cumulative sum) stays in XLA, which fuses those elementwise
passes well.  Contract and results are bit-identical to
ops.scan.scan_window_distances (cross-checked in tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import profile_lookup, rolling_kmer_codes_jnp

ROWS = 8  # tiles per grid step = sublane count for int32


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _match_counts_kernel(k_ref, ab_ref, *, w: int, t: int):
    """One grid step: ROWS tiles. k_ref: (ROWS, t + w), ab_ref: (ROWS, t).

    int32 lanes: Mosaic on v5e rejects sub-word integer comparisons
    (vector<...xi16> cmpi fails to compile), so codes and accumulators stay
    int32 with 8 tiles per grid step.
    """
    k_all = k_ref[:, :]
    kl = k_all[:, :t]  # leaving k-mer of each transition
    kr = k_all[:, w : w + t]  # entering k-mer

    # Mosaic constraints shape this loop: a full static unroll OOMs scoped
    # VMEM (one live temp per depth) and dynamic lane slices must be
    # 128-aligned.  Instead the two shifted views are carried as cyclic
    # rolls advanced by +-1 (static shift) per iteration:
    #   ka_d = roll_left(K, w - d)   ->  ka_d[:, :t] == K[:, w-d : w-d+t]
    #   kb_d = roll_left(K, d - 1)   ->  kb_d[:, :t] == K[:, d-1 : d-1+t]
    # (wrapped lanes stay >= t because the shifts stay < w, so the compared
    # region is never contaminated).
    ka0 = jnp.roll(k_all, -(w - 1), axis=1)
    zero = jnp.zeros((ROWS, t), dtype=jnp.int32)

    def body(d, carry):
        a, b, ka, kb = carry
        a = a + (ka[:, :t] == kr).astype(jnp.int32)
        b = b + (kb[:, :t] == kl).astype(jnp.int32)
        return a, b, jnp.roll(ka, 1, axis=1), jnp.roll(kb, -1, axis=1)

    a, b, _, _ = jax.lax.fori_loop(1, w + 1, body, (zero, zero, ka0, k_all))
    ab_ref[:, :] = a - b


def _pair_counts_kernel(kmain_ref, khalo_ref, ab_ref, *, w: int, t: int, depth: int, rows: int = ROWS):
    """Partial-depth variant: net pair-match delta at depths 1..depth only.

    ab[p] = sum_{d=1..depth} eq(K[p+W-d], K[p+W]) - eq(K[p+d], K[p])

    i.e. pairs gained by the entering k-mer minus pairs lost by the leaving
    k-mer, counting only partner distances <= depth.  Cumulating these gives
    the exact partial pair count P̂_p <= P_p, hence a certified LOWER bound
    on the window distance (see ops.scan.scan_window_lower_bounds).

    The tile arrives as a contiguous main block (ROWS, t) - a free reshape
    of the flat K array, no overlapped-copy materialisation in HBM - plus a
    small halo (ROWS, w..) holding K[i*t + t : i*t + t + w].  The depth loop
    is a static Python unroll of UNALIGNED STATIC lane slices (supported by
    Mosaic; only *dynamic* lane slices must be 128-aligned), which avoids
    the two cyclic rolls per iteration of the full-depth kernel.
    """
    k_all = jnp.concatenate([kmain_ref[:, :], khalo_ref[:, :w]], axis=1)
    kl = k_all[:, :t]
    kr = k_all[:, w : w + t]

    a = jnp.zeros((rows, t), dtype=jnp.int32)
    b = jnp.zeros((rows, t), dtype=jnp.int32)
    for d in range(1, depth + 1):
        a = a + (k_all[:, w - d : w - d + t] == kr).astype(jnp.int32)
        b = b + (k_all[:, d : d + t] == kl).astype(jnp.int32)
    ab_ref[:, :] = a - b


@partial(jax.jit, static_argnames=("w", "t", "depth", "rows", "interpret"))
def pair_counts(tiles_main: jnp.ndarray, tiles_halo: jnp.ndarray, w: int, t: int, depth: int, rows: int = ROWS, interpret: bool | None = None):
    """Partial-depth net pair-match deltas per transition, per tile.

    tiles_main: (n_tiles, t) int32 k-mer codes (tile i = K[i*t : i*t + t]);
    tiles_halo: (n_tiles, >=w) int32 (tile i = K[i*t + t : i*t + t + w]).
    n_tiles must be a multiple of ``rows`` (tiles per grid step; more rows
    amortise the fixed per-step cost).  Returns (n_tiles, t) int32.
    """
    if interpret is None:
        interpret = _interpret_default()
    assert rows % 8 == 0, f"rows must be a multiple of 8 (int32 sublanes), got {rows}"
    n_tiles = tiles_main.shape[0]
    hw = tiles_halo.shape[1]
    grid = (n_tiles // rows,)
    return pl.pallas_call(
        partial(_pair_counts_kernel, w=w, t=t, depth=depth, rows=rows),
        out_shape=jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tiles_main, tiles_halo)


@partial(jax.jit, static_argnames=("w", "t", "interpret"))
def match_counts(tiles_k: jnp.ndarray, w: int, t: int, interpret: bool | None = None):
    """AB = (entering-count - leaving-count) per transition, per tile.

    tiles_k: (n_tiles, t + w) int32 k-mer codes (n_tiles a multiple of ROWS).
    Returns (n_tiles, t) int32.
    """
    if interpret is None:
        interpret = _interpret_default()
    n_tiles = tiles_k.shape[0]
    grid = (n_tiles // ROWS,)
    return pl.pallas_call(
        partial(_match_counts_kernel, w=w, t=t),
        out_shape=jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, t + w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((ROWS, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tiles_k)


@partial(jax.jit, static_argnames=("k", "ws", "r", "tile_windows", "interpret"))
def scan_window_distances_pallas(
    codes: jnp.ndarray,
    s_profile: jnp.ndarray,
    k: int,
    ws: int,
    r: int,
    tile_windows: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for ops.scan.scan_window_distances backed by the
    Pallas match-count kernel.  Returns int32[n - ws + 1] exact scaled
    distances (bit-identical to the XLA path)."""
    n = codes.shape[0]
    w = ws - k + 1
    nw = n - ws + 1
    t = tile_windows
    kcodes = rolling_kmer_codes_jnp(codes, k)
    g = profile_lookup(kcodes, s_profile)

    n_tiles = -(-nw // t)
    n_tiles_pad = -(-n_tiles // ROWS) * ROWS

    # Overlapped tile matrix of K codes: tile i covers transitions
    # [i*t, i*t + t) and needs K[i*t .. i*t + t + w - 1].
    kcodes_pad = jnp.pad(kcodes, (0, n_tiles_pad * t + w - kcodes.shape[0]))

    def take_tile(i):
        return jax.lax.dynamic_slice(kcodes_pad, (i * t,), (t + w,))

    tiles_k = jax.vmap(take_tile)(jnp.arange(n_tiles_pad))

    ab = match_counts(tiles_k, w, t, interpret=interpret).reshape(-1)

    # Per-tile-independent terms assembled in XLA (fused elementwise).
    kl = kcodes[: nw - 1]
    kr = kcodes[w : w + nw - 1]
    r2 = jnp.int32(2 * r * r)
    delta = r2 * (kl != kr) + r2 * ab[: nw - 1] + (2 * r) * (g[: nw - 1] - g[w : w + nw - 1])

    c0 = jax.ops.segment_sum(
        jnp.ones(w, dtype=jnp.int32), kcodes[:w], num_segments=s_profile.shape[0]
    )
    diff0 = r * c0 - s_profile
    d0 = jnp.sum(diff0 * diff0)
    return jnp.concatenate([d0[None], d0 + jnp.cumsum(delta)])


def pair_ab_from_kcodes(
    kcodes: jnp.ndarray,
    w: int,
    nt: int,
    depth: int,
    tile_windows: int = 8192,
    rows: int = ROWS,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas-backed net pair-match deltas ab[0:nt] from precomputed K codes
    (the kernel contract of ops.scan._pair_ab_xla; bit-identical outputs).

    Main blocks are a FREE reshape of the flat K array (no overlapped-tile
    copy in HBM); only the small (n_tiles, halo) matrix is materialised.
    ``kcodes`` must hold at least nt + w codes.  Returns int32[nt].
    """
    if interpret is None:
        interpret = _interpret_default()
    t = tile_windows
    n_tiles = -(-nt // t)
    n_tiles_pad = -(-n_tiles // rows) * rows
    hw = -(-w // 128) * 128  # lane-aligned halo width
    pad = n_tiles_pad * t + hw - kcodes.shape[0]
    kcodes_pad = jnp.pad(kcodes, (0, max(0, pad)))

    tiles_main = kcodes_pad[: n_tiles_pad * t].reshape(n_tiles_pad, t)
    tiles_halo = jax.vmap(
        lambda i: jax.lax.dynamic_slice(kcodes_pad, ((i + 1) * t,), (hw,))
    )(jnp.arange(n_tiles_pad))
    ab = pair_counts(tiles_main, tiles_halo, w, t, depth, rows=rows, interpret=interpret)
    return ab.reshape(-1)[:nt]


def _codes_pair_kernel(main_ref, halo_ref, ab_ref, kc_ref, *, k: int, w: int, t: int, depth: int, rows: int):
    """Codes-in variant: raw 2-bit codes in, (ab, kcodes) out.

    Folds the rolling K-code build into the pair kernel so the XLA
    genome-length K-code pass (the single most expensive glue stage of the
    split pipeline: six unaligned lane rotations through HBM) disappears;
    codes enter VMEM as int8 (4x less HBM traffic than int32 K codes) and
    the K build is ``k`` shift-adds over VMEM-resident lanes.

    The depth loop uses a SHARED compare stream per depth (the trick from
    scan_fused.py step 2): eq_d[i] = (K[i] == K[i+d]) serves both the
    entering term (lane-shifted by w-d) and the leaving term, so each depth
    costs 1 compare + 2 adds instead of 2 compares + 2 adds.

    main_ref: (rows, t) int8; halo_ref: (rows, hw >= w + k - 1) int8;
    ab_ref: (rows, t) int32 net pair deltas; kc_ref: (rows, t) int32 K codes
    of the main lanes (consumed by the XLA profile lookup downstream).
    """
    codes = jnp.concatenate(
        [main_ref[:, :].astype(jnp.int32), halo_ref[:, :].astype(jnp.int32)], axis=1
    )
    lk = t + w
    kc = codes[:, :lk] << (2 * (k - 1))
    for j in range(1, k):
        kc = kc + (codes[:, j : j + lk] << (2 * (k - 1 - j)))
    kc_ref[:, :] = kc[:, :t]

    ab = jnp.zeros((rows, t), dtype=jnp.int32)
    for d in range(1, depth + 1):
        eq = (kc[:, : lk - d] == kc[:, d:lk]).astype(jnp.int32)
        ab = ab + (eq[:, w - d : w - d + t] - eq[:, :t])
    ab_ref[:, :] = ab


@partial(jax.jit, static_argnames=("k", "w", "nt", "nkc", "depth", "tile_windows", "rows", "interpret"))
def codes_pair_ab_kcodes(
    codes_pad: jnp.ndarray,
    k: int,
    w: int,
    nt: int,
    nkc: int,
    depth: int,
    tile_windows: int = 8192,
    rows: int = 8,
    interpret: bool | None = None,
):
    """Net pair deltas AND K codes straight from int8 codes (one kernel).

    codes_pad: int8[>= n_tiles*t + hw] (pad is cheap: int8, done by caller
    or here).  Returns (ab int32[nt], kcodes int32[nkc]) - bit-identical to
    (_pair_ab_xla(K, w, nt, depth), rolling_kmer_codes_jnp(codes, k)[:nkc]).

    ``rows`` tiles per grid step (a multiple of 8).  The depth loop is a
    static unroll, and Mosaic's stack allocator keeps one eq temp live per
    depth: the scoped-VMEM budget is ~ rows * (t + w) * depth * 4 B, which
    caps rows at 8 for t=8192, depth=32 (16 MB scoped VMEM; rows=32 was
    measured to OOM at 36 MB).
    """
    if interpret is None:
        interpret = _interpret_default()
    assert rows % 8 == 0, f"rows must be a multiple of 8 (int32 sublanes), got {rows}"
    t = tile_windows
    need = max(nt, nkc)
    n_tiles = -(-need // t)
    n_tiles = -(-n_tiles // rows) * rows
    hw = -(-(w + k - 1) // 128) * 128
    total = n_tiles * t + hw
    if codes_pad.shape[0] < total:
        codes_pad = jnp.pad(codes_pad, (0, total - codes_pad.shape[0]))
    main = codes_pad[: n_tiles * t].reshape(n_tiles, t)
    halo = jax.vmap(
        lambda i: jax.lax.dynamic_slice(codes_pad, ((i + 1) * t,), (hw,))
    )(jnp.arange(n_tiles))
    ab, kc = pl.pallas_call(
        partial(_codes_pair_kernel, k=k, w=w, t=t, depth=depth, rows=rows),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
        ),
        grid=(n_tiles // rows,),
        in_specs=[
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(main, halo)
    return ab.reshape(-1)[:nt], kc.reshape(-1)[:nkc]


def _codes_pair_roll_kernel(main_ref, halo_ref, ab_ref, kc_ref, *, k: int, w: int, t: int, depth: int, rows: int):
    """Roll-carried variant of _codes_pair_kernel: the depth loop is a
    ``fori_loop`` whose shifted compare streams advance by a STATIC -1 roll
    per iteration, so live VMEM stays O(1) in depth (the static unroll keeps
    one eq temp alive per depth, capping t at 8192; here t can be 32768+ and
    the fixed per-grid-step cost amortises over 4x more windows).

    The entering-term accumulator uses the shifted-prefix identity: with
    B_j = roll(B_{j-1}, -1) + eq_j one gets B_D[p] = sum_d eq_d[p + D - d],
    hence a[p] = sum_d eq_d[p + w - d] = B_D[p + w - D] - a single static
    roll by (w - depth) at the end.  Wrap-in garbage of the rolled compare
    stream stays in lanes >= L - depth, strictly right of every lane the
    outputs read (needs L >= t + w).  Bit-identical to _codes_pair_kernel.
    """
    codes = jnp.concatenate(
        [main_ref[:, :].astype(jnp.int32), halo_ref[:, :].astype(jnp.int32)], axis=1
    )
    lc = codes.shape[1]
    L = lc - k + 1  # K-code lanes; L = t + hw - k + 1 >= t + w
    kc = codes[:, :L] << (2 * (k - 1))
    for j in range(1, k):
        kc = kc + (codes[:, j : j + L] << (2 * (k - 1 - j)))
    kc_ref[:, :] = kc[:, :t]

    def body(d, carry):
        kr, b_acc, big_b = carry
        kr = jnp.roll(kr, -1, axis=1)  # kr[q] = kc[q + d] (tail wraps -> garbage)
        eq = (kc == kr).astype(jnp.int32)
        b_acc = b_acc + eq[:, :t]
        big_b = jnp.roll(big_b, -1, axis=1) + eq
        return kr, b_acc, big_b

    zero_t = jnp.zeros((rows, t), dtype=jnp.int32)
    zero_l = jnp.zeros((rows, L), dtype=jnp.int32)
    _, b_acc, big_b = jax.lax.fori_loop(1, depth + 1, body, (kc, zero_t, zero_l))
    a = jnp.roll(big_b, -(w - depth), axis=1)[:, :t]
    ab_ref[:, :] = a - b_acc


def _codes_pair_roll_multi_kernel(main_ref, halo_ref, ab_ref, kc_ref, *, k: int, ws_tuple: tuple, t: int, depth: int, rows: int):
    """Multi-windowsize variant of _codes_pair_roll_kernel: ONE depth loop
    serves EVERY windowsize group.

    The shifted-prefix accumulator B_D[p] = sum_d eq_d[p + D - d] and the
    leaving-term accumulator b[p] = sum_d eq_d[p] are both independent of
    the window width; group g's net pair delta is just

        ab_g = roll(B_D, -(w_g - D))[:, :t] - b

    - one static roll + subtract per group, so scanning G cluster
    windowsizes costs ONE pair pass instead of G (the cluster engine's
    remaining per-group kernel, ops/scan_cluster.py).

    ab_ref: (rows, G * t) int32 - group g's deltas at columns [g*t, (g+1)*t).
    """
    codes = jnp.concatenate(
        [main_ref[:, :].astype(jnp.int32), halo_ref[:, :].astype(jnp.int32)], axis=1
    )
    lc = codes.shape[1]
    L = lc - k + 1  # needs L >= t + max(w)
    kc = codes[:, :L] << (2 * (k - 1))
    for j in range(1, k):
        kc = kc + (codes[:, j : j + L] << (2 * (k - 1 - j)))
    kc_ref[:, :] = kc[:, :t]

    def body(d, carry):
        kr, b_acc, big_b = carry
        kr = jnp.roll(kr, -1, axis=1)
        eq = (kc == kr).astype(jnp.int32)
        b_acc = b_acc + eq[:, :t]
        big_b = jnp.roll(big_b, -1, axis=1) + eq
        return kr, b_acc, big_b

    zero_t = jnp.zeros((rows, t), dtype=jnp.int32)
    zero_l = jnp.zeros((rows, L), dtype=jnp.int32)
    _, b_acc, big_b = jax.lax.fori_loop(1, depth + 1, body, (kc, zero_t, zero_l))
    for g, ws in enumerate(ws_tuple):
        w = ws - k + 1
        a = jnp.roll(big_b, -(w - depth), axis=1)[:, :t]
        ab_ref[:, g * t : (g + 1) * t] = a - b_acc


def _codes_pair_multi_kernel(main_ref, halo_ref, ab_ref, kc_ref, *, k: int, ws_tuple: tuple, t: int, depth: int, rows: int):
    """Static-unroll multi-windowsize variant of _codes_pair_kernel.

    Shares ONE compare stream per depth across every windowsize group (the
    scan_fused trick): eq_d[i] = (K[i] == K[i+d]) gives group g's entering
    term at static lane shift w_g - d and the GROUP-INDEPENDENT leaving term
    at shift 0, so each depth costs 1 compare + (G + 1) adds - no cyclic
    rolls (the roll-carried variant pays 2 lane rolls per depth, which
    Mosaic lowers to lane shuffles).  Scoped VMEM holds one eq per depth:
    rows * (t + hw) * depth * 4 B caps t at 8192 for depth 32 (same budget
    as codes_pair_ab_kcodes).

    ab_ref: (rows, G * t) int32 - group g's net pair deltas at columns
    [g*t, (g+1)*t); kc_ref: (rows, t) int32 K codes.
    """
    codes = jnp.concatenate(
        [main_ref[:, :].astype(jnp.int32), halo_ref[:, :].astype(jnp.int32)], axis=1
    )
    lc = codes.shape[1]
    L = lc - k + 1  # needs L >= t + max(w)
    kc = codes[:, :L] << (2 * (k - 1))
    for j in range(1, k):
        kc = kc + (codes[:, j : j + L] << (2 * (k - 1 - j)))
    kc_ref[:, :] = kc[:, :t]

    ws_list = [ws - k + 1 for ws in ws_tuple]
    a = [jnp.zeros((rows, t), dtype=jnp.int32) for _ in ws_list]
    b = jnp.zeros((rows, t), dtype=jnp.int32)
    for d in range(1, depth + 1):
        eq = (kc[:, : L - d] == kc[:, d:L]).astype(jnp.int32)
        b = b + eq[:, :t]
        for g, w in enumerate(ws_list):
            a[g] = a[g] + eq[:, w - d : w - d + t]
    for g in range(len(ws_list)):
        ab_ref[:, g * t : (g + 1) * t] = a[g] - b


@partial(jax.jit, static_argnames=("k", "ws_tuple", "nt", "nkc", "depth", "tile_windows", "rows", "interpret"))
def codes_pair_multi(
    codes_pad: jnp.ndarray,
    k: int,
    ws_tuple: tuple,
    nt: int,
    nkc: int,
    depth: int,
    tile_windows: int = 8192,
    rows: int = 8,
    interpret: bool | None = None,
):
    """codes_pair_roll_multi contract backed by the static-unroll kernel
    (bit-identical outputs; candidate production kernel - ablate on TPU)."""
    if interpret is None:
        interpret = _interpret_default()
    assert rows % 8 == 0, f"rows must be a multiple of 8 (int32 sublanes), got {rows}"
    t = tile_windows
    ngroups = len(ws_tuple)
    max_w = max(ws_tuple) - k + 1
    need = max(nt, nkc)
    n_tiles = -(-need // t)
    n_tiles = -(-n_tiles // rows) * rows
    hw = -(-(max_w + k - 1) // 128) * 128
    total = n_tiles * t + hw
    if codes_pad.shape[0] < total:
        codes_pad = jnp.pad(codes_pad, (0, total - codes_pad.shape[0]))
    main = codes_pad[: n_tiles * t].reshape(n_tiles, t)
    halo = jax.vmap(
        lambda i: jax.lax.dynamic_slice(codes_pad, ((i + 1) * t,), (hw,))
    )(jnp.arange(n_tiles))
    ab, kc = pl.pallas_call(
        partial(_codes_pair_multi_kernel, k=k, ws_tuple=ws_tuple, t=t, depth=depth, rows=rows),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, ngroups * t), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
        ),
        grid=(n_tiles // rows,),
        in_specs=[
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, ngroups * t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(main, halo)
    ab_groups = jnp.stack(
        [ab[:, g * t : (g + 1) * t].reshape(-1)[:nt] for g in range(ngroups)]
    )
    return ab_groups, kc.reshape(-1)[:nkc]


@partial(jax.jit, static_argnames=("k", "ws_tuple", "nt", "nkc", "depth", "tile_windows", "rows", "interpret"))
def codes_pair_roll_multi(
    codes_pad: jnp.ndarray,
    k: int,
    ws_tuple: tuple,
    nt: int,
    nkc: int,
    depth: int,
    tile_windows: int = 32768,
    rows: int = 8,
    interpret: bool | None = None,
):
    """Net pair deltas for EVERY windowsize group plus K codes, one kernel.

    Returns (ab int32[G, nt], kcodes int32[nkc]) with ab[g] bit-identical
    to _pair_ab_xla(K, ws_tuple[g] - k + 1, nt, depth)."""
    if interpret is None:
        interpret = _interpret_default()
    assert rows % 8 == 0, f"rows must be a multiple of 8 (int32 sublanes), got {rows}"
    t = tile_windows
    ngroups = len(ws_tuple)
    max_w = max(ws_tuple) - k + 1
    need = max(nt, nkc)
    n_tiles = -(-need // t)
    n_tiles = -(-n_tiles // rows) * rows
    hw = -(-(max_w + k - 1) // 128) * 128
    total = n_tiles * t + hw
    if codes_pad.shape[0] < total:
        codes_pad = jnp.pad(codes_pad, (0, total - codes_pad.shape[0]))
    main = codes_pad[: n_tiles * t].reshape(n_tiles, t)
    halo = jax.vmap(
        lambda i: jax.lax.dynamic_slice(codes_pad, ((i + 1) * t,), (hw,))
    )(jnp.arange(n_tiles))
    ab, kc = pl.pallas_call(
        partial(_codes_pair_roll_multi_kernel, k=k, ws_tuple=ws_tuple, t=t, depth=depth, rows=rows),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, ngroups * t), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
        ),
        grid=(n_tiles // rows,),
        in_specs=[
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, ngroups * t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(main, halo)
    ab_groups = jnp.stack(
        [ab[:, g * t : (g + 1) * t].reshape(-1)[:nt] for g in range(ngroups)]
    )
    return ab_groups, kc.reshape(-1)[:nkc]


@partial(jax.jit, static_argnames=("k", "w", "nt", "nkc", "depth", "tile_windows", "rows", "interpret"))
def codes_pair_roll(
    codes_pad: jnp.ndarray,
    k: int,
    w: int,
    nt: int,
    nkc: int,
    depth: int,
    tile_windows: int = 32768,
    rows: int = 8,
    interpret: bool | None = None,
):
    """codes_pair_ab_kcodes contract backed by the roll-carried kernel
    (same bit-identical outputs; O(1)-in-depth VMEM enables 4x tiles)."""
    if interpret is None:
        interpret = _interpret_default()
    assert rows % 8 == 0, f"rows must be a multiple of 8 (int32 sublanes), got {rows}"
    t = tile_windows
    need = max(nt, nkc)
    n_tiles = -(-need // t)
    n_tiles = -(-n_tiles // rows) * rows
    # halo must give L = t + hw - k + 1 >= t + w  (roll-garbage containment)
    hw = -(-(w + k - 1) // 128) * 128
    total = n_tiles * t + hw
    if codes_pad.shape[0] < total:
        codes_pad = jnp.pad(codes_pad, (0, total - codes_pad.shape[0]))
    main = codes_pad[: n_tiles * t].reshape(n_tiles, t)
    halo = jax.vmap(
        lambda i: jax.lax.dynamic_slice(codes_pad, ((i + 1) * t,), (hw,))
    )(jnp.arange(n_tiles))
    ab, kc = pl.pallas_call(
        partial(_codes_pair_roll_kernel, k=k, w=w, t=t, depth=depth, rows=rows),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, t), jnp.int32),
        ),
        grid=(n_tiles // rows,),
        in_specs=[
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(main, halo)
    return ab.reshape(-1)[:nt], kc.reshape(-1)[:nkc]


@partial(jax.jit, static_argnames=("k", "ws", "r", "depth", "tile_windows", "interpret", "use_roll"))
def scan_window_lower_bounds_codes(
    codes: jnp.ndarray,
    s_profile: jnp.ndarray,
    k: int,
    ws: int,
    r: int,
    depth: int,
    tile_windows: int = 8192,
    interpret: bool | None = None,
    use_roll: bool = False,
) -> jnp.ndarray:
    """Certified lower bounds with the codes-in kernel (production TPU path).

    Bit-identical to ops.scan.scan_window_lower_bounds; vs the kcodes-in
    pipeline (scan_window_lower_bounds_pallas) it removes the XLA K-code
    build and the overlapped-halo int32 reads - the kernel emits both ab and
    the K codes the profile lookup needs.  ``use_roll`` selects the
    roll-carried kernel (codes_pair_roll; O(1)-in-depth VMEM, bigger tiles).
    """
    n = codes.shape[0]
    w = ws - k + 1
    nw = n - ws + 1
    nt = max(nw - 1, 1)
    nkc = nw + w - 1  # K lanes the lookup needs: g[0 .. nw-1+w)
    pair_fn = codes_pair_roll if use_roll else codes_pair_ab_kcodes
    ab, kcodes = pair_fn(
        codes, k, w, nt, nkc, depth, tile_windows, interpret=interpret
    )
    g = profile_lookup(kcodes, s_profile)

    from .scan import _lower_bound_base

    l0 = _lower_bound_base(kcodes, g, s_profile, w, r, depth)
    if nw <= 1:
        return l0[None]
    r2 = jnp.int32(2 * r * r)
    delta = r2 * ab + (2 * r) * (g[:nt] - g[w : w + nt])
    return jnp.concatenate([l0[None], l0 + jnp.cumsum(delta)])


@partial(jax.jit, static_argnames=("k", "ws", "r", "depth", "tile_windows", "interpret"))
def scan_window_lower_bounds_pallas(
    codes: jnp.ndarray,
    s_profile: jnp.ndarray,
    k: int,
    ws: int,
    r: int,
    depth: int,
    tile_windows: int = 8192,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pallas-backed certified lower bounds L[p] <= D[p] at partial depth.

    Bit-identical to ops.scan.scan_window_lower_bounds; used by the bitmap
    (pruning) pass, where only a conservative ``any(D < thr)`` test is
    needed.  Cost is O(depth)/bp instead of O(W)/bp."""
    n = codes.shape[0]
    w = ws - k + 1
    nw = n - ws + 1
    kcodes = rolling_kmer_codes_jnp(codes, k)
    g = profile_lookup(kcodes, s_profile)

    ab = pair_ab_from_kcodes(kcodes, w, max(nw - 1, 1), depth, tile_windows, interpret=interpret)

    r2 = jnp.int32(2 * r * r)
    delta = r2 * ab[: nw - 1] + (2 * r) * (g[: nw - 1] - g[w : w + nw - 1])

    # L[0] = r^2 (w + 2 P̂_0) - 2 r G_0 + ||S||^2
    from .scan import _lower_bound_base

    l0 = _lower_bound_base(kcodes, g, s_profile, w, r, depth)
    return jnp.concatenate([l0[None], l0 + jnp.cumsum(delta)])
