"""Fully-fused scan kernel (ops/scan_fused.py): bit-equality with the split
lower-bound pass, in interpret mode on CPU (the kernel contract; the same
assertions ran against the real v5e - see the module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp

from kmergma_tpu.ops import scan as S
from kmergma_tpu.ops.scan_fused import ROWS, fused_record_bitmaps


def _expected_blocks(codes, s, k, ws, r, depth, thr_int, n_blocks, block):
    L = np.asarray(S.scan_window_lower_bounds(jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth))
    nw = L.shape[0]
    pad = np.zeros(n_blocks * block, dtype=bool)
    pad[:nw] = L < thr_int
    return pad.reshape(-1, block).any(axis=1)


def test_fused_bitmaps_bit_identical():
    rng = np.random.default_rng(0)
    k, ws, r, depth = 6, 289, 12, 32
    w = ws - k + 1
    n = 50000
    nw = n - ws + 1
    codes = rng.integers(0, 4, n, dtype=np.int8)
    s = rng.integers(0, 10, 4**k).astype(np.int32)

    t, block = 2048, 512
    n_tiles = -(-(-(-nw // t)) // ROWS) * ROWS
    hw = -(-(w + 1) // 128) * 128 + 128
    cd = np.zeros(n_tiles * t + t + hw, np.int8)
    cd[:n] = codes

    L0 = int(S._first_window_l0(jnp.asarray(cd), jnp.asarray(s), k=k, ws=ws, r=r, depth=depth))
    L = np.asarray(S.scan_window_lower_bounds(jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth))
    assert L0 == int(L[0])
    thr_int = np.int32(np.percentile(L, 3))

    meta = jnp.asarray(np.array([thr_int, L0, nw], np.int32))
    got = np.asarray(
        fused_record_bitmaps(
            jnp.asarray(cd), jnp.asarray(s), meta,
            k=k, ws=ws, r=r, depth=depth, t=t, block=block, n_tiles=n_tiles,
            interpret=True,
        )
    ).reshape(-1).astype(bool)
    exp = _expected_blocks(codes, s, k, ws, r, depth, thr_int, got.size // (1), block)
    assert got.tolist() == exp.tolist()
    # the in-kernel one-hot MXU lookup variant must be bit-identical too
    got_mxu = np.asarray(
        fused_record_bitmaps(
            jnp.asarray(cd), jnp.asarray(s), meta,
            k=k, ws=ws, r=r, depth=depth, t=t, block=block, n_tiles=n_tiles,
            interpret=True, lookup="mxu",
        )
    ).reshape(-1).astype(bool)
    assert got_mxu.tolist() == exp.tolist()
    # the bf16 limb-split lookup (big-S exactness mode) likewise
    got_limbs = np.asarray(
        fused_record_bitmaps(
            jnp.asarray(cd), jnp.asarray(s), meta,
            k=k, ws=ws, r=r, depth=depth, t=t, block=block, n_tiles=n_tiles,
            interpret=True, lookup="mxu_limbs",
        )
    ).reshape(-1).astype(bool)
    assert got_limbs.tolist() == exp.tolist()


def test_fused_bitmaps_big_s_limbs():
    """S >= 256 (past the direct-f32 exactness bound measured on v5e) rides
    the limb-split table: bit-identical in interpret mode; on chip the
    engine routes here automatically (ScanEngine._s_max gate)."""
    rng = np.random.default_rng(4)
    k, ws, r, depth = 5, 120, 40, 16
    w = ws - k + 1
    n = 20000
    nw = n - ws + 1
    codes = rng.integers(0, 4, n, dtype=np.int8)
    s = rng.integers(0, 1500, 4**k).astype(np.int32)  # far past 256

    t, block = 1024, 512
    n_tiles = -(-(-(-nw // t)) // ROWS) * ROWS
    hw = -(-(w + 1) // 128) * 128 + 128
    cd = np.zeros(n_tiles * t + t + hw, np.int8)
    cd[:n] = codes
    L0 = int(S._first_window_l0(jnp.asarray(cd), jnp.asarray(s), k=k, ws=ws, r=r, depth=depth))
    L = np.asarray(S.scan_window_lower_bounds(jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth))
    thr_int = np.int32(np.percentile(L, 5))
    meta = jnp.asarray(np.array([thr_int, L0, nw], np.int32))
    got = np.asarray(
        fused_record_bitmaps(
            jnp.asarray(cd), jnp.asarray(s), meta,
            k=k, ws=ws, r=r, depth=depth, t=t, block=block, n_tiles=n_tiles,
            interpret=True, lookup="mxu_limbs",
        )
    ).reshape(-1).astype(bool)
    exp = _expected_blocks(codes, s, k, ws, r, depth, thr_int, got.size, block)
    assert got.tolist() == exp.tolist()


def test_engine_fused_stream_matches_split():
    """ScanEngine(use_fused=True) produces the identical candidate stream."""
    rng = np.random.default_rng(4)
    k, ws, r = 6, 289, 9
    codes = rng.integers(0, 4, 80000, dtype=np.int8)
    s = rng.integers(0, 10, 4**k).astype(np.int32)

    split = S.ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=65536)
    prep = split.prepare_codes(codes)
    _, probe, _ = split.record_stream(codes, thr=1e9, codes_dev=prep)
    thr = float(np.percentile([v for _, v in probe], 5))
    d0_a, stream_a, _ = split.record_stream(codes, thr, codes_dev=prep)

    fused = S.ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=65536, use_pallas=True, use_fused=True)
    assert fused.use_fused
    d0_b, stream_b, _ = fused.record_stream(codes, thr, codes_dev=fused.prepare_codes(codes))
    assert d0_a == d0_b
    assert stream_a == stream_b


def test_segmented_fused_matches_split():
    """The segmented long-record pipeline with the fused kernel produces
    the identical stream as the split path."""
    rng = np.random.default_rng(9)
    k, ws, r = 6, 289, 9
    codes = rng.integers(0, 4, 140000, dtype=np.int8)
    s = rng.integers(0, 10, 4**k).astype(np.int32)

    split = S.ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=65536)
    _, probe, _ = split.record_stream(codes, thr=1e9, codes_dev=split.prepare_codes(codes))
    thr = float(np.percentile([v for _, v in probe], 5))
    d0_a, stream_a, _ = split.record_stream(codes, thr)  # segmented split

    fused = S.ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=65536, use_pallas=True, use_fused=True)
    assert codes.shape[0] - ws + 1 > 2 * fused.chunk
    d0_b, stream_b, _ = fused.record_stream(codes, thr)  # segmented fused
    assert d0_a == d0_b
    assert stream_a == stream_b


def test_explicit_fused_deep_bound_raises():
    """use_fused=True past depth 16 fails fast with a clear message (the
    Mosaic compile would otherwise die opaquely through the relay)."""
    import numpy as np
    import pytest

    from kmergma_tpu.ops.scan import ScanEngine

    s = np.ones(4**6, dtype=np.int64)
    with pytest.raises(ValueError, match="bound_depth <= 16"):
        ScanEngine(s, k=6, ws=289, r=4, use_fused=True, bound_depth=32)
