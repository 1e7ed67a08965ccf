"""Pallas kernel correctness: bit-identical to the XLA scan (interpret mode
on CPU; the same kernel compiles via Mosaic on real TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kmergma_tpu.ops.scan import scan_window_distances, scan_window_distances_np
from kmergma_tpu.ops.scan_pallas import scan_window_distances_pallas


@pytest.mark.parametrize("n,k,ws", [(3000, 6, 289), (1000, 4, 97)])
def test_pallas_scan_matches_xla(n, k, ws):
    rng = np.random.default_rng(n)
    codes = rng.integers(0, 4, n, dtype=np.int8)
    s = rng.integers(0, 40, 4**k).astype(np.int32)
    r = 17
    a = np.asarray(scan_window_distances(jnp.asarray(codes), jnp.asarray(s), k, ws, r))
    b = np.asarray(
        scan_window_distances_pallas(
            jnp.asarray(codes), jnp.asarray(s), k, ws, r, tile_windows=512, interpret=True
        )
    )
    assert a.tolist() == b.tolist()


def test_pallas_scan_matches_bruteforce():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 800, dtype=np.int8)
    s = rng.integers(0, 10, 4**4).astype(np.int32)
    expected = scan_window_distances_np(codes, s, 4, 97, 7)
    got = np.asarray(
        scan_window_distances_pallas(
            jnp.asarray(codes), jnp.asarray(s), 4, 97, 7, tile_windows=256, interpret=True
        )
    )
    assert got.tolist() == expected.tolist()
