"""Pallas kernel correctness: bit-identical to the XLA scan (interpret mode
on CPU; the same kernel compiles via Mosaic on real TPU)."""

import os

import numpy as np
import pytest

import jax
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


class TestLowerBounds:
    """Certified partial-depth lower bounds: L <= D always, equality at
    depth = W - 1, Pallas == XLA, and the engine's bound-driven bitmap path
    yields the same exact candidate stream as the exact-bitmap path."""

    def test_bound_below_exact_and_tight_at_full_depth(self):
        from kmergma_tpu.ops.scan import scan_window_lower_bounds

        rng = np.random.default_rng(11)
        n, k, ws, r = 2500, 6, 289, 84
        w = ws - k + 1
        codes = rng.integers(0, 4, n, dtype=np.int8)
        s = rng.integers(0, 40, 4**k).astype(np.int32)
        d = np.asarray(scan_window_distances(jnp.asarray(codes), jnp.asarray(s), k, ws, r))
        for depth in (1, 8, 32):
            lb = np.asarray(
                scan_window_lower_bounds(jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth)
            )
            assert (lb <= d).all()
        full = np.asarray(
            scan_window_lower_bounds(jnp.asarray(codes), jnp.asarray(s), k, ws, r, w - 1)
        )
        assert full.tolist() == d.tolist()

    @pytest.mark.parametrize("depth", [4, 32])
    def test_pallas_bounds_match_xla(self, depth):
        from kmergma_tpu.ops.scan import scan_window_lower_bounds
        from kmergma_tpu.ops.scan_pallas import scan_window_lower_bounds_pallas

        rng = np.random.default_rng(depth)
        n, k, ws, r = 1500, 4, 97, 7
        codes = rng.integers(0, 4, n, dtype=np.int8)
        s = rng.integers(0, 10, 4**k).astype(np.int32)
        a = np.asarray(
            scan_window_lower_bounds(jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth)
        )
        b = np.asarray(
            scan_window_lower_bounds_pallas(
                jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth,
                tile_windows=256, interpret=True,
            )
        )
        assert a.tolist() == b.tolist()

    @pytest.mark.parametrize("depth", [4, 32])
    def test_codes_in_bounds_match_xla(self, depth):
        """The codes-in kernel pipeline (production TPU path: K-code build
        folded into the pair kernel, shared compare stream) is bit-identical
        to the pure-XLA lower bounds."""
        from kmergma_tpu.ops.scan import scan_window_lower_bounds
        from kmergma_tpu.ops.scan_pallas import scan_window_lower_bounds_codes

        rng = np.random.default_rng(100 + depth)
        n, k, ws, r = 1500, 4, 97, 7
        codes = rng.integers(0, 4, n, dtype=np.int8)
        s = rng.integers(0, 10, 4**k).astype(np.int32)
        a = np.asarray(
            scan_window_lower_bounds(jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth)
        )
        b = np.asarray(
            scan_window_lower_bounds_codes(
                jnp.asarray(codes), jnp.asarray(s), k, ws, r, depth,
                tile_windows=256, interpret=True,
            )
        )
        assert a.tolist() == b.tolist()

    def test_codes_pair_kernel_matches_xla_parts(self):
        """codes_pair_ab_kcodes == (_pair_ab_xla, rolling_kmer_codes_jnp)
        across row counts and unaligned tails."""
        from kmergma_tpu.ops.scan import _pair_ab_xla, rolling_kmer_codes_jnp
        from kmergma_tpu.ops.scan_pallas import codes_pair_ab_kcodes

        rng = np.random.default_rng(9)
        n, k, w, depth = 2000, 5, 93, 16
        codes = rng.integers(0, 4, n, dtype=np.int8)
        kc_ref = np.asarray(rolling_kmer_codes_jnp(jnp.asarray(codes), k))
        nt = n - w - 200
        nkc = n - k + 1
        ab_ref = np.asarray(_pair_ab_xla(jnp.asarray(kc_ref), w, nt, depth))
        for rows in (8, 16):
            ab, kc = codes_pair_ab_kcodes(
                jnp.asarray(codes), k, w, nt, nkc, depth,
                tile_windows=128, rows=rows, interpret=True,
            )
            assert np.asarray(kc).tolist() == kc_ref[:nkc].tolist()
            assert np.asarray(ab).tolist() == ab_ref.tolist()

    def test_codes_pair_roll_matches_unrolled(self):
        """The roll-carried (fori_loop) codes-in kernel is bit-identical to
        the static-unroll kernel and the XLA parts (the O(1)-in-depth VMEM
        variant that enables 4x tiles on TPU)."""
        from kmergma_tpu.ops.scan import _pair_ab_xla, rolling_kmer_codes_jnp
        from kmergma_tpu.ops.scan_pallas import codes_pair_roll

        rng = np.random.default_rng(11)
        n, k, w, depth = 2000, 5, 93, 16
        codes = rng.integers(0, 4, n, dtype=np.int8)
        kc_ref = np.asarray(rolling_kmer_codes_jnp(jnp.asarray(codes), k))
        nt = n - w - 200
        nkc = n - k + 1
        ab_ref = np.asarray(_pair_ab_xla(jnp.asarray(kc_ref), w, nt, depth))
        ab, kc = codes_pair_roll(
            jnp.asarray(codes), k, w, nt, nkc, depth,
            tile_windows=128, rows=8, interpret=True,
        )
        assert np.asarray(kc).tolist() == kc_ref[:nkc].tolist()
        assert np.asarray(ab).tolist() == ab_ref.tolist()

    def test_codes_pair_roll_multi_matches_xla_per_group(self):
        """One roll-kernel pass emits every windowsize group's pair deltas
        (the cluster engine's G-kernels-to-1 collapse)."""
        from kmergma_tpu.ops.scan import _pair_ab_xla, rolling_kmer_codes_jnp
        from kmergma_tpu.ops.scan_pallas import codes_pair_roll_multi

        rng = np.random.default_rng(13)
        n, k, depth = 2000, 5, 16
        ws_tuple = (90, 97, 101)
        codes = rng.integers(0, 4, n, dtype=np.int8)
        kc_ref = np.asarray(rolling_kmer_codes_jnp(jnp.asarray(codes), k))
        nt = n - max(ws_tuple) - 100
        nkc = n - k + 1
        ab, kc = codes_pair_roll_multi(
            jnp.asarray(codes), k, ws_tuple, nt, nkc, depth,
            tile_windows=128, rows=8, interpret=True,
        )
        assert np.asarray(kc).tolist() == kc_ref[:nkc].tolist()
        for g, ws in enumerate(ws_tuple):
            w = ws - k + 1
            want = np.asarray(_pair_ab_xla(jnp.asarray(kc_ref), w, nt, depth))
            assert np.asarray(ab[g]).tolist() == want.tolist(), f"group {g} (ws={ws})"

    def test_codes_pair_multi_matches_roll_multi(self):
        """The static-unroll multi-ws kernel is bit-identical to the roll
        variant (and hence to the XLA oracle) on every group."""
        from kmergma_tpu.ops.scan_pallas import codes_pair_multi, codes_pair_roll_multi

        rng = np.random.default_rng(29)
        n, k, depth = 2000, 5, 16
        ws_tuple = (90, 97, 101)
        codes = rng.integers(0, 4, n, dtype=np.int8)
        nt = n - max(ws_tuple) - 100
        nkc = n - k + 1
        ab_r, kc_r = codes_pair_roll_multi(
            jnp.asarray(codes), k, ws_tuple, nt, nkc, depth,
            tile_windows=128, rows=8, interpret=True,
        )
        ab_u, kc_u = codes_pair_multi(
            jnp.asarray(codes), k, ws_tuple, nt, nkc, depth,
            tile_windows=128, rows=8, interpret=True,
        )
        assert np.asarray(kc_u).tolist() == np.asarray(kc_r).tolist()
        assert np.asarray(ab_u).tolist() == np.asarray(ab_r).tolist()

    def test_cluster_engine_unroll_kernel_stream_equality(self):
        """ClusterScanEngine(pair_kernel='unroll') produces the same streams
        as the default roll kernel wiring (use_pallas=True, interpret)."""
        from kmergma_tpu.ops.reference import cluster_ref_api, eliminate_null_params, gen_ref_ws_cons
        from kmergma_tpu.ops.scan_cluster import ClusterScanEngine

        here = os.path.dirname(os.path.abspath(__file__))
        ref = os.path.join(here, "data", "Alp_V_ref.fasta")
        clusters = eliminate_null_params(cluster_ref_api(ref, 6, cutoffs=[7, 12, 20, 25]))
        profiles = clusters.profiles
        thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][: len(profiles)]
        rng = np.random.default_rng(5)
        codes = rng.integers(0, 4, 4000, dtype=np.int8)
        a = ClusterScanEngine(profiles, k=6, use_pallas=True, chunk_windows=1024)
        b = ClusterScanEngine(profiles, k=6, use_pallas=True, chunk_windows=1024, pair_kernel="unroll")
        sa = a.record_streams(codes, thrs)
        sb = b.record_streams(codes, thrs)
        assert sa == sb

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_scan_rows_d_matches_per_row_oracle(self, use_pallas):
        """The batched region recompute (_scan_rows_d - the hit-dense hot
        path) equals the brute-force oracle on every row, for both the XLA
        and Pallas (interpret) paths."""
        from kmergma_tpu.ops.scan import _scan_rows_d

        rng = np.random.default_rng(21)
        k, ws, r, rspan, n_rows = 5, 101, 9, 256, 5
        s = rng.integers(0, 12, 4**k).astype(np.int32)
        rows = rng.integers(0, 4, (n_rows, rspan + ws - 1), dtype=np.int8)
        got = np.asarray(
            jax.jit(_scan_rows_d, static_argnums=(2, 3, 4, 5))(
                jnp.asarray(rows), jnp.asarray(s), k, ws, r, use_pallas
            )
        )
        for i in range(n_rows):
            want = scan_window_distances_np(rows[i], s, k, ws, r)
            assert got[i].tolist() == want.tolist(), f"row {i}"

    @pytest.mark.parametrize("depth", [1, 16, None])
    def test_engine_bound_path_stream_exact(self, depth):
        from kmergma_tpu.ops.scan import ScanEngine

        rng = np.random.default_rng(3)
        n, k, ws, r = 6000, 6, 289, 12
        codes = rng.integers(0, 4, n, dtype=np.int8)
        s = rng.integers(0, 10, 4**k).astype(np.int32)
        d_full = scan_window_distances_np(codes, s, k, ws, r) / (2.0 * k * r * r)
        thr = float(np.percentile(d_full, 5))

        exact = ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=1024, bound_depth=None)
        bound = ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=1024, bound_depth=depth)
        d0_e, stream_e, _ = exact.record_stream(codes, thr)
        d0_b, stream_b, _ = bound.record_stream(codes, thr)
        assert d0_e == d0_b == d_full[0]
        assert stream_e == stream_b
        assert len(stream_e) > 0


def test_exact_mode_pallas_stream_matches_xla():
    """ScanEngine(bound_depth=None, use_pallas=True): the exact-mode span
    pass rides the full-depth roll kernel - streams must equal the XLA
    exact path bit-for-bit (this is the strobe engine's default pass)."""
    from kmergma_tpu.ops.scan import ScanEngine

    rng = np.random.default_rng(17)
    k, ws, r = 4, 40, 7
    s = rng.integers(0, 40, 4**k).astype(np.int64)
    codes = rng.integers(0, 4, 6000, dtype=np.int8)
    thr = 2.2
    a = ScanEngine(s, k=k, ws=ws, r=r, use_pallas=False, bound_depth=None, chunk_windows=1024)
    b = ScanEngine(s, k=k, ws=ws, r=r, use_pallas=True, bound_depth=None, chunk_windows=1024)
    sa = a.record_stream(codes, thr)
    sb = b.record_stream(codes, thr)
    assert sa[0] == sb[0] and sa[1] == sb[1]

    # the strobe-engine shape: k=1 over a wide code alphabet
    s1 = rng.integers(0, 90, 256).astype(np.int64)
    wide = rng.integers(0, 256, 5000).astype(np.int32)
    a1 = ScanEngine(s1, k=1, ws=60, r=9, use_pallas=False, bound_depth=None, chunk_windows=1024)
    b1 = ScanEngine(s1, k=1, ws=60, r=9, use_pallas=True, bound_depth=None, chunk_windows=1024)
    a1.pack_codes = b1.pack_codes = False
    ta = a1.record_stream(wide, 3.0)
    tb = b1.record_stream(wide, 3.0)
    assert ta[0] == tb[0] and ta[1] == tb[1]
