"""Reduced stream assembly (ops/scan.py _run_reduce machinery).

The reduced path fetches per-run (min, first-argmin) + edge values instead
of every region distance; the resulting MINIMAL stream must replay to
bit-identical hits (models/state_machine.py consumes nothing else).  These
tests pin reduced-vs-full replay equality, the exact integer threshold,
the run extraction, and the borderline fallback guard.
"""

import numpy as np
import pytest

from kmergma_tpu.models.state_machine import replay_single
from kmergma_tpu.ops.kmers import kmer_count
from kmergma_tpu.ops.scan import ScanEngine, _extract_runs


def _engine_and_codes(seed: int, n: int = 60_000, k: int = 5, ws: int = 120, r: int = 3):
    rng = np.random.default_rng(seed)
    s = np.zeros(4**k, dtype=np.int64)
    refs = [rng.integers(0, 4, ws, dtype=np.int8) for _ in range(r)]
    for ref in refs:
        s += kmer_count(ref, k).astype(np.int64)
    codes = rng.integers(0, 4, n, dtype=np.int8)
    # plant mutated copies so below-runs and rising edges exist
    for pos in range(2000, n - ws - 100, 7000):
        mutant = refs[pos % r].copy()
        nmut = rng.integers(0, ws // 4)
        idx = rng.integers(0, ws, nmut)
        mutant[idx] = rng.integers(0, 4, nmut)
        codes[pos : pos + ws] = mutant
    eng = ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=1 << 13)
    eng.full_fetch_windows = 0  # always exercise the reduced machinery
    return eng, codes


@pytest.mark.parametrize("seed,thr", [(0, 13.5), (1, 14.0), (2, 12.0), (3, 13.0)])
def test_reduced_replay_matches_full(seed, thr):
    eng, codes = _engine_and_codes(seed)
    n = codes.shape[0]
    eng.assemble_mode = "full"
    d0_f, stream_f, _ = eng.record_stream(codes, thr)
    eng.assemble_mode = "reduced"
    d0_r, stream_r, _ = eng.record_stream(codes, thr)
    assert d0_r == d0_f
    hits_f = replay_single(stream_f, d0_f, thr, eng.k, eng.ws, n, 50)
    hits_r = replay_single(stream_r, d0_r, thr, eng.k, eng.ws, n, 50)
    assert hits_r == hits_f
    assert len(hits_f) > 0  # the fixture must actually produce hits
    # the reduced stream is a (proper, for dense runs) subset workload
    assert len(stream_r) <= len(stream_f)


def test_thr_exact_is_the_float64_cutoff():
    eng, _ = _engine_and_codes(0)
    for thr in [18.0, 14.25, 21.0, 0.0, 1e-9, 33.333333333]:
        t = int(eng._thr_exact(thr))
        for d in range(max(t - 3, 0), t + 3):
            assert (np.float64(d) / eng.scale < thr) == (d < t), (thr, d, t)


def test_borderline_fallback_path():
    # force the conservative (non-exact) borderline interval so the
    # summarized pass reports borderline windows and the engine falls back
    # to the full fetch - results must stay identical
    eng, codes = _engine_and_codes(1)
    n = codes.shape[0]
    thr = 14.0
    d0_f, stream_f, _ = eng.record_stream(codes, thr)

    eng2, _ = _engine_and_codes(1)
    eng2._thr_exact = lambda t: eng2._thr_int(t)  # conservative: borderline > 0
    d0_b, stream_b, _ = eng2.record_stream(codes, thr)
    assert d0_b == d0_f
    hits_f = replay_single(stream_f, d0_f, thr, eng.k, eng.ws, n, 50)
    hits_b = replay_single(stream_b, d0_b, thr, eng.k, eng.ws, n, 50)
    assert hits_b == hits_f


def test_extract_runs_semantics():
    rspan = 8
    # regions at windows [0,8) and [8,16) (adjacent) and [32,40) (gap)
    starts = [0, 8, 32]
    bits = np.zeros(3 * rspan, dtype=bool)
    bits[0] = True  # window 0: must be masked (dist0, not in the stream)
    bits[5:11] = True  # run crossing the adjacent region boundary: 5..10
    bits[14:16] = True  # run at covered-extent end 14..15: edge would be 16,
    # which IS covered only if region 2 were adjacent - it is not -> no edge
    bits[17] = True  # region 2 col 1 = window 33
    run_lo, run_hi, edge = _extract_runs(bits, starts, rspan, max_index=10**9)
    assert run_lo.tolist() == [5, 14, 17]
    assert run_hi.tolist() == [10, 15, 17]
    assert edge.tolist() == [11, -1, 18]

    # max_index truncation: cut the first run at global window 8
    run_lo, run_hi, edge = _extract_runs(bits, starts, rspan, max_index=8)
    assert run_lo.tolist() == [5]
    assert run_hi.tolist() == [8]
    assert edge.tolist() == [-1]  # edge at 9 > max_index


def test_cluster_reduced_matches_full_replay():
    """Cluster-mode reduced assembly (batched per-cluster run reductions,
    imax truncation) must replay bit-identically to full-fetch mode on a
    synthetic dense record."""
    from kmergma_tpu.models.state_machine import OmnHitEvent, replay_omn
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine

    rng = np.random.default_rng(9)
    k = 5
    n = 50_000

    class P:
        def __init__(self, ws, r, seed):
            g = np.random.default_rng(seed)
            self.windowsize = ws
            self.n_records = r
            self.sum_kfv = np.zeros(4**k, dtype=np.int64)
            self.refs = [g.integers(0, 4, ws, dtype=np.int8) for _ in range(r)]
            for ref in self.refs:
                self.sum_kfv += kmer_count(ref, k).astype(np.int64)

    profiles = [P(120, 3, 1), P(122, 2, 2), P(121, 4, 3)]
    codes = rng.integers(0, 4, n, dtype=np.int8)
    for pos in range(3_000, n - 200, 6_000):
        src = profiles[pos % 3]
        mutant = src.refs[pos % src.n_records].copy()
        idx = rng.integers(0, src.windowsize, 20)
        mutant[idx] = rng.integers(0, 4, 20)
        codes[pos : pos + src.windowsize] = mutant
    thrs = [14.0, 13.5, 14.5]

    def events(mode):
        eng = ClusterScanEngine(profiles, k=k, chunk_windows=1 << 12)
        eng.engines[0].assemble_mode = mode
        eng.engines[0].full_fetch_windows = 0
        pairs = eng.record_streams(codes, thrs)
        got = []
        replay_omn(
            [p[1] for p in pairs], [p[0] for p in pairs], thrs, k,
            [p.windowsize for p in profiles], n,
            lambda ev: got.append((ev.cluster, ev.cmi, ev.dist, ev.edge_dist)) or True,
        )
        return got

    full = events("full")
    reduced = events("reduced")
    assert reduced == full
    assert len(full) > 0


@pytest.mark.parametrize("seed", range(8))
def test_device_run_reduce_matches_host_trio(seed):
    """_device_run_reduce (the fused in-dispatch run reduction) must agree
    with the host _extract_runs + _run_pieces + piece-reduce pipeline on
    random below patterns over random region geometries - including runs
    crossing adjacent regions, runs cut at max_index, multi-piece (>512
    window) runs, and edge-at-coverage-end cases."""
    import jax.numpy as jnp

    from kmergma_tpu.ops.scan import (
        _RUN_BUCKET,
        _combine_pieces,
        _device_run_reduce,
        _extract_runs as _er,
        _run_pieces,
    )

    rng = np.random.default_rng(40 + seed)
    rspan = 64
    n_regions = 12
    n_valid = int(rng.integers(3, n_regions + 1))
    # random ascending grid starts with a mix of adjacent and gapped regions
    starts = np.zeros(n_regions, dtype=np.int32)
    pos = 0
    for j in range(1, n_valid):
        pos += rspan * int(rng.choice([1, 1, 1, 2, 3]))  # mostly adjacent
        starts[j] = pos
    mi = int(rng.integers(rspan, starts[n_valid - 1] + rspan + 10))

    below = np.zeros((n_regions, rspan), dtype=bool)
    # random below probability per region creates long AND short runs
    for j in range(n_valid):
        p = float(rng.uniform(0.05, 0.95))
        below[j] = rng.random(rspan) < p
    d = rng.integers(1, 1000, (n_regions, rspan)).astype(np.int32)

    # --- host oracle ---
    bits = below[:n_valid].reshape(-1)
    run_lo, run_hi, edge_flat = _er(bits, starts[:n_valid].tolist(), rspan, mi)
    dfl = d[:n_valid].reshape(-1).astype(np.int64)
    sa = starts[:n_valid].astype(np.int64)

    def flat_to_win(f):
        return sa[f // rspan] + f % rspan

    entries = []
    if len(run_lo):
        run_ids, p_start, p_len = _run_pieces(run_lo, run_hi, _RUN_BUCKET)
        mins = np.array([dfl[s : s + l].min() for s, l in zip(p_start, p_len)])
        args = np.array([int(np.argmin(dfl[s : s + l])) for s, l in zip(p_start, p_len)])
        run_min, arg_flat = _combine_pieces(run_ids, p_start, mins, args, len(run_lo))
        for j in range(len(run_lo)):
            entries.append((int(flat_to_win(arg_flat[j])), int(run_min[j])))
        for j in range(len(run_lo)):
            if edge_flat[j] >= 0:
                entries.append((int(flat_to_win(edge_flat[j])), int(dfl[edge_flat[j]])))
    entries.sort(key=lambda t: t[0])

    # --- device path (CPU) ---
    # mask below like the planned dispatch does (padded slots zeroed)
    below_dev = below.copy()
    below_dev[n_valid:] = False
    red = np.asarray(
        _device_run_reduce(
            jnp.asarray(d), jnp.asarray(below_dev), jnp.asarray(starts),
            rspan, jnp.int32(mi), run_bucket=64,
        )
    )

    class E:
        scale = 1.0

    from kmergma_tpu.ops.scan import ScanEngine

    got = ScanEngine._stream_from_device_reduce(E(), red, 0.0, run_bucket=64)
    if got is None:
        # slot overflow: legitimate for very fragmented seeds - verify the
        # count really exceeds the bucket, then skip
        assert int(red[0]) > 64
        return
    got_int = [(int(i), int(v)) for i, v in got]
    assert got_int == entries, (seed, n_valid, mi)
