"""Bit-equality pins for the fused multi-cluster kernel
(ops/scan_cluster_fused.py) against the split cluster pass and the
engine-level stream contract (interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from kmergma_tpu.ops.reference import cluster_ref_api, eliminate_null_params, gen_ref_ws_cons

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.path.join(HERE, "data", "Alp_V_ref.fasta")


@pytest.fixture(scope="module")
def clusters():
    return eliminate_null_params(cluster_ref_api(REF, 6, cutoffs=[7, 12, 20, 25]))


def test_fused_cluster_bitmaps_match_split(clusters):
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine, _cluster_record_bitmaps
    from kmergma_tpu.ops.scan_cluster_fused import fused_cluster_record_bitmaps
    from kmergma_tpu.ops.scan import _first_window_l0

    rng = np.random.default_rng(11)
    n = 6000
    codes = rng.integers(0, 4, n, dtype=np.int8)
    # plant one real gene so some blocks flag active
    ref0 = gen_ref_ws_cons(REF, 6)
    from kmergma_tpu.utils.fasta import as_records

    g = as_records(REF)[0].codes
    codes[2500 : 2500 + len(g)] = g

    eng = ClusterScanEngine(clusters.profiles, k=6, use_pallas=True, chunk_windows=2048)
    thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][: len(eng.engines)]
    n_valids = np.array([n - e.ws + 1 for e in eng.engines], dtype=np.int32)
    thr_ints = np.array([e._thr_int(t) for e, t in zip(eng.engines, thrs)], dtype=np.int32)
    prep = eng.engines[0].prepare_codes(codes, max_ws=eng.max_ws, fused_ws=eng.max_ws)

    split = np.asarray(
        _cluster_record_bitmaps(
            prep.dev, jnp.asarray(n_valids), eng.s_stack, jnp.asarray(thr_ints),
            k=6, span=eng.chunk, block=eng.block, n_spans=prep.n_spans,
            use_pallas=True, groups=eng.groups,
        )
    )  # (n_spans, m, blocks)

    t, block = 512, eng.block
    depth = eng.groups[0][1]
    from kmergma_tpu.ops.scan_fused import ROWS

    nw_max = int(n_valids.max())
    n_tiles = -(-(-(-nw_max // t)) // ROWS) * ROWS
    l0s = jnp.stack(
        [
            _first_window_l0(prep.dev, e.s_dev, k=6, ws=e.ws, r=e.r, depth=depth)
            for e in eng.engines
        ]
    )
    meta = jnp.concatenate(
        [jnp.asarray(np.concatenate([n_valids, thr_ints]).astype(np.int32)), l0s.astype(jnp.int32)]
    )
    specs = tuple((e.ws - 6 + 1, e.r) for e in eng.engines)
    m = len(eng.engines)
    split_by_c = np.transpose(split, (1, 0, 2)).reshape(m, -1)
    n_blocks = -(-nw_max // block)
    for lookup_dtype in ("f32", "bf16", "f32pack"):
        fused = np.asarray(
            fused_cluster_record_bitmaps(
                prep.dev, eng.s_stack, meta, k=6, specs=specs, depth=depth,
                t=t, block=block, n_tiles=n_tiles, interpret=True,
                lookup_dtype=lookup_dtype,
            )
        )
        fused_by_c = fused.reshape(fused.shape[0], m, t // block).transpose(1, 0, 2).reshape(m, -1)
        for c in range(m):
            got = fused_by_c[c, :n_blocks].astype(bool)
            want = split_by_c[c, :n_blocks].astype(bool)
            assert got.tolist() == want.tolist(), f"cluster {c} ({lookup_dtype})"


def test_cluster_engine_fused_stream_equality(clusters):
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine

    rng = np.random.default_rng(3)
    n = 9000
    codes = rng.integers(0, 4, n, dtype=np.int8)
    from kmergma_tpu.utils.fasta import as_records

    g = as_records(REF)[1].codes
    codes[4000 : 4000 + len(g)] = g
    thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][: len(clusters.profiles)]

    base = ClusterScanEngine(clusters.profiles, k=6, use_pallas=True, chunk_windows=2048)
    fused = ClusterScanEngine(
        clusters.profiles, k=6, use_pallas=True, chunk_windows=2048, use_fused=True
    )
    fused.fused_min_windows = 1  # exercise the fused path on a small record
    sa = base.record_streams(codes, thrs)
    sb = fused.record_streams(codes, thrs)
    assert sa == sb


def _planted_codes(seed, n, plant_at):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n, dtype=np.int8)
    from kmergma_tpu.utils.fasta import as_records

    recs = as_records(REF)
    for i, pos in enumerate(plant_at):
        g = recs[i % len(recs)].codes
        codes[pos : pos + len(g)] = g
    return codes


def test_cluster_engine_planned_matches_host_planned(clusters):
    """The one-dispatch device-planned path (fused kernel + on-device
    region plan + summarized recompute) must produce streams bit-identical
    to the host-planned fused path and the split base path."""
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine

    codes = _planted_codes(21, 12_000, (2_000, 6_500, 9_000))
    thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][: len(clusters.profiles)]

    base = ClusterScanEngine(clusters.profiles, k=6, use_pallas=True, chunk_windows=2048)
    hostp = ClusterScanEngine(
        clusters.profiles, k=6, use_pallas=True, chunk_windows=2048, use_fused=True
    )
    hostp.fused_min_windows = 1
    hostp.device_plan = False
    planned = ClusterScanEngine(
        clusters.profiles, k=6, use_pallas=True, chunk_windows=2048, use_fused=True
    )
    planned.fused_min_windows = 1
    assert planned.device_plan  # default on

    sa = base.record_streams(codes, thrs)
    sb = hostp.record_streams(codes, thrs)
    sc = planned.record_streams(codes, thrs)
    assert sb == sa
    assert sc == sa
    assert any(len(s) > 0 for _, s in sa)  # fixture produces candidates


def test_cluster_planned_overflow_falls_back_and_grows(clusters):
    """A record denser than the region bucket must fall back to the
    host-planned path (identical streams) and double the bucket."""
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine

    codes = _planted_codes(22, 12_000, (1_500, 4_000, 6_500, 9_000))
    thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][: len(clusters.profiles)]

    base = ClusterScanEngine(clusters.profiles, k=6, use_pallas=True, chunk_windows=2048)
    planned = ClusterScanEngine(
        clusters.profiles, k=6, use_pallas=True, chunk_windows=2048, use_fused=True
    )
    planned.fused_min_windows = 1
    planned.plan_regions = 2  # force overflow
    planned.plan_regions_max = 8
    sa = base.record_streams(codes, thrs)
    sc = planned.record_streams(codes, thrs)
    assert sc == sa
    # direct-jump growth: lands on the tier that fits (or maxes out)
    assert planned.plan_regions > 2


def test_cluster_planned_reduced_matches_host_reduced(clusters):
    """With the full-fetch cutover disabled, the device-planned REDUCED
    path (run reductions over grid-aligned regions) must produce the same
    minimal streams as the host-planned reduced path (run-aligned
    regions): runs are a property of the below set, not of the region
    geometry."""
    from kmergma_tpu.models.state_machine import replay_omn
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine

    codes = _planted_codes(23, 11_000, (3_000, 7_500))
    thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][: len(clusters.profiles)]

    base = ClusterScanEngine(clusters.profiles, k=6, use_pallas=True, chunk_windows=2048)
    hostp = ClusterScanEngine(
        clusters.profiles, k=6, use_pallas=True, chunk_windows=2048, use_fused=True
    )
    hostp.fused_min_windows = 1
    hostp.device_plan = False
    planned = ClusterScanEngine(
        clusters.profiles, k=6, use_pallas=True, chunk_windows=2048, use_fused=True
    )
    planned.fused_min_windows = 1
    for e in (hostp, planned):
        e.engines[0].full_fetch_windows = 0  # force the reduced machinery
    sb = hostp.record_streams(codes, thrs)
    sc = planned.record_streams(codes, thrs)
    assert sc == sb
    assert any(len(s) > 0 for _, s in sc)

    # and the minimal streams replay to the same hit events as the full
    # streams of the split base engine
    sa = base.record_streams(codes, thrs)
    n = codes.shape[0]
    wss = [e.ws for e in base.engines]

    def events(pairs):
        got = []
        replay_omn(
            [p[1] for p in pairs], [p[0] for p in pairs], thrs, 6, wss, n,
            lambda ev: got.append((ev.cluster, ev.cmi, ev.dist, ev.edge_dist)) or True,
        )
        return got

    assert events(sc) == events(sa)
    assert len(events(sa)) > 0


def test_cluster_planned_candidate_free_record(clusters):
    """A candidate-free record through the planned path: dist0s ride the
    blob, no run-reduce round trip, empty streams."""
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine

    rng = np.random.default_rng(24)
    codes = rng.integers(0, 4, 10_000, dtype=np.int8)
    thrs = [1.0] * len(clusters.profiles)  # nothing scores below this

    base = ClusterScanEngine(clusters.profiles, k=6, use_pallas=True, chunk_windows=2048)
    planned = ClusterScanEngine(
        clusters.profiles, k=6, use_pallas=True, chunk_windows=2048, use_fused=True
    )
    planned.fused_min_windows = 1
    sa = base.record_streams(codes, thrs)
    sc = planned.record_streams(codes, thrs)
    assert sc == sa
    assert all(s == [] for _, s in sc)
