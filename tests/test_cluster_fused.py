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
