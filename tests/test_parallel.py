"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md section 4: shard-merge logic tested without a pod)."""

import numpy as np
import pytest

import jax

from kmergma_tpu.ops.reference import gen_ref_ws_cons
from kmergma_tpu.ops.scan import ScanEngine
from kmergma_tpu.parallel.mesh import make_mesh
from kmergma_tpu.parallel.sharded_scan import ShardedScanEngine


def test_mesh_shapes():
    m = make_mesh(8, n_clusters=2)
    assert m.shape["clusters"] == 2 and m.shape["data"] == 4
    m = make_mesh(8)
    assert m.shape["clusters"] == 1 and m.shape["data"] == 8


def test_sharded_stream_equals_single_device():
    rng = np.random.default_rng(11)
    n, k, ws, r = 40000, 6, 289, 12
    codes = rng.integers(0, 4, n, dtype=np.int8)
    s = rng.integers(0, 10, 4**k).astype(np.int32)

    single = ScanEngine(s, k=k, ws=ws, r=r, chunk_windows=4096)
    thr_probe, stream_probe, _ = single.record_stream(codes, thr=1e9)
    # pick a threshold that creates runs crossing tile boundaries
    vals = np.array([v for _, v in stream_probe])
    thr = float(np.percentile(vals, 4))

    d0_a, stream_a, _ = single.record_stream(codes, thr)
    sharded = ShardedScanEngine(s, k=k, ws=ws, r=r, mesh=make_mesh(8), tile_windows=2048)
    d0_b, stream_b, _ = sharded.record_stream(codes, thr)

    assert d0_a == d0_b
    # below-threshold entries must agree exactly (values feed hit records);
    # rising edges must agree on position (edge values are free to be any
    # stand-in >= thr - see ops.scan._scan_regions_compact)
    below_a = sorted((j, v) for j, v in set(stream_a) if v < thr)
    below_b = sorted((j, v) for j, v in set(stream_b) if v < thr)
    assert below_a == below_b
    edges_a = sorted(j for j, v in set(stream_a) if v >= thr)
    edges_b = sorted(j for j, v in set(stream_b) if v >= thr)
    assert edges_a == edges_b

    from kmergma_tpu.models.state_machine import replay_single

    hits_a = replay_single(stream_a, d0_a, thr, k, ws, n, buff=10)
    hits_b = replay_single(stream_b, d0_b, thr, k, ws, n, buff=10)
    assert hits_a == hits_b


def test_sharded_miner_golden(ref_fasta, test_genome):
    """The sharded engine must reproduce the golden hit set bit-for-bit."""
    from kmergma_tpu.models.miner import mine_genome

    profile = gen_ref_ws_cons(ref_fasta, 6)
    engine = ShardedScanEngine(
        profile.sum_kfv, k=6, ws=profile.windowsize, r=profile.n_records,
        mesh=make_mesh(8), tile_windows=8192,
    )
    res = mine_genome(test_genome, profile, thr=30, do_align=True, get_hit_loci=True, engine=engine)
    assert res.hit_loci == [8543, 20425, 221912, 234018, 450875, 467930, 477868]


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4096,)
