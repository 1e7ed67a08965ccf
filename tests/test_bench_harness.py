"""Pins for the benchmark harness's device-side genome generator.

bench.py generates synthetic genomes ON DEVICE (nothing crosses the H2D
link); on TPU that runs as a Mosaic kernel (XLA's version took ~20 min to
compile through the remote relay).  The two implementations must stay
bit-identical so benchmark genomes are reproducible across backends.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hash_codes_np(pos, seed):
    with np.errstate(over="ignore"):
        x = pos * np.uint32(0x9E3779B9) + np.uint32(seed)
        x = (x ^ (x >> np.uint32(16))) * np.uint32(0x85EBCA6B)
        x = (x ^ (x >> np.uint32(13))) * np.uint32(0xC2B2AE35)
        return ((x >> np.uint32(7)) & 3).astype(np.int8)


def test_pallas_gen_matches_xla_hash():
    from bench import _pallas_hash_genome

    total = (1 << 20) + 12345  # partial last grid step + final slice
    for seed in (42, 7, 11):
        got = np.asarray(_pallas_hash_genome(total, seed, interpret=True))
        want = _hash_codes_np(np.arange(total, dtype=np.uint32), seed)
        assert got.shape == want.shape
        assert (got == want).all()


def test_device_random_genome_content():
    import jax.numpy as jnp

    from bench import _device_random_genome
    from kmergma_tpu.ops.reference import gen_ref_ws_cons
    from kmergma_tpu.ops.scan import ScanEngine

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    profile = gen_ref_ws_cons(os.path.join(here, "tests/data/Alp_V_ref.fasta"), 6)
    eng = ScanEngine(profile.sum_kfv, k=profile.k, ws=profile.windowsize, r=profile.n_records)
    prep = _device_random_genome(eng, 100_000, seed=42, max_ws=profile.windowsize + 1)
    codes = np.asarray(prep.dev)
    assert codes.dtype == np.int8
    want = _hash_codes_np(np.arange(codes.shape[0], dtype=np.uint32), 42)
    assert (codes == want).all()
    assert set(np.unique(codes)) <= {0, 1, 2, 3}
