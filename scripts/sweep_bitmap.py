"""Batched TPU sweep: bitmap-pass variants x bound depths x workloads.

One process (one TPU client), everything timed back to back:

  * end-to-end hit-dense record_stream+replay at each depth (the bench's
    hit_dense_mbps number) - lower depths widen the candidate skirts;
  * split (production codes_pair kernel + XLA lookup/cumsum) at each depth;
  * fused (codes->bitmap Mosaic kernel) lookup variants, with bitmap
    equality asserted against split.  Each fused variant is fail-tolerant:
    the wide take_along_axis "gather" lookup hits Mosaic's one-source-vreg
    dynamic_gather limit on v5e (recorded, not fatal).

Env knobs: BENCH_MBP (genome size, default 64), SWEEP_DEPTHS (default
8,16,32), SWEEP_LOOKUPS (default mxu,gather), SWEEP_E2E=0 (skip the
e2e dense section), SWEEP_KERNELS=0 (skip split/fused timings).
"""

import os
import sys
import time

import numpy as np

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from kmergma_tpu.models.state_machine import replay_single  # noqa: E402
from kmergma_tpu.ops import scan as S  # noqa: E402
from kmergma_tpu.ops.reference import gen_ref_ws_cons  # noqa: E402
from kmergma_tpu.ops.scan_fused import ROWS as FROWS, fused_record_bitmaps  # noqa: E402
from kmergma_tpu.utils.fasta import as_records  # noqa: E402

from bench import _device_random_genome, _plant_genes_device  # noqa: E402

ref_path = os.path.join(here, "tests/data/Alp_V_ref.fasta")
profile = gen_ref_ws_cons(ref_path, 6)
k, ws, r = profile.k, profile.windowsize, profile.n_records
thr = 30.0
n_bp = int(float(os.environ.get("BENCH_MBP", "64")) * 1e6)
nw = n_bp - ws + 1
DEPTHS = [int(d) for d in os.environ.get("SWEEP_DEPTHS", "8,16,32").split(",")]
LOOKUPS = os.environ.get("SWEEP_LOOKUPS", "mxu,gather").split(",")

eng = S.ScanEngine(profile.sum_kfv, k=k, ws=ws, r=r, use_fused=True)
thr_int = int(eng._thr_int(thr))
thr_dev = jnp.asarray(np.asarray([thr_int], dtype=np.int32))
refs = as_records(ref_path)

prep_rand = _device_random_genome(eng, n_bp, seed=42, max_ws=ws + 1)
_ = np.asarray(prep_rand.dev[:4])
prep_dense = _device_random_genome(eng, n_bp, seed=7, max_ws=ws + 1)
prep_dense, planted = _plant_genes_device(prep_dense, refs, n_bp, spacing=500_000)
_ = np.asarray(prep_dense.dev[:4])
print(f"{n_bp/1e6:.0f} Mbp, dense has {planted} planted genes", flush=True)

t = 8192
w = ws - k + 1
n_tiles = -(-(-(-nw // t)) // FROWS) * FROWS


def timeit(fn, label, n=3):
    out = fn()
    _ = np.asarray(out.ravel()[:4])
    best = float("inf")
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out.ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:7.1f} ms ({n_bp/best/1e6:5.0f} Mbp/s)", flush=True)
    return out, best


# --- end-to-end hit-dense at each depth (engine incl. regions + replay) ---
if os.environ.get("SWEEP_E2E", "1") == "1":
    print("--- end-to-end hit-dense record_stream+replay", flush=True)
    codes_shape = np.zeros(n_bp, dtype=np.int8)
    for depth in DEPTHS:
        e = S.ScanEngine(profile.sum_kfv, k=k, ws=ws, r=r, bound_depth=depth)

        def full(e=e):
            d0, st, _ = e.record_stream(codes_shape, thr, codes_dev=prep_dense)
            return replay_single(st, d0, thr, k, ws, n_bp, 50), len(st)

        hits, n_cand = full()  # warmup compiles
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            hits, n_cand = full()
            best = min(best, time.perf_counter() - t0)
        print(
            f"e2e dense d={depth:2d}: {best*1e3:7.1f} ms ({n_bp/best/1e6:5.0f} Mbp/s) "
            f"{n_cand} candidates -> {len(hits)} hits", flush=True,
        )

# --- kernel-level: split + fused variants per depth ---
if os.environ.get("SWEEP_KERNELS", "1") == "1":
    for wl_name, prep in (("random", prep_rand), ("dense", prep_dense)):
        print(f"--- workload {wl_name}", flush=True)
        for depth in DEPTHS:
            split, _ = timeit(
                lambda d=depth: S._scan_record_bitmaps(
                    prep.dev, eng._nv(nw), eng.s_dev, thr_dev, k=k, ws=ws, r=r,
                    span=eng.chunk, block=eng.block, n_spans=prep.n_spans,
                    use_pallas=True, depth=d,
                ),
                f"{wl_name} split d={depth:2d}        ",
            )
            split_bits = np.asarray(split).reshape(-1)[: nw // eng.block]
            l0 = S._first_window_l0(prep.dev, eng.s_dev, k=k, ws=ws, r=r, depth=depth)
            meta = jnp.stack([jnp.int32(thr_int), l0.astype(jnp.int32), jnp.int32(nw)])
            tiles = [int(x) for x in os.environ.get("SWEEP_TILES", "8192").split(",")]
            for lookup in LOOKUPS:
                for tt in tiles:
                    ntt = -(-(-(-nw // tt)) // FROWS) * FROWS
                    w_ = ws - k + 1
                    hw_ = -(-(w_ + 1) // 128) * 128 + 128
                    if prep.dev.shape[0] < ntt * tt + tt + hw_:
                        print(f"    t={tt}: prep too small, skipped", flush=True)
                        continue
                    try:
                        out, _ = timeit(
                            lambda lk=lookup, d=depth, tt=tt, ntt=ntt: fused_record_bitmaps(
                                prep.dev, eng.s_dev, meta, k=k, ws=ws, r=r, depth=d,
                                t=tt, block=eng.block, n_tiles=ntt, lookup=lk,
                            ),
                            f"{wl_name} fused d={depth:2d} {lookup:6s} t={tt}",
                        )
                    except Exception as e:  # Mosaic compile errors recorded, not fatal
                        print(f"{wl_name} fused d={depth:2d} {lookup:6s} t={tt}: FAILED "
                              f"{type(e).__name__}: {str(e).splitlines()[0][:120]}", flush=True)
                        continue
                    bits = np.asarray(out).reshape(-1)[: nw // eng.block]
                    ok = bits.astype(bool).tolist() == split_bits.astype(bool).tolist()
                    print(f"    fused[{lookup} t={tt}] == split: {ok}", flush=True)
                    assert ok
