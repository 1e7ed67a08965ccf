"""Stage-by-stage timing of the HIT-DENSE scan path on the real TPU.

Decomposes bench.py's hit_dense workload (64 Mbp, 128 planted V genes):
bitmap pass, region planning, region dispatch+compute, compact fetch,
host stream assembly, and the state-machine replay - the candidate
machinery that VERDICT r2 flags as the gap to the >=400 Mbp/s target.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from kmergma_tpu.ops.reference import gen_ref_ws_cons
from kmergma_tpu.ops import scan as S
from kmergma_tpu.models.state_machine import replay_single
from kmergma_tpu.utils.fasta import as_records

sys.path.insert(0, here)
from bench import _device_random_genome, _plant_genes_device

ref_path = os.path.join(here, "tests/data/Alp_V_ref.fasta")
profile = gen_ref_ws_cons(ref_path, 6)
k, ws, r = profile.k, profile.windowsize, profile.n_records
thr = 30.0

dense_bp = int(float(os.environ.get("BENCH_DENSE_MBP", "64")) * 1e6)
eng_kwargs = {}
if os.environ.get("BENCH_CHUNK"):
    eng_kwargs["chunk_windows"] = int(os.environ["BENCH_CHUNK"])
if os.environ.get("BENCH_RSPAN"):
    eng_kwargs_rspan = int(os.environ["BENCH_RSPAN"])
else:
    eng_kwargs_rspan = None
eng = S.ScanEngine(profile.sum_kfv, k=k, ws=ws, r=r, **eng_kwargs)
if eng_kwargs_rspan:
    eng.rspan = eng_kwargs_rspan
print(f"chunk={eng.chunk} rspan={eng.rspan} block={eng.block} "
      f"use_pallas={eng.use_pallas} fused={eng.use_fused} backend={jax.default_backend()}")

refs = as_records(ref_path)
prep = _device_random_genome(eng, dense_bp, seed=7, max_ws=ws + 1)
prep, planted = _plant_genes_device(prep, refs, dense_bp, spacing=500_000)
_ = np.asarray(prep.dev[:4])
print(f"{dense_bp/1e6:.0f} Mbp, {planted} planted genes")
nw = dense_bp - ws + 1
thr_int = eng._thr_int(thr)
thr_dev = jnp.asarray(np.asarray([thr_int], dtype=np.int32))
nv = jnp.asarray(np.asarray([nw], dtype=np.int32))


def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf.ravel()[:4] if hasattr(leaf, "ravel") else leaf)
    return x


def t(name, fn, n=3):
    out = fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1e3:9.1f} ms")
    return out, min(ts)


# 1. bitmap pass alone (device, fetched)
def bitmaps_fn():
    return np.asarray(S._scan_record_bitmaps(
        prep.dev, nv, eng.s_dev, thr_dev, k=k, ws=ws, r=r,
        span=eng.chunk, block=eng.block, n_spans=prep.n_spans,
        use_pallas=eng.use_pallas, depth=eng.bound_depth)).reshape(-1)

bitmaps, tb = t("1. bitmap pass (+fetch)", bitmaps_fn)
print(f"   active blocks: {int(bitmaps.sum())} / {bitmaps.size}")

# 2. region planning (host)
plan, tp = t("2. _assemble_plan (plan+dispatch)", lambda: eng._assemble_plan(prep, nw, thr, bitmaps))
print(f"   regions: {len(plan['starts'])} x rspan={plan['rspan']}")

# 3. full assemble (plan + finish = dispatch + compute + fetch + host)
(d0_s, stream), ta = t("3. assemble total (plan+finish)", lambda: eng._assemble_finish(eng._assemble_plan(prep, nw, thr, bitmaps)))
print(f"   stream: {len(stream)} candidates")

# 3b. region compute+fetch alone (dispatch already timed in 2)
def region_fetch():
    p = eng._assemble_plan(prep, nw, thr, bitmaps)
    return jax.tree.map(np.asarray, p["handles"])

_, tf = t("3b. region dispatch+compute+fetch", region_fetch)

# 4. replay alone
_, tr = t("4. replay_single (host)", lambda: replay_single(stream, d0_s, thr, k, ws, dense_bp, 50))

# 5. end to end (the bench number)
def full():
    d0, st, _ = eng.record_stream(np.zeros(dense_bp, dtype=np.int8), thr, codes_dev=prep)
    return replay_single(st, d0, thr, k, ws, dense_bp, 50)

hits, te = t("5. end-to-end record_stream+replay", full)
print(f"   hits: {len(hits)};  {dense_bp/te/1e6:.1f} Mbp/s")
print(f"breakdown: bitmap {tb*1e3:.0f} + regions {tf*1e3:.0f} + host-assemble "
      f"{(ta-tf)*1e3:.0f} + replay {tr*1e3:.0f} = {(tb+ta+tr)*1e3:.0f} ms vs e2e {te*1e3:.0f} ms")
