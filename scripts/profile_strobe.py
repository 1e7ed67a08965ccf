"""Stage-by-stage timing of the strobemer span-engine path on the real TPU.

Decomposes bench.py's strobe workload (64 Mbp dense genome): device
extraction, bitmap pass, stream assembly (region recompute), and replay,
with candidate counts - to locate the gap behind the strobe_mbps line.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from kmergma_tpu.models.state_machine import replay_single  # noqa: E402
from kmergma_tpu.models.strobe_miner import StrobeSpanEngine, gen_strobe_ref_ws_cons  # noqa: E402
from kmergma_tpu.ops.scan import PreparedCodes  # noqa: E402
from kmergma_tpu.ops import scan as S  # noqa: E402
from kmergma_tpu.ops.strobemers import strobe_2_mer_codes_jnp  # noqa: E402
from kmergma_tpu.utils.fasta import as_records  # noqa: E402

from bench import _device_random_genome, _plant_genes_device  # noqa: E402

ref_path = os.path.join(here, "tests/data/Alp_V_ref.fasta")
refs = as_records(ref_path)
sprof = gen_strobe_ref_ws_cons(ref_path)
sthr = float(os.environ.get("BENCH_STROBE_THR", "30.0"))
strobe_bp = int(float(os.environ.get("BENCH_STROBE_MBP", "64")) * 1e6)
w = sprof.windowsize - sprof.k
n_steps = strobe_bp - sprof.windowsize - 1
nw_s = n_steps + 1

e_tmp = StrobeSpanEngine(sprof, 0)
bprep = _device_random_genome(e_tmp, strobe_bp, seed=3, max_ws=sprof.windowsize + 1)
bprep, nplant = _plant_genes_device(bprep, refs, strobe_bp, spacing=500_000)
sc_total = bprep.dev.shape[0]
print(f"{strobe_bp/1e6:.0f} Mbp, {nplant} planted genes, thr={sthr}", flush=True)


@jax.jit
def extract(codes_dev):
    sc = strobe_2_mer_codes_jnp(codes_dev, sprof.s, sprof.w_min, sprof.w_max, sprof.q)
    return jnp.pad(sc, (0, sc_total - sc.shape[0]))


def t(name, fn, n=3):
    out = fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:9.1f} ms", flush=True)
    return out, best


def sync_extract():
    sc = extract(bprep.dev)
    _ = np.asarray(sc[:4])
    return sc


sc0, t_ex = t("1. device extraction (+sync)", sync_extract)
xstar = int(np.asarray(sc0[w : w + 1])[0])
eng = StrobeSpanEngine(sprof, xstar)
sshape = np.zeros(nw_s + eng.ws - 1, dtype=np.int32)
prep = PreparedCodes(sc0, bprep.n_spans)
nw = sshape.shape[0] - eng.ws + 1
thr_int = eng._thr_int(sthr)
thr_dev = jnp.asarray(np.asarray([int(thr_int)], dtype=np.int32))


def bitmaps_fn():
    return np.asarray(
        S._scan_record_bitmaps(
            prep.dev, eng._nv(nw), eng.s_dev, thr_dev, k=eng.k, ws=eng.ws, r=eng.r,
            span=eng.chunk, block=eng.block, n_spans=prep.n_spans,
            use_pallas=eng.use_pallas, depth=eng.bound_depth,
        )
    ).reshape(-1)


bitmaps, t_bm = t("2. bitmap pass (+fetch)", bitmaps_fn)
print(f"   active blocks: {int(bitmaps.sum())} / {bitmaps.size}", flush=True)

plan, t_pl = t("3. assemble plan (+dispatch)", lambda: eng._assemble_plan(prep, nw, sthr, bitmaps))
print(f"   regions: {len(plan['starts'])} x rspan={plan['rspan']}", flush=True)

(d0_s, stream), t_as = t(
    "4. assemble total", lambda: eng._assemble_finish(eng._assemble_plan(prep, nw, sthr, bitmaps))
)
print(f"   stream: {len(stream)} candidates", flush=True)

_, t_rp = t("5. replay_single (host)", lambda: replay_single(
    stream, d0_s, sthr, sprof.k, sprof.windowsize, strobe_bp, 50))


def full():
    sc = extract(bprep.dev)
    d0, st, _ = eng.record_stream(sshape, sthr, codes_dev=PreparedCodes(sc, bprep.n_spans))
    return replay_single(st, d0, sthr, sprof.k, sprof.windowsize, strobe_bp, 50)


hits, t_e2e = t("6. end-to-end extract+scan+replay", full)
print(
    f"   hits: {len(hits)};  {strobe_bp/t_e2e/1e6:.1f} Mbp/s\n"
    f"breakdown: extract {t_ex*1e3:.0f} + bitmap {t_bm*1e3:.0f} + assemble "
    f"{t_as*1e3:.0f} + replay {t_rp*1e3:.0f} = {(t_ex+t_bm+t_as+t_rp)*1e3:.0f} ms "
    f"vs e2e {t_e2e*1e3:.0f} ms", flush=True,
)
