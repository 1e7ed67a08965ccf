"""Stage-by-stage timing of the production scan on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from kmergma_tpu.ops.reference import gen_ref_ws_cons
from kmergma_tpu.ops import scan as S
from kmergma_tpu.ops import scan_pallas as SP

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
profile = gen_ref_ws_cons(os.path.join(here, "tests/data/Alp_V_ref.fasta"), 6)
k, ws, r = profile.k, profile.windowsize, profile.n_records
thr = 30.0

n_bp = int(float(os.environ.get("BENCH_MBP", "128")) * 1e6)
rng = np.random.default_rng(42)
codes = rng.integers(0, 4, n_bp, dtype=np.int8)

eng = S.ScanEngine(profile.sum_kfv, k=k, ws=ws, r=r)
print(f"chunk={eng.chunk} use_pallas={eng.use_pallas} backend={jax.default_backend()}")

def sync(x):
    """Force completion with a real fetch (the axon relay's block-until-
    ready is a no-op; bench.py uses the same np.asarray idiom)."""
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf.ravel()[:4] if hasattr(leaf, "ravel") else leaf)
    return x

def t(name, fn, n=3):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1e3:9.1f} ms")
    return min(ts)

# 1. H2D prepare (pack + transfer + unpack)
t("prepare_codes (H2D+unpack)", lambda: sync(eng.prepare_codes(codes).dev))
prep = eng.prepare_codes(codes)
sync(prep.dev)

# 2. full record bitmap call (the production path, device only)
nw = n_bp - ws + 1
thr_dev = jnp.asarray(np.asarray([eng._thr_int(thr)], dtype=np.int32))
nv = jnp.asarray(np.asarray([nw], dtype=np.int32))
def bitmaps():
    return sync(S._scan_record_bitmaps(
        prep.dev, nv, eng.s_dev, thr_dev, k=k, ws=ws, r=r,
        span=eng.chunk, block=eng.block, n_spans=prep.n_spans, use_pallas=eng.use_pallas,
        depth=eng.bound_depth))
tb = t("record bitmaps (production)", bitmaps)
print(f"  -> implied scan-only throughput {n_bp/tb/1e6:.1f} Mbp/s (depth={eng.bound_depth})")

# 2b/2c need a pair depth; skip them for exact-mode engines (bound_depth=None)
if eng.bound_depth is None:
    print("bound_depth=None (exact mode): skipping lower-bound sections 2b/2c")
else:
    # 2b. lower-bound span pass alone (the per-span body of the bitmap call)
    span_ = eng.chunk
    cd_ = prep.dev[: span_ + ws - 1]
    sync(cd_)
    def lbspan():
        return sync(SP.scan_window_lower_bounds_pallas(
            cd_, eng.s_dev, k, ws, r, eng.bound_depth))
    tl = t("one span lower bounds", lbspan)
    print(f"  -> {span_/tl/1e6:.1f} Mbp/s")

    # 2c. pair_counts kernel alone at production depth
    w_ = ws - k + 1
    kc_ = S.rolling_kmer_codes_jnp(cd_, k)
    tt_ = 8192
    n_tiles_ = -(-span_ // tt_)
    ntp_ = -(-n_tiles_ // SP.ROWS) * SP.ROWS
    hw_ = -(-w_ // 128) * 128
    kp_ = jnp.pad(kc_, (0, ntp_ * tt_ + hw_ - kc_.shape[0]))
    tm_ = kp_[: ntp_ * tt_].reshape(ntp_, tt_)
    th_ = jax.vmap(lambda i: jax.lax.dynamic_slice(kp_, ((i + 1) * tt_,), (hw_,)))(jnp.arange(ntp_))
    sync((tm_, th_))
    tpc = t("pair_counts kernel alone", lambda: sync(
        SP.pair_counts(tm_, th_, w_, tt_, eng.bound_depth)))
    print(f"  -> {span_/tpc/1e6:.1f} Mbp/s")

# 3. single span distances, pallas vs xla
span = eng.chunk
cd = prep.dev[: span + ws - 1]
sync(cd)
def pall():
    return sync(SP.scan_window_distances_pallas(cd, eng.s_dev, k, ws, r))
tp = t("one span pallas D", pall)
print(f"  -> {span/tp/1e6:.1f} Mbp/s")

# 4. kernel alone on pre-built tiles
w = ws - k + 1
kcodes = S.rolling_kmer_codes_jnp(cd, k)
tt = 2048
n_tiles = -(-span // tt)
n_tiles_pad = -(-n_tiles // SP.ROWS) * SP.ROWS
kp = jnp.pad(kcodes, (0, n_tiles_pad * tt + w - kcodes.shape[0]))
tiles = jax.vmap(lambda i: jax.lax.dynamic_slice(kp, (i * tt,), (tt + w,)))(jnp.arange(n_tiles_pad))
sync(tiles)
tk = t("match_counts kernel alone", lambda: sync(SP.match_counts(tiles, w, tt)))
print(f"  -> {span/tk/1e6:.1f} Mbp/s")

# 5. XLA glue alone: kcodes + gather + delta + cumsum (no kernel)
@jax.jit
def glue(cd, s):
    kc = S.rolling_kmer_codes_jnp(cd, k)
    g = jnp.take(s, kc)
    nw1 = span
    kl = kc[: nw1 - 1]; kr = kc[w : w + nw1 - 1]
    delta = jnp.int32(2 * r * r) * (kl != kr) + (2 * r) * (g[: nw1 - 1] - g[w : w + nw1 - 1])
    return jnp.cumsum(delta)
t("xla glue (kcodes+gather+cumsum)", lambda: sync(glue(cd, eng.s_dev)))

# 6. gather alone
@jax.jit
def gath(cd, s):
    kc = S.rolling_kmer_codes_jnp(cd, k)
    return jnp.take(s, kc)
t("kcodes+gather alone", lambda: sync(gath(cd, eng.s_dev)))

# 7. tile build alone
@jax.jit
def tb_(cd):
    kc = S.rolling_kmer_codes_jnp(cd, k)
    kp = jnp.pad(kc, (0, n_tiles_pad * tt + w - kc.shape[0]))
    return jax.vmap(lambda i: jax.lax.dynamic_slice(kp, (i * tt,), (tt + w,)))(jnp.arange(n_tiles_pad))
t("kcodes+tile build alone", lambda: sync(tb_(cd)))
