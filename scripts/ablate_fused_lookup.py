"""Ablation: fused-kernel lookup strategies on the real TPU.

Times the whole-record fused bitmap pass with (a) the chunked in-kernel
gather and (b) the in-kernel one-hot MXU lookup (VERDICT r2 next-#3),
against the production split pass, on a 64 Mbp device genome.  Asserts
bitmap equality between all three.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, here)

from kmergma_tpu.ops import scan as S  # noqa: E402
from kmergma_tpu.ops.reference import gen_ref_ws_cons  # noqa: E402
from kmergma_tpu.ops.scan_fused import ROWS as FROWS, fused_record_bitmaps  # noqa: E402

sys.path.insert(0, here)
from bench import _device_random_genome  # noqa: E402

profile = gen_ref_ws_cons(os.path.join(here, "tests/data/Alp_V_ref.fasta"), 6)
k, ws, r = profile.k, profile.windowsize, profile.n_records
depth, thr = 32, 30.0
n_bp = int(float(os.environ.get("BENCH_MBP", "64")) * 1e6)
nw = n_bp - ws + 1

eng = S.ScanEngine(profile.sum_kfv, k=k, ws=ws, r=r, use_fused=True)
prep = _device_random_genome(eng, n_bp, seed=42, max_ws=ws + 1)
_ = np.asarray(prep.dev[:4])
thr_int = int(eng._thr_int(thr))

t = 8192
w = ws - k + 1
n_tiles = -(-(-(-nw // t)) // FROWS) * FROWS
l0 = S._first_window_l0(prep.dev, eng.s_dev, k=k, ws=ws, r=r, depth=depth)
meta = jnp.stack([jnp.int32(thr_int), l0.astype(jnp.int32), jnp.int32(nw)])


def timeit(fn, label):
    out = fn()
    _ = np.asarray(out.ravel()[:4])
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out.ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:6.1f} ms ({n_bp/best/1e6:5.0f} Mbp/s)", flush=True)
    return out, best


thr_dev = jnp.asarray(np.asarray([thr_int], dtype=np.int32))
split, t_split = timeit(
    lambda: S._scan_record_bitmaps(
        prep.dev, eng._nv(nw), eng.s_dev, thr_dev, k=k, ws=ws, r=r,
        span=eng.chunk, block=eng.block, n_spans=prep.n_spans,
        use_pallas=True, depth=depth,
    ),
    "split (production)      ",
)
outs = {}
for lookup in ("gather", "mxu"):
    out, _t = timeit(
        lambda lk=lookup: fused_record_bitmaps(
            prep.dev, eng.s_dev, meta, k=k, ws=ws, r=r, depth=depth,
            t=t, block=eng.block, n_tiles=n_tiles, lookup=lk,
        ),
        f"fused lookup={lookup:6s}    ",
    )
    outs[lookup] = np.asarray(out).reshape(-1)[: nw // eng.block]

split_bits = np.asarray(split).reshape(-1)[: nw // eng.block]
for lk, bits in outs.items():
    eq = bits.astype(bool).tolist() == split_bits.astype(bool).tolist()
    print(f"fused[{lk}] == split bitmaps: {eq}", flush=True)
    assert eq
