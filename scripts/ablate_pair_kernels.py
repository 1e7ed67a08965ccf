"""Ablation: pair-kernel variants for the lower-bound bitmap pass (real TPU).

Sweeps the roll-carried kernel's tile size against the static-unroll
baseline, and the bound depth, on one production-sized span.  Asserts
bit-identity between variants.  Run standalone:

    python scripts/ablate_pair_kernels.py [span_windows_log2=25]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmergma_tpu.ops.scan_pallas import scan_window_lower_bounds_codes  # noqa: E402

k, ws, r = 6, 289, 84
log2span = int(sys.argv[1]) if len(sys.argv) > 1 else 25
span = 1 << log2span
n = span + ws - 1

codes = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 4, dtype=jnp.int8)
rng = np.random.default_rng(0)
s = jnp.asarray(rng.integers(0, 40, 4**k).astype(np.int32))
_ = np.asarray(codes[:4])


def timeit(fn, label):
    out = fn()
    _ = np.asarray(out.ravel()[:4])
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out.ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:6.1f} ms ({span/best/1e6:5.0f} Mwin/s)", flush=True)
    return out, best


base, t_base = timeit(
    lambda: scan_window_lower_bounds_codes(codes, s, k, ws, r, 32, 8192),
    "unroll t= 8192 depth=32",
)
for t in (32768,):
    out, _ = timeit(
        lambda t=t: scan_window_lower_bounds_codes(codes, s, k, ws, r, 32, t, use_roll=True),
        f"roll   t={t:6d} depth=32",
    )
    eq = bool(np.asarray(jnp.all(out == base)))
    print(f"  bit-identical: {eq}", flush=True)
    assert eq

for depth in (16,):
    timeit(
        lambda d=depth: scan_window_lower_bounds_codes(codes, s, k, ws, r, d, 32768, use_roll=True),
        f"roll   t= 32768 depth={depth:2d}",
    )
