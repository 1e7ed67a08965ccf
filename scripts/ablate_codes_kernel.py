"""Ablation: codes-in kernel pipeline vs the kcodes-in (XLA K-build) pipeline.

Times one span-sized lower-bound pass (the production bitmap pass's unit of
work) on the real TPU and asserts bit-identity.  Run standalone:

    python scripts/ablate_codes_kernel.py [span_windows_log2=25]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmergma_tpu.ops.scan_pallas import (  # noqa: E402
    scan_window_lower_bounds_codes,
    scan_window_lower_bounds_pallas,
)

k, ws, r, depth = 6, 289, 84, 32
log2span = int(sys.argv[1]) if len(sys.argv) > 1 else 25
span = 1 << log2span
n = span + ws - 1

codes = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 4, dtype=jnp.int8)
rng = np.random.default_rng(0)
s = jnp.asarray(rng.integers(0, 40, 4**k).astype(np.int32))
_ = np.asarray(codes[:4])


def timeit(fn, label):
    out = fn()
    _ = np.asarray(out.ravel()[:4])  # force completion (block_until_ready is a relay no-op)
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out.ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms ({span/best/1e6:.0f} Mwin/s)")
    return out, best


old, t_old = timeit(
    lambda: scan_window_lower_bounds_pallas(codes, s, k, ws, r, depth), "kcodes-in (old)"
)
new, t_new = timeit(
    lambda: scan_window_lower_bounds_codes(codes, s, k, ws, r, depth), "codes-in (new)"
)
eq = bool(np.asarray(jnp.all(old == new)))
print(f"bit-identical: {eq}; speedup {t_old/t_new:.2f}x")
assert eq
