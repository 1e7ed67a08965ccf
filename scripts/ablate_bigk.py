"""Diagnose the k=10 (1M-bin) single-chip slow path: is it the table
gather?  Times one 8M-window span's lower-bound pass at k=10 as-is
(jnp.take lookup) vs with the lookup forced to zeros (everything else
identical), plus the raw gather alone.  Evidence for the design-doc
big-k discussion (VERDICT r4 item 5)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))

from functools import partial  # noqa: E402

from kmergma_tpu.ops.scan import (  # noqa: E402
    _lower_bound_base,
    _pair_ab_xla,
    rolling_kmer_codes_jnp,
)

k, ws, r, depth = 10, 289, 84, 16
span = 1 << 23
rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, span + ws - 1, dtype=np.int8))
s = jnp.asarray(rng.integers(0, 6, 4**k).astype(np.int32))


def timeit(name, fn, n=3):
    out = fn()
    np.asarray(out.ravel()[:4])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out.ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:9.1f} ms", flush=True)
    return best


@partial(jax.jit, static_argnames=("zero_lookup",))
def bounds(codes, s, zero_lookup=False):
    w = ws - k + 1
    nw = span - ws + 1 + (ws - 1) - ws + 1  # windows in this span slice
    nw = codes.shape[0] - ws + 1
    kcodes = rolling_kmer_codes_jnp(codes, k)
    if zero_lookup:
        g = jnp.zeros_like(kcodes)
    else:
        g = jnp.take(s, kcodes)
    l0 = _lower_bound_base(kcodes, g, s, w, r, depth)
    ab = _pair_ab_xla(kcodes, w, nw - 1, depth)
    delta = jnp.int32(2 * r * r) * ab + (2 * r) * (g[: nw - 1] - g[w : w + nw - 1])
    return jnp.concatenate([l0[None], l0 + jnp.cumsum(delta)])


@jax.jit
def gather_only(codes, s):
    kcodes = rolling_kmer_codes_jnp(codes, k)
    return jnp.take(s, kcodes)


@jax.jit
def kcodes_only(codes):
    return rolling_kmer_codes_jnp(codes, k)


@partial(jax.jit, static_argnames=("dt",))
def gather_dtype(codes, s, dt):
    """Gather from a narrowed table (r5: is the 1M-bin gather byte-bound
    or descriptor-bound?  int16/uint8 tables quarter/halve the bytes per
    random access; exact whenever S fits the dtype)."""
    kcodes = rolling_kmer_codes_jnp(codes, k)
    return jnp.take(s.astype(dt), kcodes).astype(jnp.int32)


@jax.jit
def gather_2level(codes, s):
    """Two-level (1024, 1024) layout: gather whole 1024-entry rows by the
    high digit, then one-hot column select - prices the row-gather idea."""
    kcodes = rolling_kmer_codes_jnp(codes, k)
    hi = kcodes >> 10
    lo = kcodes & 1023
    rows = jnp.take(s.reshape(1024, 1024), hi, axis=0)  # (n, 1024)
    return jnp.take_along_axis(rows, lo[:, None], axis=1)[:, 0]


t_full = timeit("k=10 span bounds (take lookup)", lambda: bounds(codes, s))
t_zero = timeit("k=10 span bounds (lookup zeroed)", lambda: bounds(codes, s, zero_lookup=True))
t_g = timeit("gather alone (kcodes + take)", lambda: gather_only(codes, s))
t_kc = timeit("kcodes alone", lambda: kcodes_only(codes))
t_i16 = timeit("gather alone (int16 table)", lambda: gather_dtype(codes, s, jnp.int16))
t_u8 = timeit("gather alone (uint8 table)", lambda: gather_dtype(codes, s, jnp.uint8))
try:
    t_2l = timeit("gather 2-level (row take + col)", lambda: gather_2level(codes, s))
except Exception as e:  # pricing exercise only - never block the ablation
    print(f"2-level gather failed: {e}", flush=True)
    t_2l = float("inf")
print(
    f"lookup share ~= {(t_full - t_zero)*1e3:.0f} ms of {t_full*1e3:.0f} ms; "
    f"raw gather {(t_g - t_kc)*1e3:.0f} ms for {span/1e6:.0f}M lookups; "
    f"i16 {(t_i16 - t_kc)*1e3:.0f} ms; u8 {(t_u8 - t_kc)*1e3:.0f} ms; "
    f"2-level {(t_2l - t_kc)*1e3:.0f} ms",
    flush=True,
)
