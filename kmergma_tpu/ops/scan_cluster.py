"""One-pass multi-profile (cluster) scan engine.

The reference's cluster mode is m x the cost of the single scan (one rolling
update per cluster per bp, ref /root/reference/src/OmnGenomeMiner.jl:89-158,
README.md:50 "40/m Mbp/s").  This engine beats that m x by sharing everything
profile-independent across clusters in ONE device pass per record:

  * K codes are computed once per span (not once per cluster),
  * the pair-match delta ``ab`` and the first-window pair count ``p0`` -
    the O(depth)/bp hot loops - depend only on (windowsize, depth), so
    clusters are grouped by windowsize and each group runs the Pallas pair
    kernel ONCE (cluster windowsizes cluster tightly: e.g. the reference
    test set yields [288,288,288,289,290,289] -> 3 groups for 6 clusters),
  * only the cheap per-cluster tail (profile lookup g = S_m[K], scaled
    delta assembly, cumsum, threshold bitmap) runs per cluster, fused by
    XLA into the same elementwise pipeline.

Asymptotically the pass costs O(G*depth + m)/bp instead of m*O(depth)/bp,
where G = #distinct windowsizes <= m.  The per-cluster candidate streams are
then assembled through each cluster's ScanEngine region machinery (exact
recompute of rare active regions) and replayed by the sequential Omn state
machine - bit-exact with the serial per-cluster path by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .scan import (
    ScanEngine,
    _pair_ab_xla,
    _with_retry,
    profile_lookup_multi,
    rolling_kmer_codes_jnp,
)


@partial(jax.jit, static_argnames=("k", "specs", "depth", "t", "block", "n_tiles", "lookup_dtype", "chunk"))
def _fused_cluster_all(codes_dev, s_stack, small, *, k, specs, depth, t, block, n_tiles, lookup_dtype, chunk):
    """The whole fused cluster bitmap pass in ONE dispatch: per-cluster
    first-window bounds (each touches only the first ws_c codes - m
    separate _first_window_l0 dispatches were pure round-trip latency on
    the remote TPU), meta assembly, the fused multi-cluster kernel, and
    the bit-packing of its output.  ``small`` is the host-cached
    [nw_c..., thr_c...] vector; returns packed uint32 words."""
    from .scan import _lower_bound_base, _pack_bitmap_words, profile_lookup
    from .scan_cluster_fused import fused_cluster_record_bitmaps

    l0s = []
    for ci, (ws, r) in enumerate(specs):
        head = jax.lax.slice(codes_dev, (0,), (ws,))
        kc = rolling_kmer_codes_jnp(head, k)
        g = profile_lookup(kc, s_stack[ci])
        l0s.append(_lower_bound_base(kc, g, s_stack[ci], ws - k + 1, r, depth))
    meta = jnp.concatenate([small, jnp.stack(l0s).astype(jnp.int32)])
    handle = fused_cluster_record_bitmaps(
        codes_dev, s_stack, meta,
        k=k, specs=tuple((ws - k + 1, r) for ws, r in specs), depth=depth,
        t=t, block=block, n_tiles=n_tiles, lookup_dtype=lookup_dtype,
        chunk=chunk,
    )  # (n_tiles, m * (t // block))
    return _pack_bitmap_words(handle.reshape(-1))


#: per-cluster fused-reduce run-slot bucket (m sections ride one fetch,
#: so it is half the single-profile bucket; overflow falls back to the
#: separate reduce round trip)
_CRED_RUNS = 512


@partial(jax.jit, static_argnames=("k", "specs", "depth", "t", "block", "n_tiles", "lookup_dtype", "chunk", "rspan", "n_regions", "use_pallas"))
def _fused_cluster_planned(codes_dev, s_stack, small, meta, mis, *, k, specs, depth, t, block, n_tiles, lookup_dtype, chunk, rspan, n_regions, use_pallas):
    """Fused bitmap pass + DEVICE-SIDE region planning + summarized region
    recompute, all in ONE dispatch (VERDICT r4 next-round #1).

    The r4 cluster path paid THREE serial host round trips per record:
    bitmap fetch -> host region planning -> summarized dispatch + words
    fetch -> run-reduce fetch.  The regions are derivable on device from
    the bitmap the kernel just produced, so this jit chains the fused
    multi-cluster kernel, the plan (mirroring ScanEngine._plan_starts:
    expand active blocks one right, force block 0, coarsen to the rspan
    grid, compact via cumsum + searchsorted - no scatter, relay-friendly)
    and the exact summarized recompute back to back - the bitmap fetch and
    the host planning gap disappear from the record's critical path.

    Region slots are a STATIC ``n_regions`` bucket; per-cluster valid
    counts (and an overflow flag for records denser than the bucket) ride
    the single fetch.  Padded slots recompute region 0 with their below
    bits masked (scan._below_words_and_count n_valid_rows).

    Returns (d_flat, blob, packed_bitmap):
      d_flat int32[m*n_regions*rspan] - stays on device (only the rare
             fallback paths fetch from it);
      blob   uint32 = [below words | borderline counts | dist0s | starts |
             valid counts | overflow flags | per-cluster fused run-reduce
             sections (_device_run_reduce)] - the ONE per-record fetch;
      packed_bitmap - the packed block bitmap, fetched ONLY on region-
             bucket overflow (host falls back to the r4 path).
    """
    from .scan import (
        _lower_bound_base,
        _pack_bitmap_words,
        _regions_summarized_multi_body,
        profile_lookup,
    )
    from .scan_cluster_fused import fused_cluster_record_bitmaps

    m = len(specs)
    l0s = []
    for ci, (ws, r) in enumerate(specs):
        head = jax.lax.slice(codes_dev, (0,), (ws,))
        kc = rolling_kmer_codes_jnp(head, k)
        g = profile_lookup(kc, s_stack[ci])
        l0s.append(_lower_bound_base(kc, g, s_stack[ci], ws - k + 1, r, depth))
    kmeta = jnp.concatenate([small, jnp.stack(l0s).astype(jnp.int32)])
    handle = fused_cluster_record_bitmaps(
        codes_dev, s_stack, kmeta,
        k=k, specs=tuple((ws - k + 1, r) for ws, r in specs), depth=depth,
        t=t, block=block, n_tiles=n_tiles, lookup_dtype=lookup_dtype,
        chunk=chunk,
    )  # (n_tiles, m * (t // block))
    tb = t // block
    n_blocks = n_tiles * tb
    bm = handle.reshape(n_tiles, m, tb).transpose(1, 0, 2).reshape(m, n_blocks).astype(bool)

    # device region planning (bit-compatible with ScanEngine._plan_starts
    # coverage: every active block and its right neighbour is covered)
    sb = rspan // block
    assert sb * block == rspan and n_blocks % sb == 0, (rspan, block, n_blocks)
    shifted = jnp.pad(bm[:, :-1], ((0, 0), (1, 0)))
    active = bm | shifted
    active = active.at[:, 0].set(True)  # window 0 (dist0)
    asb = active.reshape(m, n_blocks // sb, sb).any(axis=2)
    # clamp per cluster: expansion past the last valid window must not
    # emit a region starting >= nw_c (host _plan_starts clamps hi to nw)
    sb_starts = jnp.arange(asb.shape[1], dtype=jnp.int32)[None, :] * rspan
    asb = asb & (sb_starts < small[:m, None])
    counts = jnp.cumsum(asb.astype(jnp.int32), axis=1)
    n_valid_regions = counts[:, -1]
    overflow = (n_valid_regions > n_regions).astype(jnp.uint32)
    targets = jnp.arange(1, n_regions + 1, dtype=jnp.int32)
    sb_idx = jax.vmap(lambda c: jnp.searchsorted(c, targets, side="left"))(counts)
    starts = jnp.where(sb_idx >= asb.shape[1], 0, sb_idx).astype(jnp.int32) * rspan
    starts_flat = starts.reshape(-1)

    d_flat, words, red = _regions_summarized_multi_body(
        codes_dev, starts_flat, s_stack, meta,
        k=k, rspan=rspan, n_regions=n_regions, specs=specs,
        use_pallas=use_pallas, region_valid=n_valid_regions,
        reduce_mi=mis, red_runs=_CRED_RUNS,
    )
    blob = jnp.concatenate([
        words,
        starts_flat.astype(jnp.uint32),
        n_valid_regions.astype(jnp.uint32),
        overflow,
        red.astype(jnp.uint32),
    ])
    return d_flat, blob, _pack_bitmap_words(handle.reshape(-1))


def _shared_p0(kcodes: jnp.ndarray, w: int, depth: int) -> jnp.ndarray:
    """First-window equal-k-mer pair count at partner distance <= depth -
    the profile-independent part of ops.scan._lower_bound_base."""
    k0 = kcodes[:w]
    idx = jnp.arange(w, dtype=jnp.int32)

    def body(d, acc):
        return acc + jnp.sum(
            ((jnp.roll(k0, -d) == k0) & (idx < w - d)).astype(jnp.int32)
        )

    return jax.lax.fori_loop(1, depth + 1, body, jnp.int32(0))


def _span_bitmaps(codes_span, pos, s_stack, thr_ints, n_valids, s2, *, k, block, groups, use_pallas, pair_kernel="roll"):
    """Activity bitmaps of one span for ALL clusters: (m, span // block).

    ``codes_span`` holds span + max_ws - 1 codes; ``pos`` the span's global
    window indices (for validity masking); groups/s_stack/thr_ints as in
    _cluster_record_bitmaps.  K codes and the pair-count hot loop (ab, p0)
    are computed once per windowsize group, ALL m profile lookups run as one
    concatenated-table MXU matmul (profile_lookup_multi), and the per-
    cluster delta/cumsum/bitmap tails are batched per group - the only
    per-group work left is the pair kernel.  Shared by the single-device
    and sharded passes.
    """
    span = pos.shape[0]
    m = s_stack.shape[0]
    nt = span - 1
    max_w = max(g[0] for g in groups) - k + 1
    kcodes_all = None
    ab_multi = None
    depths = {g[1] for g in groups}
    if use_pallas and len(depths) == 1:
        # ONE kernel pass emits the K codes AND every windowsize group's
        # pair deltas.  Two bit-identical variants: "roll" (width-independent
        # B_D accumulator, one static roll per extra group, t=32768) and
        # "unroll" (static-sliced depth unroll sharing one compare stream
        # per depth across groups, no lane rolls, t=8192).  v5e ablation at
        # depth 16 (scripts/profile_cluster.py): roll 64.7 ms vs unroll
        # 84.8 ms per span - the bigger tiles amortise better than the
        # rolls cost, so "roll" stays the default.  (The split pass itself
        # is the CPU/fallback path; on TPU the fused multi-cluster kernel
        # replaces it - scan_cluster_fused.py.)
        from .scan_pallas import codes_pair_multi, codes_pair_roll_multi

        fn = codes_pair_roll_multi if pair_kernel == "roll" else codes_pair_multi
        ab_multi, kcodes_all = fn(
            codes_span, k, tuple(g[0] for g in groups), nt,
            span + max_w - 1, next(iter(depths)),
        )
    elif use_pallas:
        # mixed per-group depths (tiny windows clamp below bound_depth):
        # group-0 pair deltas ride the codes-in kernel; the rest reuse its
        # K codes through the kcodes-in pair kernel.
        from .scan_pallas import codes_pair_ab_kcodes, pair_ab_from_kcodes

        w0, depth0 = groups[0][0] - k + 1, groups[0][1]
        ab0, kcodes_all = codes_pair_ab_kcodes(
            codes_span, k, w0, nt, span + max_w - 1, depth0
        )
    else:
        kcodes_all = rolling_kmer_codes_jnp(codes_span, k)
    g_all = profile_lookup_multi(
        jax.lax.slice(kcodes_all, (0,), (span + max_w - 1,)), s_stack
    )  # (m, span + max_w - 1)
    bitmaps: list = [None] * m
    for gi, (ws, depth, idxs, rs) in enumerate(groups):
        w = ws - k + 1
        kc = jax.lax.slice(kcodes_all, (0,), (span + w - 1,))
        if ab_multi is not None:
            ab = ab_multi[gi]
        elif use_pallas:
            ab = ab0 if gi == 0 else pair_ab_from_kcodes(kc, w, nt, depth)
        else:
            ab = _pair_ab_xla(kc, w, nt, depth)
        p0 = _shared_p0(kc, w, depth)
        sel = np.asarray(idxs)
        g_g = g_all[sel]  # (mg, ...) static row gather
        r_vec = jnp.asarray(np.asarray(rs, dtype=np.int32))[:, None]  # (mg, 1)
        l0 = (
            r_vec[:, 0] * r_vec[:, 0] * (jnp.int32(w) + 2 * p0)
            - 2 * r_vec[:, 0] * jnp.sum(g_g[:, :w], axis=1)
            + s2[sel]
        )
        delta = (2 * r_vec * r_vec) * ab[None, :] + (2 * r_vec) * (
            g_g[:, :nt] - g_g[:, w : w + nt]
        )
        bounds = jnp.concatenate(
            [l0[:, None], l0[:, None] + jnp.cumsum(delta, axis=1)], axis=1
        )
        below = (bounds < thr_ints[sel][:, None]) & (pos[None, :] < n_valids[sel][:, None])
        bm_g = below.reshape(len(idxs), span // block, block).any(axis=2)
        for j, ci in enumerate(idxs):
            bitmaps[ci] = bm_g[j]
    return jnp.stack(bitmaps)


@partial(jax.jit, static_argnames=("k", "span", "block", "n_spans", "use_pallas", "groups", "pair_kernel"))
def _cluster_record_bitmaps(
    codes_dev, n_valids, s_stack, thr_ints, *, k, span, block, n_spans, use_pallas, groups, pair_kernel="roll"
):
    """Activity bitmaps for ALL clusters in one device pass.

    groups: static tuple of (ws, depth, cluster_index_tuple, r_tuple) with
    clusters grouped by windowsize; ``s_stack`` is the (m, 4^k) stack of
    integer summed profiles, ``thr_ints``/``n_valids`` the per-cluster
    scaled thresholds and window counts.

    Returns bool[n_spans, m, span // block].
    """
    max_ws = max(g[0] for g in groups)
    s2 = jnp.sum(s_stack * s_stack, axis=1)  # (m,) ||S_m||^2

    def step(_, i):
        start = i * span
        codes = jax.lax.dynamic_slice(codes_dev, (start,), (span + max_ws - 1,))
        pos = start + jnp.arange(span, dtype=jnp.int32)
        return _, _span_bitmaps(
            codes, pos, s_stack, thr_ints, n_valids, s2,
            k=k, block=block, groups=groups, use_pallas=use_pallas,
            pair_kernel=pair_kernel,
        )

    _, out = jax.lax.scan(step, 0, jnp.arange(n_spans))
    return out  # (n_spans, m, span // block)


class ClusterScanEngine:
    """Host-side driver of the one-pass multi-profile scan.

    Wraps one ScanEngine per cluster (for the exact region recompute and
    stream assembly) but replaces their m serial bitmap passes with the
    single fused pass above.  One H2D transfer per record, shared by all
    clusters (padded for the largest windowsize).
    """

    def __init__(
        self,
        profiles: list,
        k: int,
        chunk_windows: int | None = None,
        use_pallas: bool | None = None,
        bound_depth: int | None = 16,
        pair_kernel: str = "roll",
        use_fused: bool | None = None,
    ):
        self.k = k
        self.pair_kernel = pair_kernel
        self.engines = [
            ScanEngine(
                p.sum_kfv,
                k=k,
                ws=p.windowsize,
                r=p.n_records,
                chunk_windows=chunk_windows,
                use_pallas=use_pallas,
                bound_depth=bound_depth,
                use_fused=False,  # the cluster pass fuses its own span scan
            )
            for p in profiles
        ]
        e0 = self.engines[0]
        self.chunk, self.block, self.use_pallas = e0.chunk, e0.block, e0.use_pallas
        self.max_ws = max(e.ws for e in self.engines)
        # group clusters by (ws, clamped depth); exact mode (depth None)
        # uses depth = w - 1 where the lower bound equals the distance
        by_key: dict[tuple[int, int], list[int]] = {}
        for ci, e in enumerate(self.engines):
            depth = e.bound_depth if e.bound_depth is not None else e.ws - k
            by_key.setdefault((e.ws, depth), []).append(ci)
        self.groups = tuple(
            (ws, depth, tuple(cis), tuple(self.engines[ci].r for ci in cis))
            for (ws, depth), cis in sorted(by_key.items())
        )
        self.s_stack = jnp.stack([e.s_dev for e in self.engines])
        self._s_max = max(int(np.max(p.sum_kfv)) for p in profiles)
        self._small_cache: dict = {}
        depths = {g[1] for g in self.groups}
        if use_fused is None:
            # the fused multi-cluster Mosaic kernel (scan_cluster_fused.py)
            # replaces the whole split span pass on TPU; same availability
            # rules as the single-profile fused kernel (uniform depth <= 16,
            # square-decomposable table), KMERGMA_FUSED=0 opts out
            import os

            use_fused = (
                os.environ.get("KMERGMA_FUSED", "") != "0"
                and jax.default_backend() == "tpu"
                and 4**k <= 4096
                and len(depths) == 1
                and next(iter(depths)) <= 16
            )
        elif use_fused and (len(depths) != 1 or next(iter(depths)) > 16):
            # fail fast with a clear message (mirrors ScanEngine): the Mosaic
            # compile of the fused kernel past depth 16 dies opaquely (and
            # slowly, through a remote-compile relay)
            raise ValueError(
                f"use_fused=True requires one shared bound_depth <= 16 across "
                f"clusters (got depths {sorted(depths)}); use the split pass "
                "(use_fused=False) for deeper or mixed bounds"
            )
        self.use_fused = use_fused and self.use_pallas and len(depths) == 1
        #: minimum max-cluster window count for the fused kernel (tiny
        #: records are cheaper through the split pass; tests lower this)
        self.fused_min_windows = 1 << 16
        #: in-kernel lookup precision.  "auto" (default) self-validates the
        #: pair-packed f32 lookup (f32pack: half the MXU work, r4 measured
        #: 79 vs 98 ms per 64 Mbp at m=6) against plain f32 on the FIRST
        #: fused record of this engine and keeps it only on bit-equality -
        #: its exactness depends on the chip's f32 dot decomposition
        #: keeping >= 16 table mantissa bits (a 24-bit packing was measured
        #: wrong on v5e), so it is never trusted unverified.  Explicit
        #: "f32" / "bf16" / "f32pack" skip the self-check.
        # S >= 256: the direct f32 table is NOT exact on v5e (one bf16
        # pass) - the 8-bit limb-split is exact by construction
        if self._s_max < 256:
            self.lookup_dtype = "auto" if len(profiles) >= 2 else "f32"
        else:
            self.lookup_dtype = "bf16"
        self._auto_resolved: str | None = None
        #: lane-chunk width of the in-kernel multi-table lookup (ablatable)
        self.lookup_chunk = 2048
        #: device-side region planning: the fused kernel, the region plan
        #: and the summarized recompute run as ONE dispatch (2 host round
        #: trips per record instead of 3 - VERDICT r4 #1).  KMERGMA_DEVPLAN=0
        #: opts out; a record denser than the region bucket falls back to
        #: the host-planned path automatically (and grows the bucket)
        import os as _os

        self.device_plan = _os.environ.get("KMERGMA_DEVPLAN", "") != "0"
        self.plan_regions = 256
        self.plan_regions_max = 1024

    def prepare_codes(self, codes: np.ndarray):
        return self.engines[0].prepare_codes(
            codes, max_ws=self.max_ws,
            fused_ws=self.max_ws if self.use_fused else None,
        )

    def _resolve_lookup_dtype(self) -> str:
        """The in-kernel lookup precision actually used by the fused passes."""
        ld = self.lookup_dtype
        if ld == "f32pack" and self._s_max >= 256:
            ld = "f32"  # pair packing needs 8-bit table entries
        if ld == "auto":
            ld = self._auto_resolved
            if ld is None:
                # once per engine: certify f32pack by a PER-ENTRY round
                # trip through the actual in-kernel lookup path - every
                # m * 4^k table entry must come back as its exact integer
                # (block-granular bitmap equality on one record is too
                # weak a certificate for a decomposition-dependent
                # property; a KB-scale fetch instead of two full bitmap
                # passes, too)
                from .scan_cluster_fused import pack_lookup_roundtrip

                m = len(self.engines)
                nbins = 4**self.k
                got = np.asarray(
                    pack_lookup_roundtrip(
                        self.s_stack, m=m, nbins=nbins,
                        lookup_dtype="f32pack", chunk=self.lookup_chunk,
                    )
                )
                from .scan_fused import ROWS as _R

                want = np.asarray(self.s_stack).reshape(m, _R, nbins // _R)
                ok = np.array_equal(got.reshape(m, _R, nbins // _R), want)
                ld = self._auto_resolved = "f32pack" if ok else "f32"
        return ld

    def _fused_cluster_bitmaps(self, prep, n_valids, thr_ints) -> np.ndarray:
        """Whole-record fused pass: returns bool[m, n_blocks] bitmaps."""
        from .scan_fused import ROWS as FROWS

        t = self.engines[0].fused_t
        depth = self.groups[0][1]
        nw_max = int(n_valids.max())
        n_tiles = -(-(-(-nw_max // t)) // FROWS) * FROWS
        max_w = self.max_ws - self.k + 1
        hw = -(-(max_w + 1) // 128) * 128 + 128
        if prep.dev.shape[0] < n_tiles * t + t + hw:
            # mirror scan._fused_words: an undersized codes_dev
            # (e.g. a manually-built PreparedCodes) would make the halo
            # dynamic_slice clamp and yield silently wrong bitmaps near the
            # record end
            raise AssertionError("prepared record too small for the fused tiling")
        key = ("meta", tuple(n_valids.tolist()), tuple(thr_ints.tolist()))
        small = self._small_cache.get(key)
        if small is None:
            if len(self._small_cache) > 64:
                self._small_cache.clear()
            small = jnp.asarray(np.concatenate([n_valids, thr_ints]).astype(np.int32))
            self._small_cache[key] = small
        from .scan import _unpack_bitmap_words

        ld = self._resolve_lookup_dtype()
        words = _fused_cluster_all(
            prep.dev, self.s_stack, small,
            k=self.k, specs=tuple((e.ws, e.r) for e in self.engines),
            depth=depth, t=t, block=self.block, n_tiles=n_tiles,
            lookup_dtype=ld, chunk=self.lookup_chunk,
        )  # one dispatch: l0s + meta + kernel + bit-pack
        m = len(self.engines)
        tb = t // self.block
        flat = _unpack_bitmap_words(np.asarray(words), n_tiles * m * tb)
        return flat.reshape(n_tiles, m, tb).transpose(1, 0, 2).reshape(m, -1)

    def record_streams(
        self, codes: np.ndarray, thrs: list[float], codes_dev=None, seg_tracker=None
    ) -> list[tuple[float, list[tuple[int, float]]]]:
        """Scan one record against every cluster profile in one device pass.

        Returns one (dist0, stream) per cluster - the exact contract of
        ScanEngine.record_stream, consumed by state_machine.replay_omn.
        ``seg_tracker`` (mid-record segment resume) applies to the SHARDED
        cluster engine only; this one-dispatch engine checkpoints per
        record.
        """
        if len(thrs) != len(self.engines):
            raise ValueError(f"{len(self.engines)} clusters but {len(thrs)} thresholds")
        n = codes.shape[0]
        prep = codes_dev if codes_dev is not None else self.prepare_codes(codes)
        n_valids = np.array([n - e.ws + 1 for e in self.engines], dtype=np.int32)
        if (n_valids < 1).any():
            raise ValueError("record shorter than a cluster windowsize")
        thr_ints = np.array(
            [e._thr_int(t) for e, t in zip(self.engines, thrs)], dtype=np.int32
        )
        if self.use_fused and int(n_valids.max()) >= self.fused_min_windows:
            if self.device_plan and self.engines[0].assemble_mode == "reduced":
                return self._streams_planned(prep, n_valids, thr_ints, thrs, seq_len=n)
            by_cluster = _with_retry(
                lambda: self._fused_cluster_bitmaps(prep, n_valids, thr_ints)
            )
        else:
            # cache the two small per-record device arrays (high per-transfer
            # latency on remote TPUs; most genomes repeat a few record lengths)
            key = (tuple(n_valids.tolist()), tuple(thr_ints.tolist()))
            devs = self._small_cache.get(key)
            if devs is None:
                if len(self._small_cache) > 64:
                    self._small_cache.clear()
                devs = (jnp.asarray(n_valids), jnp.asarray(thr_ints))
                self._small_cache[key] = devs
            bitmaps = _with_retry(
                lambda: np.asarray(
                    _cluster_record_bitmaps(
                        prep.dev,
                        devs[0],
                        self.s_stack,
                        devs[1],
                        k=self.k,
                        span=self.chunk,
                        block=self.block,
                        n_spans=prep.n_spans,
                        use_pallas=self.use_pallas,
                        groups=self.groups,
                        pair_kernel=self.pair_kernel,
                    )
                )
            )  # (n_spans, m, blocks)
            by_cluster = [bitmaps[:, ci, :].reshape(-1) for ci in range(len(self.engines))]
        return self._streams_from_bitmaps(prep, by_cluster, n_valids, thr_ints, thrs, seq_len=n)

    def _streams_planned(self, prep, n_valids, thr_ints, thrs, seq_len):
        """One-dispatch planned cluster record (VERDICT r4 next-round #1).

        The fused kernel, the device region plan and the summarized exact
        recompute run back to back in ONE jit; the host fetches ONE blob
        (below words + borderline counts + dist0s + planned starts +
        valid counts + overflow + fused run-reduce sections) - ONE host
        round trip per record for in-bucket, borderline-free records
        (the r4 path paid three: bitmap + words + reduce).  Records whose
        active regions overflow the static bucket fall back to the
        host-planned path (the packed bitmap rides the same dispatch and
        is fetched only then), and the bucket doubles for later records.
        """
        from .scan import _unpack_bitmap_words
        from .scan_fused import ROWS as FROWS

        e0 = self.engines[0]
        m = len(self.engines)
        t = e0.fused_t
        depth = self.groups[0][1]
        nw_max = int(n_valids.max())
        n_tiles = -(-(-(-nw_max // t)) // FROWS) * FROWS
        max_w = self.max_ws - self.k + 1
        hw = -(-(max_w + 1) // 128) * 128 + 128
        if prep.dev.shape[0] < n_tiles * t + t + hw:
            raise AssertionError("prepared record too small for the fused tiling")
        rspan = min(e0.chunk, e0.rspan)
        n_regions = self.plan_regions
        thrs_l = list(thrs)

        key = ("meta", tuple(n_valids.tolist()), tuple(thr_ints.tolist()))
        small = self._small_cache.get(key)
        if small is None:
            if len(self._small_cache) > 64:
                self._small_cache.clear()
            small = jnp.asarray(np.concatenate([n_valids, thr_ints]).astype(np.int32))
            self._small_cache[key] = small
        t_exact = np.asarray(
            [eng._thr_exact(thr) for eng, thr in zip(self.engines, thrs_l)], dtype=np.int32
        )
        rkey = ("rmeta", tuple(t_exact.tolist()), tuple(n_valids.tolist()))
        meta = self._small_cache.get(rkey)
        if meta is None:
            if len(self._small_cache) > 64:
                self._small_cache.clear()
            meta = jnp.asarray(np.concatenate([t_exact, t_exact, n_valids]).astype(np.int32))
            self._small_cache[rkey] = meta

        # per-cluster last stream index for the fused run-reduce: the Omn
        # loop bound i <= imax (ref OmnGenomeMiner.jl:89) intersected with
        # each cluster's window count
        imax = seq_len - self.max_ws - self.k + 2
        mi_arr = np.minimum(n_valids.astype(np.int64) - 1, imax).astype(np.int32)
        mkey = ("mis", tuple(mi_arr.tolist()))
        mis = self._small_cache.get(mkey)
        if mis is None:
            if len(self._small_cache) > 64:
                self._small_cache.clear()
            mis = jnp.asarray(mi_arr)
            self._small_cache[mkey] = mis

        ld = self._resolve_lookup_dtype()
        d_flat_h, blob_h, packed_h = _with_retry(
            lambda: _fused_cluster_planned(
                prep.dev, self.s_stack, small, meta, mis,
                k=self.k, specs=tuple((e.ws, e.r) for e in self.engines),
                depth=depth, t=t, block=self.block, n_tiles=n_tiles,
                lookup_dtype=ld, chunk=self.lookup_chunk, rspan=rspan,
                n_regions=n_regions, use_pallas=self.use_pallas,
            )
        )
        blob = _with_retry(lambda: np.asarray(blob_h))
        W = m * n_regions * rspan // 32
        words = blob[: W + 2 * m]
        off = W + 2 * m
        starts_all = blob[off : off + m * n_regions].astype(np.int64).reshape(m, n_regions)
        off += m * n_regions
        nvr = blob[off : off + m].astype(np.int64)
        overflow = blob[off + m : off + 2 * m]
        red_all = blob[off + 2 * m :].view(np.int32)
        if int(overflow.sum()) > 0:
            # denser than the bucket: host-planned fallback from the packed
            # bitmap already computed on device; jump straight to the
            # bucket that fits (tier-by-tier growth costs one slow relay
            # compile per tier), or stop planning on device once maxed
            need = int(nvr.max())
            while self.plan_regions < need and self.plan_regions < self.plan_regions_max:
                self.plan_regions *= 2
            if need > self.plan_regions_max:
                self.device_plan = False
            tb = t // self.block
            flat = _unpack_bitmap_words(
                _with_retry(lambda: np.asarray(packed_h)), n_tiles * m * tb
            )
            bc = flat.reshape(n_tiles, m, tb).transpose(1, 0, 2).reshape(m, -1)
            return self._streams_from_bitmaps(
                prep, [bc[ci] for ci in range(m)], n_valids, thr_ints, thrs_l,
                seq_len=seq_len,
            )
        if int(nvr.max()) > (3 * n_regions) // 4 and self.plan_regions < self.plan_regions_max:
            # grow BEFORE the next record crowds the bucket (hysteresis)
            self.plan_regions = min(self.plan_regions * 2, self.plan_regions_max)
        all_starts = [starts_all[ci, : int(nvr[ci])].tolist() for ci in range(m)]
        # same adaptive cutover as the host-planned path: few active
        # regions -> one raw distance fetch beats the run-reduce round
        # trip, and the resulting streams are bit-identical to the host
        # path's (keyed on the host path's equivalent bucket so the two
        # paths cut over together)
        from .scan import _span_bucket

        flat_eq = m * _span_bucket(int(nvr.max())) * rspan
        if flat_eq <= e0.full_fetch_windows:
            d_flat = _with_retry(lambda: np.asarray(d_flat_h))
            return self._streams_full_fetch(
                d_flat, all_starts, rspan, n_regions, n_valids, thr_ints
            )
        if int(words[-2 * m : -m].sum()) == 0:
            # fused run-reduce rode the blob: assemble every cluster's
            # minimal stream with ZERO further round trips (borderline-free
            # records only; slot-bucket overflow in any cluster falls back)
            sec = 1 + 5 * _CRED_RUNS
            out = []
            for ci, eng in enumerate(self.engines):
                dist0 = float(np.int64(words[-m + ci])) / eng.scale
                stream = eng._stream_from_device_reduce(
                    red_all[ci * sec : (ci + 1) * sec], dist0,
                    run_bucket=_CRED_RUNS,
                )
                if stream is None:
                    out = None
                    break
                out.append((dist0, stream))
            if out is not None:
                return out
        return self._streams_from_summary(
            d_flat_h, words, all_starts, rspan, n_regions, n_valids, thr_ints, seq_len
        )

    def _streams_from_bitmaps(self, prep, by_cluster, n_valids, thr_ints, thrs, seq_len=None):
        """COMBINED region recompute for all m clusters: one device call and
        one fetch (the m separate per-cluster fetch round trips were the
        largest cluster-mode cost on the remote TPU - r3 profile: 446 ms of
        an 832 ms record vs 353 ms of bitmap compute).

        In "reduced" assembly mode (the default) the fetch is the packed
        below bits + per-run reductions for ALL clusters - KBs instead of
        the multi-MB distance rows (r4: the 6 MB hit-dense m=6 fetch at
        ~39 MB/s relay D2H was the next-largest cost after r3's combining).
        ``seq_len`` bounds every stream at the Omn loop's i <= imax
        (ref OmnGenomeMiner.jl:89) so run minima never see windows the
        reference would not scan.
        """
        from .scan import (
            _RUN_BUCKET,
            _extract_runs,
            _run_pieces,
            _scan_regions_dense_multi,
            _scan_regions_summarized_multi,
            _span_bucket,
            _unpack_bitmap_words,
        )

        e0 = self.engines[0]
        m = len(self.engines)
        rspan = min(e0.chunk, e0.rspan)
        all_starts: list[list[int]] = []
        for ci, eng in enumerate(self.engines):
            starts, _ = eng._plan_starts(np.asarray(by_cluster[ci]), int(n_valids[ci]))
            all_starts.append(starts)
        n_regions = _span_bucket(max(len(s) for s in all_starts))
        starts_flat = np.zeros(m * n_regions, dtype=np.int32)
        for ci, starts in enumerate(all_starts):
            starts_flat[ci * n_regions : ci * n_regions + len(starts)] = starts
        specs = tuple((eng.ws, eng.r) for eng in self.engines)

        if e0.assemble_mode != "reduced":
            d_flat = _with_retry(
                lambda: np.asarray(
                    _scan_regions_dense_multi(
                        prep.dev, jnp.asarray(starts_flat), self.s_stack,
                        k=self.k, rspan=rspan, n_regions=n_regions,
                        specs=specs, use_pallas=self.use_pallas,
                    )
                )
            )
            return self._streams_full_fetch(
                d_flat, all_starts, rspan, n_regions, n_valids, thr_ints
            )

        t_exact = np.asarray(
            [eng._thr_exact(thr) for eng, thr in zip(self.engines, thrs)], dtype=np.int32
        )
        key = ("rmeta", tuple(t_exact.tolist()), tuple(n_valids.tolist()))
        meta = self._small_cache.get(key)
        if meta is None:
            if len(self._small_cache) > 64:
                self._small_cache.clear()
            # exact integer thresholds on BOTH borderline bounds: device
            # below bits equal the host float64 comparison exactly (see
            # ScanEngine._thr_exact), so the full-fetch fallback never fires
            meta = jnp.asarray(np.concatenate([t_exact, t_exact, n_valids]).astype(np.int32))
            self._small_cache[key] = meta

        d_flat_h, words_h = _with_retry(
            lambda: _scan_regions_summarized_multi(
                prep.dev, jnp.asarray(starts_flat), self.s_stack, meta,
                k=self.k, rspan=rspan, n_regions=n_regions, specs=specs,
                use_pallas=self.use_pallas,
            )
        )
        flat_total = m * n_regions * rspan
        if flat_total <= e0.full_fetch_windows or flat_total >= 2**31:
            # few active regions across all clusters: one raw fetch beats
            # the words+reduce round-trip pair (sparse real genomes).
            # The >= 2^31 guard keeps the reduced path's packed int32
            # flat indices (base = ci*n_regions*rspan) from wrapping on a
            # pathologically large dense multi-cluster record (advisor r4)
            d_flat = _with_retry(lambda: np.asarray(d_flat_h))
            return self._streams_full_fetch(
                d_flat, all_starts, rspan, n_regions, n_valids, thr_ints
            )
        words = _with_retry(lambda: np.asarray(words_h))
        return self._streams_from_summary(
            d_flat_h, words, all_starts, rspan, n_regions, n_valids, thr_ints, seq_len
        )

    def _streams_from_summary(self, d_flat_h, words, all_starts, rspan, n_regions, n_valids, thr_ints, seq_len):
        """Assemble all m streams from a FETCHED summary (below words +
        borderline counts + dist0s) and the device-resident distance rows.
        Shared by the host-planned reduced path and the device-planned
        fused path (_streams_planned)."""
        from .scan import (
            _RUN_BUCKET,
            _extract_runs,
            _run_pieces,
            _unpack_bitmap_words,
        )

        e0 = self.engines[0]
        m = len(self.engines)
        if int(words[-2 * m : -m].sum()) > 0:
            # borderline integer distances somewhere: exact full fetch
            d_flat = _with_retry(lambda: np.asarray(d_flat_h))
            return self._streams_full_fetch(
                d_flat, all_starts, rspan, n_regions, n_valids, thr_ints
            )
        dist0s = [
            float(np.int64(words[-m + ci])) / eng.scale
            for ci, eng in enumerate(self.engines)
        ]

        imax = None if seq_len is None else seq_len - self.max_ws - self.k + 2
        # each cluster's packed below-bit words are exactly this long ONLY
        # because chunk is forced to a multiple of block=512 by the engine;
        # make that cross-module coupling explicit (advisor r4)
        assert n_regions * rspan % 32 == 0, (n_regions, rspan)
        words_per = n_regions * rspan // 32
        requests = []
        infos = []
        for ci, (eng, starts) in enumerate(zip(self.engines, all_starts)):
            bits = _unpack_bitmap_words(
                words[ci * words_per : (ci + 1) * words_per], n_regions * rspan
            )
            mi = int(n_valids[ci]) - 1
            if imax is not None:
                mi = min(mi, imax)
            run_lo, run_hi, edge_flat = _extract_runs(bits, starts, rspan, mi)
            run_ids, p_start, p_len = _run_pieces(run_lo, run_hi, _RUN_BUCKET)
            base = ci * n_regions * rspan
            edge_ok = edge_flat >= 0
            edge_list = edge_flat[edge_ok].astype(np.int64) + base
            requests.append((p_start + base, p_len, edge_list))
            infos.append((eng, starts, run_lo, run_hi, edge_flat, edge_ok, run_ids, p_start))
        if sum(len(r[0]) + len(r[2]) for r in requests) == 0:
            return [(d0, []) for d0 in dist0s]  # no runs anywhere: done
        outs = e0._reduce_on_device(d_flat_h, requests)
        return [
            eng._finish_reduction(
                out, starts, rspan, run_lo, run_hi, edge_flat, edge_ok, run_ids,
                p_start, dist0s[ci],
            )
            for ci, (out, (eng, starts, run_lo, run_hi, edge_flat, edge_ok, run_ids, p_start))
            in enumerate(zip(outs, infos))
        ]

    def _streams_full_fetch(self, d_flat, all_starts, rspan, n_regions, n_valids, thr_ints):
        out = []
        for ci, (eng, starts) in enumerate(zip(self.engines, all_starts)):
            d_all = d_flat[ci * n_regions * rspan : (ci + 1) * n_regions * rspan].reshape(
                n_regions, rspan
            )
            out.append(
                eng._stream_from_region_dists(
                    d_all, starts, rspan, int(n_valids[ci]), int(thr_ints[ci])
                )
            )
        return out
