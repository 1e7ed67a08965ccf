"""Benchmark: findGenes scan throughput (Mbp/s) on one chip.

Prints ONE JSON line whose primary fields {"metric", "value", "unit",
"vs_baseline"} report the headline findGenes scan throughput against the
reference's published ~40 Mbp/s single-core figure
(ref /root/reference/README.md:50, BASELINE.md).  Extra fields report the
two honest variants the headline alone would hide:

  * ``hit_dense_*``  - a genome with the 84 real V genes planted at
    realistic locus density, so the active-region exact recompute, compact
    fetch-back and minima replay all run inside the timed loop (the random
    genome yields zero candidates and exercises only the pruned pass);
  * ``cluster_*``    - cluster mode (m profiles in one fused device pass,
    ops/scan_cluster.py) against the reference's 40/m Mbp/s
    (ref OmnGenomeMiner slowdown, README.md:50).

Measurement model: the genome codes are packed and transferred to the
device ONCE (as in production: one H2D per record), then the timed scan
covers everything downstream - device bitmap pass, active-region exact
recompute, candidate fetch-back, and the host state-machine replay.  That
matches what the reference's number measures (its scan reads the genome
from RAM, not from a ~40 MB/s network link; this harness reaches the TPU
through a remote relay whose transfer cost is an environment artifact, not
a property of the framework - on a real TPU host the same H2D is PCIe/HBM
at GB/s).  The one-time transfer and end-to-end wall time are reported on
stderr for full transparency.  Alignment is excluded (the reference's
figure times the scan loop; hits are rare and alignment is O(hits), not
O(genome)) - hit COUNTS are reported so the replay work is visible.

A persistent compilation cache (.jax_cache) makes warmup fast after the
first-ever run on a machine; the first run pays one-time remote compiles.

Env knobs: BENCH_MBP (random-genome size, default 512), BENCH_DENSE_MBP
(hit-dense genome size, default 64), BENCH_CHUNK (windows per span),
BENCH_SKIP_EXTRAS=1 (headline only).
"""

import json
import os
import sys
import time

import numpy as np


def _plant_genes(codes: np.ndarray, ref_records, spacing: int) -> int:
    """Overwrite the synthetic genome with real V genes every ``spacing`` bp
    (cycling through the reference set).  Returns the number planted."""
    n = 0
    pos = spacing // 2
    while pos + 400 < codes.shape[0]:
        rec = ref_records[n % len(ref_records)]
        g = rec.codes
        codes[pos : pos + g.shape[0]] = g
        n += 1
        pos += spacing
    return n


def _time_best(fn, repeats: int = 3) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    n_mbp = float(os.environ.get("BENCH_MBP", "512"))
    n_bp = int(n_mbp * 1e6)
    dense_mbp = float(os.environ.get("BENCH_DENSE_MBP", "64"))
    dense_bp = int(dense_mbp * 1e6)
    skip_extras = os.environ.get("BENCH_SKIP_EXTRAS", "") == "1"

    from kmergma_tpu.models.state_machine import OmnHitEvent, replay_omn, replay_single
    from kmergma_tpu.ops.reference import cluster_ref_api, eliminate_null_params, gen_ref_ws_cons
    from kmergma_tpu.ops.scan import ScanEngine
    from kmergma_tpu.ops.scan_cluster import ClusterScanEngine
    from kmergma_tpu.utils.fasta import as_records

    here = os.path.dirname(os.path.abspath(__file__))
    ref_path = os.path.join(here, "tests/data/Alp_V_ref.fasta")
    profile = gen_ref_ws_cons(ref_path, 6)
    thr = 30.0

    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, n_bp, dtype=np.int8)

    chunk_env = os.environ.get("BENCH_CHUNK")
    eng_kwargs = {}
    if chunk_env:
        eng_kwargs["chunk_windows"] = int(chunk_env)
    if os.environ.get("BENCH_DEPTH"):
        eng_kwargs["bound_depth"] = int(os.environ["BENCH_DEPTH"])
    engine = ScanEngine(
        profile.sum_kfv, k=profile.k, ws=profile.windowsize, r=profile.n_records,
        **eng_kwargs,
    )

    # ---- headline: random genome, production single-profile path ----
    t0 = time.perf_counter()
    prep = engine.prepare_codes(codes)
    _ = np.asarray(prep.dev[:4])  # force completion
    transfer = time.perf_counter() - t0

    t0 = time.perf_counter()
    engine.record_stream(codes, thr, codes_dev=prep)  # warmup compiles
    first = time.perf_counter() - t0

    dist0 = stream = None

    def run_random():
        nonlocal dist0, stream
        dist0, stream, _ = engine.record_stream(codes, thr, codes_dev=prep)

    best = _time_best(run_random)
    hits = replay_single(stream, dist0, thr, profile.k, profile.windowsize, n_bp, 50)
    mbps = n_bp / best / 1e6
    del prep

    result = {
        "metric": "findGenes_scan_throughput",
        "value": round(mbps, 2),
        "unit": "Mbp/s",
        "vs_baseline": round(mbps / 40.0, 2),
    }
    notes = [
        f"# random: {n_mbp:.0f} Mbp scan {best:.2f}s ({mbps:.0f} Mbp/s); one-time H2D {transfer:.2f}s "
        f"(relay-limited; e2e incl transfer {n_bp/(best+transfer)/1e6:.0f} Mbp/s); "
        f"first pass {first:.2f}s; {len(stream)} candidates, {len(hits)} hits"
    ]

    if not skip_extras:
        # ---- hit-dense genome: region recompute + replay in the loop ----
        refs = as_records(ref_path)
        dcodes = rng.integers(0, 4, dense_bp, dtype=np.int8)
        planted = _plant_genes(dcodes, refs, spacing=500_000)
        dprep = engine.prepare_codes(dcodes)
        _ = np.asarray(dprep.dev[:4])
        engine.record_stream(dcodes, thr, codes_dev=dprep)  # warmup

        def run_dense():
            nonlocal dist0, stream
            dist0, stream, _ = engine.record_stream(dcodes, thr, codes_dev=dprep)

        dbest = _time_best(run_dense)
        dhits = replay_single(stream, dist0, thr, profile.k, profile.windowsize, dense_bp, 50)
        dmbps = dense_bp / dbest / 1e6
        result["hit_dense_mbps"] = round(dmbps, 2)
        result["hit_dense_hits"] = len(dhits)
        notes.append(
            f"# hit-dense: {dense_mbp:.0f} Mbp with {planted} planted V genes: {dbest:.2f}s "
            f"({dmbps:.0f} Mbp/s); {len(stream)} candidates -> {len(dhits)} hits"
        )

        # ---- cluster mode: m profiles, one fused pass ----
        clusters = eliminate_null_params(cluster_ref_api(ref_path, 6, cutoffs=[7, 12, 20, 25]))
        m = len(clusters.profiles)
        thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][:m]
        ceng = ClusterScanEngine(clusters.profiles, k=6, **eng_kwargs)
        cprep = ceng.prepare_codes(dcodes)
        ceng.record_streams(dcodes, thrs, codes_dev=cprep)  # warmup

        windowsizes = [p.windowsize for p in clusters.profiles]
        n_events = 0

        def run_cluster():
            nonlocal n_events
            pairs = ceng.record_streams(dcodes, thrs, codes_dev=cprep)
            events = []

            def process(ev: OmnHitEvent) -> bool:
                events.append(ev)
                return True

            replay_omn([p[1] for p in pairs], [p[0] for p in pairs], thrs, 6,
                       windowsizes, dense_bp, process)
            n_events = len(events)

        run_cluster()  # warmup replay
        cbest = _time_best(run_cluster)
        cmbps = dense_bp / cbest / 1e6
        cluster_baseline = 40.0 / m
        result["cluster_mbps"] = round(cmbps, 2)
        result["cluster_m"] = m
        result["cluster_vs_baseline"] = round(cmbps / cluster_baseline, 2)
        notes.append(
            f"# cluster (m={m}): {dense_mbp:.0f} Mbp in {cbest:.2f}s ({cmbps:.0f} Mbp/s, "
            f"{cmbps/cluster_baseline:.1f}x the {cluster_baseline:.1f} Mbp/s reference); "
            f"{n_events} hit events"
        )

    print(json.dumps(result))
    for n in notes:
        print(n, file=sys.stderr)


if __name__ == "__main__":
    main()
