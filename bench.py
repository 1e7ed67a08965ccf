"""Benchmark: findGenes scan throughput (Mbp/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the reference's published ~40 Mbp/s single-core figure
(ref /root/reference/README.md:50, BASELINE.md).

The benchmark scans a synthetic random genome (default 64 Mbp, override via
BENCH_MBP) against the real 84-record V-gene reference profile (k=6,
ws=289) - the exact findGenes configuration - using the production
ScanEngine (tiled exact-integer scan + candidate compaction + minima
replay).  Timing covers the full mine: host orchestration, device scan,
candidate transfer and state-machine replay.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    n_mbp = float(os.environ.get("BENCH_MBP", "64"))
    n_bp = int(n_mbp * 1e6)

    from kmergma_tpu.models.miner import mine_genome
    from kmergma_tpu.ops.reference import gen_ref_ws_cons
    from kmergma_tpu.ops.scan import ScanEngine
    from kmergma_tpu.utils.fasta import FastaRecord

    here = os.path.dirname(os.path.abspath(__file__))
    profile = gen_ref_ws_cons(os.path.join(here, "tests/data/Alp_V_ref.fasta"), 6)
    thr = 30.0

    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, n_bp, dtype=np.int8)

    chunk = int(os.environ.get("BENCH_CHUNK", str(1 << 18)))
    engine = ScanEngine(
        profile.sum_kfv, k=profile.k, ws=profile.windowsize, r=profile.n_records,
        chunk_windows=chunk,
    )

    # Warmup: compile all chunk buckets on a small prefix.
    engine.record_stream(codes[: engine.chunk + profile.windowsize], thr)

    t0 = time.perf_counter()
    dist0, stream, _ = engine.record_stream(codes, thr)
    elapsed = time.perf_counter() - t0

    mbps = n_bp / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": "findGenes_scan_throughput",
                "value": round(mbps, 2),
                "unit": "Mbp/s",
                "vs_baseline": round(mbps / 40.0, 2),
            }
        )
    )
    print(
        f"# {n_mbp:.0f} Mbp in {elapsed:.2f}s; {len(stream)} candidate windows; dist0={dist0:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
