"""A/B: the r5 device-planned cluster assembly vs the r4 host-planned path
on the bench's 64 Mbp hit-dense record (real TPU).  Quantifies the
round-trip collapse for docs/design.md (VERDICT r4 next-round #1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from kmergma_tpu.ops.reference import cluster_ref_api, eliminate_null_params  # noqa: E402
from kmergma_tpu.ops.scan_cluster import ClusterScanEngine  # noqa: E402
from kmergma_tpu.utils.fasta import as_records  # noqa: E402

from bench import _device_random_genome, _plant_genes_device  # noqa: E402

ref_path = os.path.join(here, "tests/data/Alp_V_ref.fasta")
dense_bp = int(float(os.environ.get("BENCH_DENSE_MBP", "64")) * 1e6)
clusters = eliminate_null_params(cluster_ref_api(ref_path, 6, cutoffs=[7, 12, 20, 25]))
m = len(clusters.profiles)
thrs = [35.0, 31.0, 38.0, 34.0, 27.0, 27.0][:m]
refs = as_records(ref_path)


def timed(name, eng, prep, shape, reps=5):
    for _ in range(3):  # warm compiles + stabilise the adaptive bucket
        before = eng.plan_regions
        out = eng.record_streams(shape, thrs, codes_dev=prep)
        if eng.plan_regions == before:
            break
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = eng.record_streams(shape, thrs, codes_dev=prep)
        best = min(best, time.perf_counter() - t0)
    n_cand = sum(len(s) for _, s in out)
    print(
        f"{name:34s} {best*1e3:8.1f} ms  ({dense_bp/best/1e6:6.1f} Mbp/s; "
        f"{n_cand} stream entries; bucket={eng.plan_regions})",
        flush=True,
    )
    return out, best


e0 = ClusterScanEngine(clusters.profiles, k=6)
prep = _device_random_genome(e0.engines[0], dense_bp, seed=7, max_ws=e0.max_ws + 1)
prep, planted = _plant_genes_device(prep, refs, dense_bp, spacing=500_000)
_ = np.asarray(prep.dev[:4])
shape = np.zeros(dense_bp, dtype=np.int8)
print(f"{dense_bp/1e6:.0f} Mbp, {planted} planted genes, m={m}", flush=True)

out_a, t_a = timed("A: device-planned (r5 default)", e0, prep, shape)

os.environ["KMERGMA_DEVPLAN"] = "0"
e_b = ClusterScanEngine(clusters.profiles, k=6)
del os.environ["KMERGMA_DEVPLAN"]
assert not e_b.device_plan
out_b, t_b = timed("B: host-planned (r4 path)", e_b, prep, shape)

same = out_a == out_b
print(f"streams identical: {same};  speedup {t_b/t_a:.2f}x", flush=True)
if not same:
    print("!! STREAM MISMATCH - planned path is WRONG, do not ship", flush=True)
