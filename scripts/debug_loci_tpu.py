"""Diagnose the TPU-vs-host stream divergence on Loci.fasta (one process).

Compares each record's production TPU stream against the exact int64 host
engine, prints the first divergent windows, and recomputes them through
the isolated sub-paths (XLA rows vs Pallas rows, one-hot vs take lookup)
to localise the culprit.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from kmergma_tpu.ops.reference import gen_ref_ws_cons
from kmergma_tpu.ops.scan import ScanEngine, _scan_rows_d
from kmergma_tpu.ops.scan_host import HostScanEngine
from kmergma_tpu.ops.thresholds import estimate_optimal_threshold
from kmergma_tpu.utils.fasta import as_records

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
profile = gen_ref_ws_cons(os.path.join(here, "tests/data/Alp_V_ref.fasta"), 6)
k, ws, r = profile.k, profile.windowsize, profile.n_records
thr = estimate_optimal_threshold(profile.mean_kfv, ws)
print(f"thr={thr}", flush=True)

eng = ScanEngine(profile.sum_kfv, k=k, ws=ws, r=r)
host = HostScanEngine(profile.sum_kfv, k=k, ws=ws, r=r)
print(f"use_pallas={eng.use_pallas} backend={jax.default_backend()}", flush=True)

for rec in as_records(os.path.join(here, "tests/data/Loci.fasta")):
    if len(rec) < ws:
        continue
    d0_t, st_t, _ = eng.record_stream(rec.codes, thr)
    d0_h, st_h, _ = host.record_stream(rec.codes, thr)
    ok = (d0_t == d0_h) and (st_t == st_h)
    print(f"{rec.identifier}: len={len(rec)} tpu_stream={len(st_t)} host={len(st_h)} match={ok}", flush=True)
    if not ok:
        if d0_t != d0_h:
            print(f"  dist0 differs: tpu={d0_t} host={d0_h}", flush=True)
        ht = dict(st_t)
        hh = dict(st_h)
        bad = sorted(set(ht) ^ set(hh) | {j for j in set(ht) & set(hh) if ht[j] != hh[j]})
        print(f"  divergent windows: {bad[:20]}", flush=True)
        for j in bad[:4]:
            print(f"    window {j}: tpu={ht.get(j)} host={hh.get(j)}", flush=True)
        # recompute an aligned region around the first divergence via sub-paths
        j0 = max(0, (bad[0] // 512) * 512 - 512)
        rspan = 2048
        row = np.zeros((8, rspan + ws - 1), dtype=np.int8)
        seg = rec.codes[j0 : j0 + rspan + ws - 1]
        row[0, : seg.shape[0]] = seg
        d_host_all = host._dists(rec.codes)
        want = d_host_all[j0 : j0 + min(rspan, len(d_host_all) - j0)]
        got_p = np.asarray(
            jax.jit(_scan_rows_d, static_argnums=(2, 3, 4, 5))(
                jnp.asarray(row), eng.s_dev, k, ws, r, True
            )
        )[0][: want.shape[0]]
        got_x = np.asarray(
            jax.jit(_scan_rows_d, static_argnums=(2, 3, 4, 5))(
                jnp.asarray(row), eng.s_dev, k, ws, r, False
            )
        )[0][: want.shape[0]]
        mis_p = np.nonzero(got_p != want)[0]
        mis_x = np.nonzero(got_x != want)[0]
        print(f"  rows_d pallas mismatches vs host: {mis_p[:10]} (n={mis_p.size})", flush=True)
        print(f"  rows_d XLA    mismatches vs host: {mis_x[:10]} (n={mis_x.size})", flush=True)
        if mis_p.size:
            i = int(mis_p[0])
            print(f"    first: idx {j0+i} pallas={got_p[i]} xla={got_x[i]} host={want[i]}", flush=True)
        break
print("done", flush=True)
