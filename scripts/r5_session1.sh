#!/bin/bash
# Round-5 TPU session 1: verify drive + cluster A/B + bench + k10 ablation
# + strobe stage profile.  ONE TPU client at a time; everything sequential.
cd /root/repo || exit 1
{
  echo "=== r5 session 1: $(date) ==="
  echo "=== verify drive (goldens incl. planned cluster + RLE aligner) ==="
  timeout 5400 python scripts/r5_drive.py || echo "DRIVE FAILED rc=$?"
  echo "=== cluster A/B: device-planned vs host-planned ==="
  timeout 3600 python scripts/ab_cluster_planned.py || echo "AB FAILED rc=$?"
  echo "=== bench (full) ==="
  timeout 5400 python bench.py || echo "BENCH FAILED rc=$?"
  echo "=== ablate_bigk (gather dtype variants) ==="
  timeout 3600 python scripts/ablate_bigk.py || echo "BIGK FAILED rc=$?"
  echo "=== profile_strobe (stage breakdown) ==="
  timeout 3600 python scripts/profile_strobe.py || echo "STROBE FAILED rc=$?"
  echo "=== done: $(date) ==="
} >> logs/tpu_session1_r5.log 2>&1
