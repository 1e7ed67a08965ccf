#!/bin/bash
# Round-5 TPU session 2: verify drive + cluster A/B + bench + strobe profile
# after batch 2 (single-profile planned assembly, native aligner).
cd /root/repo || exit 1
{
  echo "=== r5 session 2: $(date) ==="
  echo "=== verify drive (goldens) ==="
  timeout 5400 python scripts/r5_drive.py || echo "DRIVE FAILED rc=$?"
  echo "=== cluster A/B: device-planned vs host-planned ==="
  timeout 3600 python scripts/ab_cluster_planned.py || echo "AB FAILED rc=$?"
  echo "=== bench (full) ==="
  timeout 5400 python bench.py || echo "BENCH FAILED rc=$?"
  echo "=== profile_strobe (stage breakdown, planned assembly) ==="
  timeout 3600 python scripts/profile_strobe.py || echo "STROBE FAILED rc=$?"
  echo "=== done: $(date) ==="
} >> logs/tpu_session2_r5.log 2>&1
