#!/bin/bash
# Round-5 TPU session 7: verify drive + cluster A/B + bench x2 after the
# segmented-scan fused reduce (no padded gathers).
cd /root/repo || exit 1
{
  echo "=== r5 session 7: $(date) ==="
  echo "=== verify drive (goldens) ==="
  timeout 5400 python scripts/r5_drive.py || echo "DRIVE FAILED rc=$?"
  echo "=== cluster A/B: device-planned (fused reduce) vs host-planned ==="
  timeout 3600 python scripts/ab_cluster_planned.py || echo "AB FAILED rc=$?"
  echo "=== bench run 1 ==="
  timeout 5400 python bench.py || echo "BENCH1 FAILED rc=$?"
  echo "=== bench run 2 (variance) ==="
  timeout 5400 python bench.py || echo "BENCH2 FAILED rc=$?"
  echo "=== done: $(date) ==="
} >> logs/tpu_session7_r5.log 2>&1
