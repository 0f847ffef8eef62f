#!/bin/bash
# Round-3 TPU queue, part 7: one-flag-at-a-time bisection of today's
# changes against the full-default configuration.
#   a. all defaults (fused QKV last-dim split, flash MIN_T=256,
#      1x1-modconv matmul, where-based NaN skip)
#   b. a but split QKV projections      (MOEGAN_FUSED_QKV=0)
#   c. a but flash only at T>=1024      (MOEGAN_FLASH_MIN_T=1024)
#   d. a but 1x1 modconv via conv op    (MOEGAN_1X1_MATMUL=0)
# Usage: nohup bash scripts/r3_tpu_chain7.sh > runs/r3_tpu_log7.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. all defaults ==="
timeout 3600 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. MOEGAN_FUSED_QKV=0 ==="
MOEGAN_FUSED_QKV=0 timeout 3600 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. MOEGAN_FLASH_MIN_T=1024 ==="
MOEGAN_FLASH_MIN_T=1024 timeout 3600 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. MOEGAN_1X1_MATMUL=0 ==="
MOEGAN_1X1_MATMUL=0 timeout 3600 python bench.py --batch 64 || echo "D FAILED"

echo "=== [$(date)] done ==="
