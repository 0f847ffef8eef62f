#!/bin/bash
# Round-4 TPU queue, part 11: confirm the FINAL defaults (block_k=4096 +
# 24 MB flash-backward limit) at both batch sizes.
#   a. bench b64  (expect ~1008; compile cached from chain 10)
#   b. bench b128 (fresh compile; block shapes batch-independent)
# Usage: nohup bash scripts/r4_tpu_chain11.sh > runs/r4_tpu_log11.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. bench b64, final defaults ==="
timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. bench b128, final defaults ==="
timeout 5400 python bench.py --batch 128 || echo "B FAILED"

echo "=== [$(date)] done ==="
