#!/bin/bash
# Round-4 TPU queue, part 8: definitive round-4 numbers at the FINAL
# defaults (compact lse + VMEM 24 + token-aware gate + block_k 2048).
#   0. wait for chain 7 (b128 gate verification at block_k=1024)
#   a. bench b64  — final defaults (headline; expect ~998)
#   b. bench b128 — final defaults
# Usage: nohup bash scripts/r4_tpu_chain8.sh > runs/r4_tpu_log8.txt 2>&1 &
set -x
cd /root/repo

if [ -f /tmp/chain7.pid ]; then
  echo "=== [$(date)] 0. waiting for chain 7 (pid $(cat /tmp/chain7.pid)) ==="
  while kill -0 "$(cat /tmp/chain7.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== [$(date)] a. bench b64, final defaults ==="
timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. bench b128, final defaults ==="
timeout 5400 python bench.py --batch 128 || echo "B FAILED"

echo "=== [$(date)] done ==="
