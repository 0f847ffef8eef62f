#!/bin/bash
# Round-4 TPU queue, part 7: verify the token-aware VMEM gate (2d08f16)
# on hardware — b128 must now compile (res-8 C=256 backward falls back
# to XLA recompute instead of the chain-5 VMEM OOM) and land near the
# round-3-default 991.56.
#   0. wait for chain 6 (flash block-size A/Bs) to exit
#   a. bench b128 at current defaults
# Usage: nohup bash scripts/r4_tpu_chain7.sh > runs/r4_tpu_log7.txt 2>&1 &
set -x
cd /root/repo

if [ -f /tmp/chain6.pid ]; then
  echo "=== [$(date)] 0. waiting for chain 6 (pid $(cat /tmp/chain6.pid)) ==="
  while kill -0 "$(cat /tmp/chain6.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== [$(date)] a. bench b128, token-aware gate ==="
timeout 5400 python bench.py --batch 128 || echo "A FAILED"

echo "=== [$(date)] done ==="
