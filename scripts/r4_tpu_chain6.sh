#!/bin/bash
# Round-4 TPU queue, part 6: one more attention A/B aimed at the named
# res-64 gap mechanism (README per-rung attribution: flash fwd+bwd is
# 25.4 ms of the 38.6 ms rung, ~2x its fill-corrected floor).
#   0. wait for chain 5 (combined-defaults bench + serving transcript +
#      b128) to exit, so compiles/measurements don't contend
#   a. MOEGAN_FLASH_BQ=512 bench b64 (fewer programs / larger q tiles at
#      T=4096; BK=1024 already won round 3)
#   b. MOEGAN_FLASH_BK=2048 bench b64 (halve the kv-loop trip count)
# Usage: nohup bash scripts/r4_tpu_chain6.sh > runs/r4_tpu_log6.txt 2>&1 &
set -x
cd /root/repo

if [ -f /tmp/chain5.pid ]; then
  echo "=== [$(date)] 0. waiting for chain 5 (pid $(cat /tmp/chain5.pid)) ==="
  while kill -0 "$(cat /tmp/chain5.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== [$(date)] a. MOEGAN_FLASH_BQ=512 bench b64 ==="
MOEGAN_FLASH_BQ=512 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. MOEGAN_FLASH_BK=2048 bench b64 ==="
MOEGAN_FLASH_BK=2048 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] done ==="
