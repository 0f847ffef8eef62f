#!/bin/bash
# Round-4 TPU queue, part 9: follow the block_k trend to its end.
# 512 -> 1024 -> 2048 each won on hardware; 4096 makes the res-64 KV
# loop a single iteration (whole [4096, 32] bf16 k/v tiles, 256 KB each).
#   a. MOEGAN_FLASH_BK=4096 bench b64
# Usage: nohup bash scripts/r4_tpu_chain9.sh > runs/r4_tpu_log9.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. MOEGAN_FLASH_BK=4096 bench b64 ==="
MOEGAN_FLASH_BK=4096 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] done ==="
