#!/bin/bash
# Round-3 TPU queue, part 4: flash-tile sweep around the new bk=1024
# default, then a fresh compile-side cost attribution at the new
# throughput (MFU campaign bookkeeping).
# Usage: nohup bash scripts/r3_tpu_chain4.sh > runs/r3_tpu_log4.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. flash block_k=2048 ==="
MOEGAN_FLASH_BK=2048 timeout 3600 python bench.py --batch 64 || echo "BK2048 FAILED"

echo "=== [$(date)] b. flash block_q=512, block_k=1024 ==="
MOEGAN_FLASH_BQ=512 timeout 3600 python bench.py --batch 64 || echo "BQ512 FAILED"

echo "=== [$(date)] c. step cost attribution at the new default ==="
timeout 3600 python scripts/step_profile.py --batch 64 --imgs-per-sec 1206.9 \
  || echo "PROFILE FAILED"

echo "=== [$(date)] done ==="
