#!/bin/bash
# Round-4 TPU queue, part 10: retry the two near-miss flash tile shapes
# under a raised backward VMEM limit (MOEGAN_FLASH_BWD_VMEM_MB knob).
#   a. block_q=512 @ 20 MB (needed 16.79 MB)
#   b. block_k=4096 @ 24 MB (needed 18.58 MB)
# Usage: nohup bash scripts/r4_tpu_chain10.sh > runs/r4_tpu_log10.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. BQ=512 @ 20 MB ==="
MOEGAN_FLASH_BQ=512 MOEGAN_FLASH_BWD_VMEM_MB=20 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. BK=4096 @ 24 MB ==="
MOEGAN_FLASH_BK=4096 MOEGAN_FLASH_BWD_VMEM_MB=24 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] done ==="
