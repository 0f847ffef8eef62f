#!/bin/bash
# Round-5 TPU queue, part 3: replicate the promoted defaults.
# Chain-2's 2x2 promoted fused_l=1 (won both exp2 cells); exp2's edge
# under fused_l rests on ONE run (1030.05 vs 1022.36, within the ±12
# noise band). Interleave 2 runs per arm to settle it, then confirm
# b128 at the final defaults.
#   a. b64 defaults (fused_l=1 exp2=1)     c. repeat a
#   b. b64 fused_l=1 exp2=0                d. repeat b
#   e. b128 defaults
# Usage: nohup bash scripts/r5_tpu_chain3.sh > runs/r5_tpu_log3.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. b64 defaults (fused_l=1 exp2=1) ==="
timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. b64 exp2=0 ==="
MOEGAN_FLASH_EXP2=0 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] c. b64 defaults (repeat) ==="
timeout 5400 python bench.py --batch 64 || echo "C FAILED"

echo "=== [$(date)] d. b64 exp2=0 (repeat) ==="
MOEGAN_FLASH_EXP2=0 timeout 5400 python bench.py --batch 64 || echo "D FAILED"

echo "=== [$(date)] e. b128 defaults ==="
timeout 5400 python bench.py --batch 128 || echo "E FAILED"

echo "=== [$(date)] done ==="
