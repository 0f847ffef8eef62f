#!/bin/bash
# Round-5 TPU queue, part 2: fused softmax-denominator A/B + profile.
# MOEGAN_FLASH_FUSED_L=1 appends a ones column to V inside the forward
# kernel so l rides the PV matmul's spare output lanes (32 of 128 used at
# C=32) instead of a cross-lane VPU sum-reduce per [block_q, block_k]
# score tile. Promote to default if it wins.
#   a. bench b64, FUSED_L=1 (on top of the new exp2+prescale defaults)
#   b. bench b64, FUSED_L=0 (back-to-back control)
#   c. step profile at whatever a/b says is best (edit flag accordingly)
# Usage: nohup bash scripts/r5_tpu_chain2.sh > runs/r5_tpu_log2.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. bench b64, MOEGAN_FLASH_FUSED_L=1 ==="
MOEGAN_FLASH_FUSED_L=1 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. bench b64, MOEGAN_FLASH_FUSED_L=0 (control) ==="
MOEGAN_FLASH_FUSED_L=0 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] done ==="
