#!/bin/bash
# Round-4 TPU queue, part 13: base-2 softmax A/B in the flash kernels.
# MOEGAN_FLASH_EXP2=1 folds log2e into the score scale (free) and uses
# exp2/log2 in both kernels, shaving the x*log2e VPU multiply off every
# score element fwd+bwd — targeted at the VPU-bound res-64 attention the
# per-rung attribution identified. Promote to default if it wins.
#   a. bench b64, exp2 ON
#   b. bench b64, exp2 OFF (back-to-back control against drift)
# Usage: nohup bash scripts/r4_tpu_chain13.sh > runs/r4_tpu_log13.txt 2>&1 &
set -x
cd /root/repo

echo "=== [$(date)] a. bench b64, MOEGAN_FLASH_EXP2=1 ==="
MOEGAN_FLASH_EXP2=1 timeout 5400 python bench.py --batch 64 || echo "A FAILED"

echo "=== [$(date)] b. bench b64, MOEGAN_FLASH_EXP2=0 (control) ==="
MOEGAN_FLASH_EXP2=0 timeout 5400 python bench.py --batch 64 || echo "B FAILED"

echo "=== [$(date)] done ==="
